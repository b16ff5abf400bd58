package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames — the d07
  * label-propagation pattern (operators/Dedup.scala) generalized:
  * per-iteration state is (node, long), every shuffle carries exactly
  * those two columns, and lineage is cut with localCheckpoint so ten
  * iterations cost ten bounded jobs, not one ten-deep plan.
  */
object Graph {

  /** Integer-exact PageRank: ranks in ppm (10^6 = 1.0), damping in ppm,
    * contribution = rank div out-degree, update = (1-d) + d·Σcontrib
    * with every step an INTEGER operation — so a second engine unrolling
    * the same iterations replays the ranks bit-for-bit (float PageRank
    * never replays: partial-sum order changes the low bits).
    *
    * Iteration plan shape (the 100 TB contract, the d07 posture):
    * ranks join edges on src (one shuffle of (node, long)), groupBy dst
    * with map-side partial sums (one more (node, long) shuffle) — the
    * edge list itself is loop-invariant and stays put; localCheckpoint
    * every iteration keeps lineage depth constant.
    *
    * Nodes with no in-edges would converge to the (1-d) floor; the
    * caller's edge list here is symmetric (both directions), so the
    * node set is closed under the update. Dangling mass is NOT
    * redistributed (each iteration leaks div remainders ≤ outdeg-1 ppm
    * per node) — acceptable for ranking, and exactly mirrored by the
    * oracle's identical integer divisions.
    *
    * @param edges (src: long, dst: long), treated as directed
    * @return (node, rank_ppm) after `iters` iterations
    */
  def pageRankPpm(edges: DataFrame, iters: Int = 10,
      dampingPpm: Long = 850000L): DataFrame = {
    // the edge list is loop-invariant: materialize it ONCE — without
    // this every iteration re-evaluates whatever plan produced the
    // edges (a join + distinct here costs more than the iteration)
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // Loop-invariant (src, dst, deg): degrees pre-joined ONCE (the old
    // per-iteration deg join did identical work ten times), then
    // hash-partitioned by the join key and CACHED. persist, not
    // localCheckpoint, deliberately: an InMemoryTableScan PRESERVES the
    // cached plan's outputPartitioning, so every iteration's ranks join
    // sees the edge side already clustered by src and shuffles ONLY the
    // (node, long) ranks — a checkpoint leaf would forget the
    // partitioning and re-shuffle the whole edge list every round (10x
    // the largest exchange in the loop). Unpersisted before return:
    // the eager per-iteration checkpoints mean every job that needs the
    // cache has already run.
    // sortWithinPartitions(src) ON TOP of the hash partitioning: an
    // InMemoryTableScan preserves outputOrdering as well as
    // outputPartitioning, so each iteration's sort-merge join sorts
    // ONLY the node-scale ranks side — without this the loop re-sorts
    // the full cached edge list every round (10x the largest sort)
    val e2 = e.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .repartition(col("src"))
      .sortWithinPartitions(col("src"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val base = 1000000L - dampingPpm
    var ranks = nodes.withColumn("rank_ppm", lit(1000000L))
    for (i <- 0 until iters) {
      val contrib = e2
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank_ppm div deg").as("c"))
      ranks = contrib.groupBy(col("node"))
        .agg(sum(col("c")).as("s"))
        .select(col("node"),
          (lit(base) + expr(s"($dampingPpm * s) div 1000000"))
            .as("rank_ppm"))
      // checkpoint every SECOND iteration (and always the last): each
      // eager checkpoint is a full job, and on a node-scale rank table
      // the per-job scheduling/AQE latency — not the arithmetic — is
      // what the loop pays for. Two fused iterations double the plan
      // once (bounded), then the checkpoint cuts lineage again, so
      // depth stays constant while the job count halves.
      if (i % 2 == 1 || i == iters - 1) ranks = ranks.localCheckpoint()
    }
    e2.unpersist()
    ranks
  }

  /** k-core decomposition by synchronous iterative peeling (the
    * Matula–Beck bucket peel, run breadth-synchronously the way every
    * BSP graph engine does): each round drops all nodes of current
    * degree < k at once, until the surviving subgraph — the k-core —
    * is stable. `rounds` is a FIXED unroll, identical in the SQL
    * oracle; peeling is monotone (a stable graph is a fixpoint of the
    * round function), so a converged unroll IS the k-core, and the
    * gate-SF convergence margin is pinned in GraphSpec by running
    * rounds and rounds+1 and asserting equality.
    *
    * Scale posture (the p14 contract): each round is one (node, long)
    * degree shuffle plus two semi-joins against a NODE-scale keep set
    * (broadcast — the keep set shrinks every round); the edge list
    * localCheckpoints per round so lineage depth stays constant
    * across the unroll.
    *
    * @param edges (a, b) undirected, deduped, a < b
    * @return (node, deg) — every surviving node with its k-core degree
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 6): DataFrame = {
    var e = edges.select(col("a"), col("b")).localCheckpoint()
    for (_ <- 0 until rounds)
      e = peelRound(e, k).localCheckpoint()
    // convergence probe (the d07 fail-loud posture): peeling is monotone,
    // so a no-op extra round proves e IS the k-core fixpoint; a graph
    // needing more rounds (long chains peel one node per round) would
    // otherwise silently return a superset of the true k-core
    val n = e.count()
    val n1 = peelRound(e, k).count()
    require(n1 == n,
      s"kCore: $rounds-round unroll did not converge (edges $n -> $n1 " +
        s"on a probe round); raise rounds to cover this graph's peel depth")
    kCoreDegrees(e)
  }

  private[graft] def kCoreDegrees(e: DataFrame): DataFrame =
    e.select(col("a").as("node")).union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))

  /** One synchronous peel — exposed so PlanAuditSpec can pin the round's
    * physical shape (the checkpoints in [[kCore]] hide per-round plans
    * from the final DataFrame). */
  private[graft] def peelRound(e: DataFrame, k: Int): DataFrame = {
    val keep = kCoreDegrees(e).filter(col("deg") >= k).select(col("node"))
    e.join(broadcast(keep.withColumnRenamed("node", "a")),
        Seq("a"), "left_semi")
      .join(broadcast(keep.withColumnRenamed("node", "b")),
        Seq("b"), "left_semi")
      .select(col("a"), col("b"))
  }

  /** Per-node triangle counts over an undirected graph, by degree-ordered
    * edge orientation (the compact-forward / node-iterator-core algorithm,
    * Latapy TCS'08; same orientation trick GraphX's TriangleCount uses).
    *
    * Every undirected edge is oriented from its lower-(degree, id)
    * endpoint to the higher one, making the oriented graph acyclic with
    * max out-degree O(sqrt(m)) regardless of hub skew. Triangles are then
    * wedges u->v, u->w (v<w in the same order) closed by edge v->w —
    * each triangle enumerated exactly once, and the wedge self-join keys
    * on the wedge CENTER u, so a hub's quadratic wedge blow-up is bounded
    * by the sqrt(m) out-degree cap instead of the hub's raw degree (the
    * skew that kills id-ordered enumeration at scale). Three shuffles
    * total — degree agg, wedge join, closing join — all on single-long
    * keys.
    *
    * @param edges (a, b) pairs, undirected; self-loops and duplicate /
    *              reversed copies are cleaned here
    * @return (node, n_triangles) for every node on some edge, including
    *         zero rows — so the output is a total function of the graph
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // canonicalize: a < b, one copy per undirected edge
    val und = edges.select(
        least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("n")).unionAll(und.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient by (degree, id): src = smaller endpoint under that order
    val oriented = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
             (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint() // reused 3x below; the join+distinct above is not free
    // wedges around each center, ordered to enumerate each pair once
    val w1 = oriented.select(col("src").as("c"), col("dst").as("v"))
    val w2 = oriented.select(col("src").as("c"), col("dst").as("w"))
    val wedges = w1.join(w2, Seq("c")).filter(col("v") < col("w"))
    // close the wedge: the third edge is oriented either v->w or w->v
    val closing = oriented.select(
      least(col("src"), col("dst")).as("v"), greatest(col("src"), col("dst")).as("w"))
    val tris = wedges.join(closing, Seq("v", "w"))
      .select(col("c").as("x"), col("v").as("y"), col("w").as("z"))
    // each triangle credits all three corners; left join keeps 0-counts
    val perNode = tris.select(col("x").as("n"))
      .unionAll(tris.select(col("y").as("n")))
      .unionAll(tris.select(col("z").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("t"))
    deg.select(col("n").as("node"))
      .join(perNode.select(col("n").as("node"), col("t")), Seq("node"), "left")
      .select(col("node"), coalesce(col("t"), lit(0L)).as("n_triangles"))
  }
}
