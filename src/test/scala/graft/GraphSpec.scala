package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  test("integer PageRank matches a driver-side fold on a known graph") {
    import spark.implicits._
    // directed triangle plus a sink-feeder: 1→2, 2→3, 3→1, 4→1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val iters = 8
    val got = Graph.pageRankPpm(edges, iters = iters)
      .as[(Long, Long)].collect().toMap

    var r = Map(1L -> 1000000L, 2L -> 1000000L, 3L -> 1000000L,
      4L -> 1000000L)
    val deg = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L)
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L))
    for (_ <- 0 until iters) {
      // contributors that dropped out (no in-edges) stop contributing —
      // mirrors the join-based iteration
      val acc = es.groupBy(_._2).view
        .mapValues(_.flatMap { case (s, _) => r.get(s).map(_ / deg(s)) }.sum)
        .filter(_._2 > 0).toMap
      r = acc.map { case (n, s) => n -> (150000L + 850000L * s / 1000000L) }
    }
    // node 4 has no in-edges: it drops out of the join-based iteration
    // (documented), so compare on the surviving node set
    assert(got == r)
    assert(!got.contains(4L), "source-only node must drop out")
    // every rank respects the (1-d) floor and node 4's injected boost
    // still circulates somewhere in the cycle
    assert(got.values.forall(_ >= 150000L))
    assert(got.values.max > 1000000L)
  }

  test("triangle counts on a known graph: two triangles sharing an edge, " +
      "a pendant, and dirty input (dup/reversed/self edges)") {
    import spark.implicits._
    // triangles {1,2,3} and {2,3,4} share edge 2-3; 5 hangs off 4
    val clean = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val dirty = clean ++ Seq((2L, 1L), (1L, 2L), (3L, 3L)) // reversed, dup, loop
    val got = Graph.triangleCounts(dirty.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("triangle counts match a brute-force driver fold on a seeded " +
      "random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 30
    val es = (for {
      a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < 0.2
    } yield (a, b)).toSeq
    val got = Graph.triangleCounts(es.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    val adj = es.toSet
    def conn(x: Long, y: Long) = adj((x min y, x max y))
    val expect = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    es.foreach { case (a, b) => expect(a) += 0; expect(b) += 0 }
    for (x <- 0L until n; y <- (x + 1) until n; z <- (y + 1) until n
         if conn(x, y) && conn(y, z) && conn(x, z)) {
      expect(x) += 1; expect(y) += 1; expect(z) += 1
    }
    assert(got == expect.toMap)
  }

  test("k-core strips tails and keeps the clique") {
    import spark.implicits._
    // 4-clique {1,2,3,4} plus a pendant chain 4-5-6: the 2-core drops
    // the chain in two peels (6 first, then 5), keeping the clique
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("a", "b")
    val core2 = Graph.kCore(edges, k = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(core2 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // the 4-core is empty (clique degrees are 3)
    assert(Graph.kCore(edges, k = 4, rounds = 4).count() == 0)
  }

  test("p23 unroll has converged at the gate SF (fixpoint margin)") {
    import spark.implicits._
    val ls = graft.sources.Tables.load(spark, "/root/testdata/sf0.01",
        "lineitem")
      .select($"l_orderkey".as("k"), $"l_suppkey".as("a")).distinct()
    val edges = ls.join(ls.withColumnRenamed("a", "b"), "k")
      .filter($"a" < $"b")
      .groupBy($"a", $"b").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("c"))
      .filter($"c" >= 30).select($"a", $"b")
    val at6 = Graph.kCore(edges, k = 6, rounds = 6)
      .as[(Long, Long)].collect().toSet
    val at7 = Graph.kCore(edges, k = 6, rounds = 7)
      .as[(Long, Long)].collect().toSet
    assert(at6 == at7, "p23's 6-round unroll must be a fixpoint at sf0.01")
    assert(at6.nonEmpty, "the 6-core must be non-empty at sf0.01")
    // k-core invariant: every surviving node keeps degree >= k
    assert(at6.forall(_._2 >= 6L))
  }
}
