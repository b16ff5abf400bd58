package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Physical-plan audits: the 100 TB postures the operators claim are
  * asserted against the ACTUAL executed plans, so a regression that
  * silently de-broadcasts a dim join, drops a pushed filter, or turns
  * top-k into a global sort fails CI — not a code-review.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  private def executedPlan(df: DataFrame): SparkPlan = {
    df.collect() // force execution so AQE finalizes the plan
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }
  /** Final-plan text only (AQE's toString appends the pre-adaptive
    * "Initial Plan", which would double-count nodes). */
  private def planString(df: DataFrame): String =
    executedPlan(df).toString

  /** Full traversal including AQE query-stage subtrees (stages are leaves
    * to `collect`, hiding the materialized exchanges inside them). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val extra = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        Seq(s.plan)
      case _ => Nil
    }
    p +: (p.children ++ extra).flatMap(allNodes)
  }

  private def shuffles(df: DataFrame) = allNodes(executedPlan(df)).collect {
    case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
  }

  test("q02 joins the nation/region dims by broadcast, not shuffle") {
    val plan = planString(SparkEntry.queries("q02_join_revenue_by_nation")(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q04 top-k plans TakeOrderedAndProject, never a global sort") {
    val plan = planString(SparkEntry.queries("q04_topk_nested_limit")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q18 predicates reach the parquet scan as PushedFilters") {
    val df = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 1000.0)
      .select("o_orderkey", "o_totalprice")
    val plan = planString(df)
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("IsNotNull(o_orderstatus)") ||
      plan.contains("EqualTo(o_orderstatus,F)"), plan.take(2000))
  }

  test("column pruning: a 2-column projection reads a 2-column schema") {
    val df = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val plan = planString(df)
    val readSchema = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_comment"),
      s"scan reads columns the query never uses: $readSchema")
  }

  test("d01 exact dedup is one shuffle with map-side partial aggregation") {
    val df = Dedup.exact(Tables.load(spark, dir, "documents"), "doc_id", "text")
    val exchanges = shuffles(df)
    assert(exchanges.size == 1, s"expected 1 shuffle, saw ${exchanges.size}")
    // partial_ aggregate before the exchange = map-side combine
    val full = allNodes(executedPlan(df)).mkString("\n")
    assert(full.contains("partial_"), full.take(2000))
  }

  test("d02 minhash never shuffles document text or shingles") {
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val df = Dedup.minhashLsh(docs, "doc_id", "text", 64, 16, 0.5)
    // every Exchange's output schema must be free of text-typed payloads
    val exchanges = shuffles(df)
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val cols = e.output.map(a => s"${a.name}:${a.dataType.simpleString}")
      assert(!cols.exists(c => c.contains("text") || c.contains("array<string>")),
        s"shuffle carries raw text/shingles: $cols")
    }
  }

  test("s04 batch top-k aggregates partially BEFORE the shuffle (at most " +
      "k candidates per query per partition cross the wire)") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val df = Similarity.batchTopK(
      embs.filter($"vec_id" >= 5), "vec_id", "embedding",
      embs.filter($"vec_id" < 3), "vec_id", "embedding", 10)
    df.collect() // force execution so the adaptive plan is final
    val full = allNodes(executedPlan(df)).mkString("\n")
    // the typed Aggregator's partial runs map-side (ObjectHashAggregate
    // partial_topkbyscore), so the exchange ships k-capped buffers, not
    // the n×q scored rows a window row_number() formulation would
    assert(full.contains("partial_topkbyscore"), full.take(3000))
  }

  test("s02 LSH probe set is an IN filter, not a per-row Hamming scan") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val df = Similarity.lshTopK(embs.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, 20, bits = 12, probes = 1)
    val plan = planString(df)
    assert(plan.contains("bucket#") || plan.contains(" IN ") || plan.contains("INSET"),
      plan.take(2000))
  }

  test("d06 decontamination broadcasts the eval grams and semi-joins") {
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val df = Dedup.contaminatedDocs(
      docs.filter(col("doc_id") >= 20), docs.filter(col("doc_id") < 20),
      "doc_id", "text", n = 8)
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.take(2000))
  }

  test("hot scalar pipeline stays inside WholeStageCodegen") {
    val df = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
    val plan = planString(df)
    // '*(n)' node prefixes mark whole-stage-codegen'd spans
    assert(plan.contains("*("), plan.take(2000))
  }

  test("batch sessionize: one exchange, one sort (secondary-sort preserved)") {
    import spark.implicits._
    // the repartition + (user_id, ts, event_id) sort must SATISFY the
    // stateful operator's requirements: a second Sort or Exchange in the
    // plan means Catalyst discarded our ordering and each key's iterator
    // would need re-buffering (the hot-key memory bound depends on this)
    val events = Tables.load(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[graft.streaming.EventsStreaming.Event]
    val df = graft.streaming.EventsStreaming.sessionize(spark, events).toDF()
    val nodes = allNodes(executedPlan(df))
    val sorts = nodes.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    val exchanges = nodes.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    assert(sorts.size == 1, s"expected only our secondary sort: $sorts")
    assert(sorts.head.sortOrder.size == 3, sorts.head.sortOrder.toString)
    assert(exchanges.size == 1, s"expected only our repartition: $exchanges")
  }

  test("w03 staging through the fresh-engine manifest read plans ONE " +
      "relation and prunes to exactly one partition's current version") {
    import spark.implicits._
    import graft.engine.{ManifestTable, PartitionedManifest}
    val root = java.nio.file.Files.createTempDirectory("pa-pman").toString
    val seedDf = (1 to 100).map(i => (i.toLong, i % 5)).toDF("k", "bk")
    PartitionedManifest.seed(spark, root, seedDf, "bk")
    // the test_merge/02_step.sql shape: the fresh-engine read serves
    // through a content-pinned catalog relation, so `WHERE bk = 2` is a
    // real PartitionFilter — one scan node, one selected partition, and
    // the files come from that partition's CURRENT version directory
    val q = PartitionedManifest.read(spark, root, "bk", "int")
      .filter($"bk" === 2)
    q.collect()
    val scans = allNodes(executedPlan(q)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.length == 1, s"expected 1 scan node, got ${scans.length}")
    assert(scans.head.partitionFilters.exists(_.toString.contains("= 2")),
      scans.head.partitionFilters.toString)
    assert(scans.head.selectedPartitions.partitionCount == 1,
      s"read ${scans.head.selectedPartitions.partitionCount} partitions")
    val cur = ManifestTable.currentDataDir(s"$root/bk=2").get
    val ver = new org.apache.hadoop.fs.Path(cur).getName
    assert(scans.head.selectedPartitions.toPartitionArray
      .forall(_.filePath.toString.contains(ver)),
      "scan read a non-current version directory")
    assert(q.as[(Long, Int)].collect().length == 20)
  }

  test("a fresh-engine snapshot read of a MANY-partition table plans ONE " +
      "relation node (no N-branch union), and an unfiltered read selects " +
      "every partition") {
    import spark.implicits._
    import graft.engine.PartitionedManifest
    val root = java.nio.file.Files.createTempDirectory("pa-pinplan").toString
    val nParts = 24
    val seedDf = (1 to 240).map(i => (i.toLong, i % nParts)).toDF("k", "bk")
    PartitionedManifest.seed(spark, root, seedDf, "bk")
    PartitionedManifest.commitSnapshot(spark, root, "bk", Map.empty)
    val q = PartitionedManifest.readSnapshot(spark, root, "bk", "int")
    val scans = allNodes(executedPlan(q)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.length == 1,
      s"$nParts partitions must plan ONE scan node, got ${scans.length}")
    assert(scans.head.selectedPartitions.partitionCount == nParts)
    assert(q.count() == 240L)
    // the same mapping re-read is a catalog no-op: SAME pin table
    val q2 = PartitionedManifest.readSnapshot(spark, root, "bk", "int")
    val t1 = allNodes(executedPlan(q)).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.tableIdentifier.map(_.table) }.flatten
    val t2 = allNodes(executedPlan(q2)).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.tableIdentifier.map(_.table) }.flatten
    assert(t1.isDefined && t1 == t2, s"$t1 vs $t2")
  }

  test("w03/w04 staging scan on the MANIFEST-BACKED catalog table prunes " +
      "to one partition's current version directory") {
    import spark.implicits._
    import graft.engine.{ManifestTable, PartitionedManifest}
    val root = java.nio.file.Files.createTempDirectory("pa-mansync").toString
    val seedDf = (1 to 200).map(i => (i.toLong, s"v$i", i % 5)).toDF("k", "s", "bk")
    PartitionedManifest.seed(spark, root, seedDf, "bk")
    spark.sql("DROP TABLE IF EXISTS pa_man_tbl")
    PartitionedManifest.syncCatalogTable(spark, root, "pa_man_tbl", "bk", "int")
    // republish one partition so its catalog location is a LATER version
    PartitionedManifest.publishPartition(spark, root, "bk", "2",
      (1 to 10).map(i => (1000L + i, s"new$i")).toDF("k", "s"))
    PartitionedManifest.syncCatalogTable(spark, root, "pa_man_tbl", "bk", "int")
    try {
      // the packet staging shape: anti-join with a static bk literal
      val delta = Seq(1002L, 1003L).toDF("k")
      val q = spark.table("pa_man_tbl").as("t")
        .join(delta.as("d"), $"t.k" === $"d.k", "left_anti")
        .filter($"bk" === 2)
      q.collect()
      val scans = allNodes(executedPlan(q)).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.tableIdentifier.exists(_.table == "pa_man_tbl") => f
      }
      assert(scans.nonEmpty)
      val scan = scans.head
      assert(scan.partitionFilters.exists(_.toString.contains("= 2")),
        scan.partitionFilters.toString)
      assert(scan.selectedPartitions.partitionCount == 1,
        s"read ${scan.selectedPartitions.partitionCount} partitions")
      // and the selected files live in the CURRENT manifest version dir
      val cur = ManifestTable.currentDataDir(s"$root/bk=2").get
      val ver = new org.apache.hadoop.fs.Path(cur).getName
      assert(scan.selectedPartitions.toPartitionArray
        .forall(_.filePath.toString.contains(ver)),
        "scan read a non-current version directory")
    } finally spark.sql("DROP TABLE pa_man_tbl")
  }

  test("w07: a catalog table pinned to a HISTORICAL snapshot prunes to " +
      "one partition AND reads that snapshot's version directory, not " +
      "the current pointer's") {
    import spark.implicits._
    import graft.engine.PartitionedManifest
    val root = java.nio.file.Files.createTempDirectory("pa-snapcat").toString
    val seedDf = (1 to 100).map(i => (i.toLong, i % 5)).toDF("k", "bk")
    PartitionedManifest.seed(spark, root, seedDf, "bk")
    PartitionedManifest.commitSnapshot(spark, root, "bk", Map.empty,
      keepSnapshots = 3)
    // rewrite bk=2 in a second commit; the FIRST snapshot still names
    // bk=2's v1 directory
    PartitionedManifest.commitSnapshot(spark, root, "bk",
      Map("2" -> (1 to 7).map(i => (1000L + i)).toDF("k")),
      keepSnapshots = 3)
    val snaps = PartitionedManifest.snapshots(spark, root)
    val histDir = PartitionedManifest
      .snapshotMapping(spark, root, snaps.head)
      .toMap.apply("2") // the v1 name the historical snapshot pins
    spark.sql("DROP TABLE IF EXISTS pa_snapcat")
    PartitionedManifest.syncCatalogTableSnapshot(spark, root,
      "pa_snapcat", "bk", "int", Some(snaps.head))
    try {
      val q = spark.table("pa_snapcat").filter($"bk" === 2)
      assert(q.as[(Long, Int)].collect().map(_._1).sorted.toSeq
        == (1 to 100).filter(_ % 5 == 2).map(_.toLong).toSeq,
        "historical snapshot content wrong")
      val scans = allNodes(executedPlan(q)).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.tableIdentifier.exists(_.table == "pa_snapcat") => f
      }
      assert(scans.nonEmpty)
      val scan = scans.head
      assert(scan.partitionFilters.exists(_.toString.contains("= 2")),
        scan.partitionFilters.toString)
      assert(scan.selectedPartitions.partitionCount == 1,
        s"read ${scan.selectedPartitions.partitionCount} partitions")
      assert(scan.selectedPartitions.toPartitionArray
        .forall(_.filePath.toString.contains(histDir)),
        "scan did not read the historical snapshot's version directory")
      val curDir = new org.apache.hadoop.fs.Path(graft.engine.ManifestTable
        .currentDataDir(s"$root/bk=2").get).getName
      assert(curDir != histDir, "test vacuous: pointer never moved")
    } finally spark.sql("DROP TABLE pa_snapcat")
  }

  test("w03 merge action prunes the base scan to its own partition " +
      "(plain partitioned-table idiom)") {
    import spark.implicits._
    // the same pruning contract on a catalog-partitioned table: the
    // literal bk predicate must reach the scan as a PartitionFilter
    // selecting exactly one partition — the property that keeps merge
    // cost ∝ delta footprint at 100 TB
    val src = java.nio.file.Files.createTempDirectory("pa-mrg").toString
    spark.sql("DROP TABLE IF EXISTS pa_mrg_tbl")
    Tables.load(spark, dir, "customer").createOrReplaceTempView("pa_customer")
    spark.sql(s"""CREATE TABLE pa_mrg_tbl USING parquet PARTITIONED BY (bk)
      LOCATION '$src' AS SELECT c_custkey, c_name,
      CAST(c_custkey % 20 AS INT) AS bk FROM pa_customer""")
    spark.sql("""SELECT c_custkey FROM pa_customer WHERE c_custkey % 100 = 0""")
      .createOrReplaceTempView("pa_delta")
    try {
      val q = spark.sql(
        """SELECT t.c_custkey FROM pa_mrg_tbl t
           LEFT ANTI JOIN pa_delta d ON t.c_custkey = d.c_custkey
           WHERE t.bk = 0""")
      val scans = allNodes(executedPlan(q)).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.tableIdentifier.exists(_.table == "pa_mrg_tbl") => f
      }
      assert(scans.nonEmpty)
      assert(scans.head.partitionFilters.exists(_.toString.contains("= 0")),
        scans.head.partitionFilters.toString)
      assert(scans.head.selectedPartitions.partitionCount == 1,
        s"expected 1 partition read, got ${scans.head.selectedPartitions.partitionCount}")
    } finally spark.sql("DROP TABLE pa_mrg_tbl")
  }

  test("q01 money aggregation is decimal-exact (no double partial sums)") {
    val plan = SparkEntry.queries("q01_agg_pricing_summary")(spark, dir)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("decimal(18,2)") || plan.contains("decimal(28,2)"),
      plan.take(2000))
  }

  test("t09 heavy hitters take top-k without a global sort") {
    val plan = planString(SparkEntry.queries("t09_top_ngrams")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      plan.take(2000))
  }

  test("p03 sequence packing never funnels through a single partition") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    val df = graft.operators.Packing.sequenceChunks(docs, "doc_id", "text", 2048)
    // the naive global cumsum would plan Exchange SinglePartition; the
    // distributed scan must not
    val single = shuffles(df).filter(_.outputPartitioning ==
      org.apache.spark.sql.catalyst.plans.physical.SinglePartition)
    assert(single.isEmpty,
      "global prefix sum collapsed to a single partition")
  }

  test("p28 packing over staged token ids inherits the distributed " +
      "prefix-sum shape: no single-partition funnel") {
    import spark.implicits._
    val counted = spark.range(2000).select($"id",
      ($"id" % 37 + 1).as("n_tokens"))
    val df = graft.operators.Packing.sequenceChunksFromCounts(
      counted, "doc_id", window = 512)
    val single = shuffles(df).filter(_.outputPartitioning ==
      org.apache.spark.sql.catalyst.plans.physical.SinglePartition)
    assert(single.isEmpty,
      "pre-counted packing collapsed to a single partition")
    // and the layout is the exact cumsum a sequential fold produces
    val rows = df.orderBy($"doc_id")
      .select($"doc_id", $"n_tokens", $"tok_start")
      .as[(Long, Long, Long)].collect()
    var acc = 0L
    rows.foreach { case (_, n, start) =>
      assert(start == acc); acc += n
    }
  }

  test("p06 corpus shuffle never funnels through a single partition") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").select($"doc_id")
    val df = graft.operators.Packing.deterministicShuffle(
      docs, "doc_id", seed = "graft-epoch-0", nShards = 8)
    // the oracle's row_number() OVER (ORDER BY k) would plan Exchange
    // SinglePartition; the distributed prefix-rank must not
    val single = shuffles(df).filter(_.outputPartitioning ==
      org.apache.spark.sql.catalyst.plans.physical.SinglePartition)
    assert(single.isEmpty,
      "global permutation rank collapsed to a single partition")
  }

  test("p26 curriculum interleave never funnels through a single partition") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source", $"text")
    val df = graft.operators.TextAnalysis.curriculumInterleave(
      docs, "doc_id", "source", "text")
    // the oracle's row_number() OVER (ORDER BY vtime, source, r) would
    // plan Exchange SinglePartition; the distributed prefix-rank must not
    val single = shuffles(df).filter(_.outputPartitioning ==
      org.apache.spark.sql.catalyst.plans.physical.SinglePartition)
    assert(single.isEmpty,
      "curriculum global position collapsed to a single partition")
    // the r11 finding: Window.partitionBy(source) shuffled FULL rows on
    // `source` alone — one task per source at corpus scale. The only
    // exchanges allowed to key on source alone are the partial-aggregate
    // ones (per-source offsets / mixture weights: they ship a handful of
    // pre-combined rows per map task, source-cardinality total)
    val srcOnly = shuffles(df).filter { e =>
      e.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          h.expressions.flatMap(_.references.map(_.name)).distinct ==
            Seq("source")
        case _ => false
      }
    }
    srcOnly.foreach { e =>
      assert(e.child.isInstanceOf[
          org.apache.spark.sql.execution.aggregate.BaseAggregateExec],
        s"p26 shuffles full rows keyed on source alone (the per-source " +
          s"window funnel): child = ${e.child.getClass.getSimpleName}")
    }
  }

  test("d08 substring dedup never shuffles document text") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    val df = Dedup.substringDupSpans(docs, "doc_id", "text",
      k = 8, minTokens = 15)
    val ex = shuffles(df)
    assert(ex.nonEmpty)
    // text is consumed by the codegen'd gram-hash pass before the first
    // exchange: every shuffle ships only compact numeric columns
    ex.foreach { e =>
      val strs = e.child.output.filter(_.dataType ==
        org.apache.spark.sql.types.StringType)
      assert(strs.isEmpty,
        s"d08 shuffle ships text columns: ${strs.map(_.name).mkString(", ")}")
    }
  }

  test("d07 label propagation: lineage stays constant across rounds and " +
      "each round's exchanges carry only (id, label) longs") {
    import spark.implicits._
    def chainGraph(len: Int): (DataFrame, DataFrame) = {
      val docs = (0L until 40L).map(i => (i, s"text payload $i"))
        .toDF("doc_id", "text")
      val pairs = (0L until len.toLong)
        .map(i => (i, i + 1)).toDF("id_a", "id_b")
      (docs, pairs)
    }
    // localCheckpoint must cut lineage every round: a 1-round star and a
    // multi-round chain (diameter forces >= 4 propagation rounds) must
    // produce the SAME optimized-plan shape — the plan reads the final
    // checkpointed RDD, it does not replay the loop
    def planNodes(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case n => n }.size
    val (d1, p1) = chainGraph(1)
    val (d2, p2) = chainGraph(12)
    val short = Dedup.dupClusters(d1, p1, "doc_id")
    val long = Dedup.dupClusters(d2, p2, "doc_id")
    assert(planNodes(short) == planNodes(long),
      s"lineage grew with rounds: ${planNodes(short)} vs ${planNodes(long)} " +
        "nodes — localCheckpoint regression")
    // and the result plan itself holds no shuffle at all (everything was
    // materialized inside the loop)
    assert(shuffles(long).isEmpty, "post-loop plan must read the " +
      "checkpointed labels, not re-shuffle")
    // correctness of the long chain while we're here: one cluster, min id
    val labels = long.collect()
    assert(labels.filter(_.getLong(0) <= 12).forall(_.getLong(1) == 0L))

    // white-box replica of one propagation round (the exact join+agg
    // dupClusters builds): every exchange ships at most two columns, all
    // LongType — no text, no arrays ever enter the loop's shuffles
    val docs = d2.select(col("doc_id").cast("long").as("id"))
      .withColumn("label", col("id"))
    val edges = p2
      .select(col("id_a").cast("long").as("src"), col("id_b").cast("long").as("dst"))
      .unionByName(p2.select(col("id_b").cast("long").as("src"),
        col("id_a").cast("long").as("dst")))
    val neighborMin = edges
      .join(docs.withColumnRenamed("id", "src"), "src")
      .groupBy(col("dst").as("id")).agg(min("label").as("nmin"))
    val round = docs.join(neighborMin, Seq("id"), "left")
      .select(col("id"),
        least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
    val ex = shuffles(round)
    assert(ex.nonEmpty)
    ex.foreach { e =>
      val out = e.child.output
      assert(out.size <= 2, s"round exchange ships ${out.size} columns: " +
        out.map(_.name).mkString(", "))
      assert(out.forall(_.dataType ==
        org.apache.spark.sql.types.LongType),
        s"round exchange ships non-long payload: ${out.map(a =>
          s"${a.name}:${a.dataType.simpleString}").mkString(", ")}")
    }
  }

  test("p12 z-order shards are rectangles in both dimensions and a " +
      "shard filter prunes files at the scan") {
    import spark.implicits._
    val laid = graft.operators.Layout.eventsZLayout(
      Tables.load(spark, dir, "events"), nShards = 16)
    // top-4-z-bit shards quarter each dimension: within one shard both
    // u16 and d16 span at most 2^14 — the locality that makes EITHER
    // column's range filter skip most shards
    val spans = laid.groupBy($"shard")
      .agg((max($"u16") - min($"u16")).as("du"),
        (max($"d16") - min($"d16")).as("dd"))
      .collect()
    spans.foreach { r =>
      assert(r.getLong(1) <= 16383 && r.getLong(2) <= 16383,
        s"shard ${r.getLong(0)} spans u=${r.getLong(1)} d=${r.getLong(2)}")
    }
    // a partitionBy(shard) write turns the shard predicate into
    // file-level pruning: the filtered read touches strictly fewer files
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    laid.write.mode("overwrite").partitionBy("shard").parquet(out)
    val full = spark.read.parquet(out)
    val one = full.filter($"shard" === spans.head.getLong(0))
    assert(one.count() > 0)
    // inputFiles ignores partition pruning — read the executed scan's
    // numFiles metric instead
    val scanned = allNodes(executedPlan(one)).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.get
    assert(scanned < full.inputFiles.length,
      s"shard filter read $scanned of ${full.inputFiles.length} files " +
        "- no pruning")
  }

  test("p11 bucketed co-located join + keyed agg run with zero exchanges") {
    val df = graft.sources.BucketedTables.colocatedOrderRevenue(spark, dir)
    // the UNORDERED pipeline (join + groupBy on the bucket key) must be
    // exchange-free: both scans are bucketed on the join key, the
    // sort-merge join consumes the bucket partitioning, and the keyed
    // aggregation reuses it
    assert(shuffles(df).isEmpty,
      s"bucketed join shuffled anyway:\n${planString(df).take(3000)}")
    assert(planString(df).contains("Bucketed: true"),
      "scan did not use the bucketed layout")
  }

  test("p14 PageRank: lineage stays constant across iterations and each " +
      "iteration's exchanges carry only (node, long) longs") {
    import spark.implicits._
    def ring(n: Int): DataFrame =
      (0L until n.toLong).map(i => (i, (i + 1) % n)).toDF("src", "dst")
    // localCheckpoint must cut lineage every iteration: 2 vs 10
    // iterations must yield the SAME optimized-plan size (the plan reads
    // the final checkpointed RDD, it does not replay the loop)
    def planNodes(df: DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case n => n }.size
    val short = graft.operators.Graph.pageRankPpm(ring(8), iters = 2)
    val long = graft.operators.Graph.pageRankPpm(ring(8), iters = 10)
    assert(planNodes(short) == planNodes(long),
      s"lineage grew with iterations: ${planNodes(short)} vs " +
        s"${planNodes(long)} nodes — localCheckpoint regression")
    assert(shuffles(long).isEmpty, "post-loop plan must read the " +
      "checkpointed ranks, not re-shuffle")
    // a symmetric ring is rank-uniform: every node sits at the 10^6
    // fixpoint exactly (integer arithmetic makes this precise)
    assert(long.as[(Long, Long)].collect().forall(_._2 == 1000000L))

    // white-box replica of one iteration (the exact join+agg the loop
    // builds): the loop-invariant (src, dst, deg) relation is staged
    // ONCE (cached, clustered by src — its one-time exchange ships 3
    // longs at ingest), and every PER-ITERATION exchange ships at most
    // two LongType columns
    val e = ring(8)
    val deg = e.groupBy($"src").agg(count(lit(1)).as("deg"))
    val e2 = e.join(deg, "src").select($"src", $"dst", $"deg")
      .repartition($"src").persist()
    try {
      val ranks = e.select($"src".as("node")).distinct()
        .withColumn("rank_ppm", lit(1000000L))
      val round = e2.join(ranks.withColumnRenamed("node", "src"), "src")
        .select($"dst".as("node"), expr("rank_ppm div deg").as("c"))
        .groupBy($"node").agg(sum($"c").as("s"))
        .select($"node",
          (lit(150000L) + expr("(850000 * s) div 1000000")).as("rank_ppm"))
      // exchanges INSIDE the cached e2 subplan are ingest-time, not
      // per-iteration (collect does not descend into the InMemoryRelation)
      val ex = shuffles(round)
      assert(ex.nonEmpty)
      ex.foreach { x =>
        val out = x.child.output
        assert(out.size <= 2, s"iteration exchange ships ${out.size} " +
          s"columns: ${out.map(_.name).mkString(", ")}")
        assert(out.forall(_.dataType ==
          org.apache.spark.sql.types.LongType),
          s"iteration exchange ships non-long payload: ${out.map(a =>
            s"${a.name}:${a.dataType.simpleString}").mkString(", ")}")
      }
    } finally { e2.unpersist(); () }
  }

  test("d08 hot boilerplate gram becomes an AQE skew-join split, not a " +
      "single-reducer partition") {
    import spark.implicits._
    // plant ONE hot gram: 480 of 600 docs carry a 200-token single-token
    // boilerplate run, so every window of it hashes to the same gh —
    // ~93k postings on one shuffle key, ~10x the median partition. The
    // other 100 tokens per doc are unique, forming the median. Broadcast
    // is disabled to emulate the at-scale shape (a 100 TB dup-gram set
    // never broadcasts), and the skew thresholds are scaled to the
    // fixture so the production AQE path actually exercises.
    val docs = (0 until 600).map { i =>
      val uniq = (0 until 50).map(t => s"u${i}x$t").mkString(" ")
      (i.toLong,
        if (i % 5 != 0) uniq + " " + Seq.fill(800)("boiler").mkString(" ")
        else uniq)
    }.toDF("doc_id", "text")
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "16384")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      val out = Dedup.substringDupSpans(docs, "doc_id", "text",
        k = 8, minTokens = 15)
      val plan = executedPlan(out)
      // the spans themselves: every hot doc reports its boilerplate run
      assert(out.filter($"span_tokens" >= 200).count() == 480)
      val skewJoins = allNodes(plan).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.isSkewJoin => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if j.isSkewJoin => j
      }
      assert(skewJoins.nonEmpty,
        "hot-gram equi-join was not planned as an AQE skew split:\n" +
          plan.toString.take(4000))
      // the d09 apply step's keeper-election join has the same hazard
      val applied = Dedup.substringDedupApply(docs, "doc_id", "text", k = 8)
      val applySkew = allNodes(executedPlan(applied)).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
          if j.isSkewJoin => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
          if j.isSkewJoin => j
      }
      assert(applySkew.nonEmpty,
        "d09 keeper-election join was not planned as an AQE skew split")
      // boilerplate collapses to its first occurrence: every hot doc
      // except the keeper loses its run
      assert(applied.filter($"n_kept" < $"n_tokens").count() >= 479)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("s12/pqBatchTopK serves the whole probe set with ONE corpus scan") {
    import spark.implicits._
    // corpus from parquet, probes from a local relation: every
    // FileSourceScanExec in the final plan is then a corpus read, so
    // counting them pins "one scan for the whole probe set" directly
    // (the looped pqTopK form this replaced planned q scans for q probes)
    val corpus = Tables.load(spark, dir, "embeddings").filter($"vec_id" >= 5)
    val probeRows = Tables.load(spark, dir, "embeddings")
      .filter($"vec_id" < 5).select($"vec_id", $"embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val probes = probeRows.toSeq.toDF("vec_id", "embedding")
    val df = Similarity.pqBatchTopK(corpus, "vec_id", "embedding",
      probes, "vec_id", "embedding", k = 10, m = 8, ksub = 16,
      shortlist = 10, indexKey = Some("plan-audit-pq"))
    val scans = allNodes(executedPlan(df)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1,
      s"expected exactly 1 corpus scan for the whole probe set, got " +
        s"${scans.size}")
    // the probe LUTs arrive by broadcast — the corpus side never shuffles
    // before the bounded shortlist aggregation
    assert(planString(df).contains("BroadcastNestedLoopJoin"),
      planString(df).take(3000))
    // LUT construction is a plan-side projection over the probe relation
    // (not a driver loop feeding precomputed LUT rows, the shape this
    // replaced). Asserted on the ANALYZED plan: for this test's literal
    // probe set ConvertToLocalRelation legitimately folds the projection
    // into the local relation; a parquet-backed probe table keeps it on
    // the executors.
    assert(df.queryExecution.analyzed.toString.contains("pq_dot_lut"),
      df.queryExecution.analyzed.toString.take(3000))
  }

  test("t17 sketch-only overlap reads the corpus ONCE and broadcasts the " +
      "pair grid") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").select($"source", $"text")
    val df = graft.operators.TextAnalysis.kmvSourceOverlap(
      docs, "source", graft.operators.Dedup.shingles($"text", 3),
      k = 64, includeExact = false)
    val plan = executedPlan(df)
    // the at-scale contract: estimates come from the sketches ALONE, so
    // the corpus parquet is scanned exactly once (includeExact=true
    // deliberately pays a second scan to grade the estimator)
    val scans = allNodes(plan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size == 1,
      s"sketch-only overlap scanned the corpus ${scans.size} times")
    // the source-pair grid joins by broadcast: the sketch relation
    // (sources x k longs) never shuffles
    assert(planString(df).contains("BroadcastNestedLoopJoin") ||
      planString(df).contains("BroadcastExchange"), planString(df).take(3000))
  }

  test("s11 filtered ANN pre-filters: label pushed to the scan, metadata " +
      "ids broadcast, result is TakeOrderedAndProject") {
    val df = SparkEntry.queries("s11_filtered_ann")(spark, dir)
    val plan = planString(df)
    // attribute predicate prunes row groups BEFORE any distance math
    assert(plan.contains("EqualTo(label,3)"), plan.take(3000))
    // metadata-table filter arrives as a broadcast semi-join of bare ids
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.take(3000))
    // top-k never global-sorts the survivors
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
  }

  test("p18 grid-bucketed interval join plans an equi-join, never a " +
      "nested loop or cartesian product") {
    val df = SparkEntry.queries("p18_interval_join")(spark, dir)
    val plan = planString(df)
    // a raw BETWEEN theta-join would be BroadcastNestedLoopJoin — one
    // all-pairs unsplittable stage; the grid cell restores a hash key
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      plan.take(3000))
  }

  test("p19 triangle counting shuffles only long keys — the document-" +
      "free posture every graph round must keep") {
    val df = SparkEntry.queries("p19_triangle_count")(spark, dir)
    for (e <- shuffles(df)) {
      val cols = e.output.map(a => s"${a.name}:${a.dataType.simpleString}")
      assert(cols.forall(_.endsWith(":bigint")) ||
        cols.forall(c => c.endsWith(":bigint") || c.endsWith(":int")),
        s"triangle shuffle carries non-integer columns: $cols")
    }
    assert(!planString(df).contains("CartesianProduct"),
      planString(df).take(3000))
  }

  test("p20 weighted sample: the only shuffle is the one-row weight " +
      "total; the keep decision never moves data") {
    val df = SparkEntry.queries("p20_weighted_sample")(spark, dir)
    // the final orderBy is presentation; ignore rangepartitioning
    val aggShuffles = shuffles(df).filterNot(
      _.outputPartitioning.toString.contains("rangepartitioning"))
    assert(aggShuffles.size == 1,
      s"expected only the ΣW scalar shuffle, saw ${aggShuffles.size}")
    // the partial-sum buffer is (sum, isEmpty) — nothing row-shaped
    val cols = aggShuffles.head.output.map(_.name)
    assert(cols.forall(c => c.contains("sum") || c.contains("isEmpty")),
      s"scalar-total shuffle carries row data: $cols")
  }

  test("p21 multi-touch attribution joins on (user, time-cell) — an " +
      "equi-join with the grid in the key, never entity-only or nested " +
      "loop") {
    val df = SparkEntry.queries("p21_multitouch_attribution")(spark, dir)
    val plan = planString(df)
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan.take(3000))
    // the hash key carries BOTH user_id and the grid cell: a hot user's
    // candidate set is cut by the calendar, the anti-skew claim
    val joinKey = allNodes(executedPlan(df)).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
        j.leftKeys.map(_.toString).mkString(",")
    }.find(_.contains("_cell"))
    assert(joinKey.exists(k => k.contains("user_id") && k.contains("_cell")),
      s"join keys: $joinKey\n${plan.take(2000)}")
  }

  test("s14 hamming top-k: bounded heap aggregates partially before the " +
      "probe shuffle; candidate join is an equi-join on the chunk") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    val df = Similarity.hammingTopK(docs, "doc_id",
      docs.filter($"doc_id" % 25 === 0), "doc_id", "text", k = 3)
    val full = allNodes(executedPlan(df)).mkString("\n")
    assert(full.contains("partial_topkbyscore"), full.take(3000))
    assert(!full.contains("CartesianProduct") &&
      !full.contains("BroadcastNestedLoopJoin"), full.take(3000))
  }

  test("s21 persisted BM25: the postings scan prunes buckets down to " +
      "the query terms' buckets and matches the per-query path") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    val terms = Seq("vector", "stream", "merge", "window", "spark")
    val stagedDf = graft.operators.Retrieval.bm25StagedTopK(
      spark, dir, docs, "doc_id", "text", terms, topK = 20)
    val staged = stagedDf.as[(Long, Long)].collect().toSeq
    val mem = graft.operators.Retrieval.bm25TopK(
        docs, "doc_id", "text", terms, topK = 20)
      .as[(Long, Long)].collect().toSeq
    assert(staged == mem, "staged BM25 must equal the per-query path")
    val scans = allNodes(executedPlan(stagedDf)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val postings = scans.filter(_.output.exists(_.name == "tf"))
    assert(postings.nonEmpty, s"no postings scan in ${scans.map(_.nodeName)}")
    postings.foreach { f =>
      val sel = f.metadata.get("SelectedBucketsCount")
      assert(sel.isDefined, s"postings scan not bucket-pruned: ${f.metadata}")
      val m = "(\\d+) out of (\\d+)".r.findFirstMatchIn(sel.get)
      assert(m.isDefined, sel.get)
      assert(m.get.group(1).toInt < m.get.group(2).toInt,
        s"no buckets pruned: ${sel.get}")
    }
  }

  test("s22 persisted IVFxPQ: the probe prunes list_id partition " +
      "directories on the CODES table, the surviving read is codes-only, " +
      "and results match the in-memory composite") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0)
    val corpus = embs.filter($"vec_id" =!= 0)
    val stagedDf = Similarity.ivfPqStagedTopK(spark, dir, corpus,
      "vec_id", "embedding", q, k = 20, nlist = 16, nprobe = 4,
      m = 8, ksub = 16, shortlist = 50)
    val staged = stagedDf.as[(Long, Double)].collect().toSeq
    val mem = Similarity.ivfPqTopK(corpus, "vec_id", "embedding",
        q, k = 20, nlist = 16, nprobe = 4, m = 8, ksub = 16,
        shortlist = 50)
      .as[(Long, Double)].collect().toSeq
    assert(staged == mem, "staged IVFxPQ must equal the in-memory path")
    // audit the ADC scan's own plan: directory pruning + codes-only read
    val (codesTable, _) = Similarity.ivfPqStagedTables(dir, 16, 8, 16)
    val centroids = Similarity.seededCentroids(
      corpus, "vec_id", "embedding", nlist = 16)
    val probed = Similarity.seededProbeLists(spark, centroids, q, 4)
    val adc = spark.table(codesTable)
      .filter($"list_id".isin(probed: _*))
      .select($"vec_id", $"codes")
    adc.collect()
    val scans = allNodes(executedPlan(adc)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("list_id")),
      s"no list_id partition filter: ${scan.partitionFilters}")
    assert(scan.selectedPartitions.partitionCount <= 4,
      s"probe read ${scan.selectedPartitions.partitionCount} list dirs")
    assert(scan.output.map(_.name).toSet.subsetOf(
        Set("vec_id", "codes", "list_id")),
      s"ADC scan reads ${scan.output.map(_.name)}")
    assert(!scan.output.exists(_.name == "embedding"),
      "ADC scan must never read the raw vectors")
  }

  test("s20 persisted PQ: the ADC ranking scans only the staged " +
      "(id, codes) table, the refine reads the corpus through a pushed " +
      "id IN filter, and results match the in-memory PQ") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0)
    val corpus = embs.filter($"vec_id" =!= 0)
    val stagedDf = Similarity.pqStagedTopK(spark, dir, corpus,
      "vec_id", "embedding", q, k = 20, m = 8, ksub = 16, shortlist = 100)
    val staged = stagedDf.as[(Long, Double)].collect().toSeq
    val mem = Similarity.pqTopK(corpus, "vec_id", "embedding",
      q, k = 20, m = 8, ksub = 16, shortlist = 100)
      .as[(Long, Double)].collect().toSeq
    assert(staged == mem, "staged PQ must equal the in-memory PQ")
    // the serve plan never touches the raw embedding column except in
    // the shortlist refine, whose scan carries the pushed In(vec_id)
    val scans = allNodes(executedPlan(stagedDf)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    scans.foreach { f =>
      val readsVec = f.output.exists(_.name == "embedding")
      if (readsVec)
        assert(f.metadata.get("PushedFilters").exists(_.contains("In(vec_id")),
          s"refine scan reads embeddings without a pushed id filter: " +
            f.metadata.get("PushedFilters").toString)
    }
    // the ADC side is a codes-only read: some scan reads (vec_id, codes)
    // and nothing else — the m-bytes-per-vector IO reduction is physical
    val (codesTable, _) = Similarity.pqStagedTables(dir, 8, 16)
    val codeScan = {
      // the ADC stage ran inside pqStagedTopK (driver-collected
      // shortlist); audit its own plan directly
      val codebooks = Similarity.pqStagedCodebooks(spark, dir, 8, 16)
      assert(codebooks.length == 8 && codebooks.forall(_.length == 16))
      spark.table(codesTable).select($"vec_id", $"codes")
    }
    val cs = allNodes(executedPlan(codeScan)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(cs.nonEmpty)
    assert(cs.head.output.map(_.name).toSet == Set("vec_id", "codes"),
      s"codes scan reads ${cs.head.output.map(_.name)}")
    // fresh-engine path: the staged files alone carry the index
    val loc = spark.conf.get("spark.sql.warehouse.dir") + "/" + codesTable
    val fresh = spark.read.parquet(loc)
    assert(fresh.count() == corpus.count())
    assert(fresh.columns.toSet == Set("vec_id", "codes"))
  }

  test("s19 persisted IVF: the probe's list_id IN-set prunes partition " +
      "directories at the scan and matches the in-memory seeded IVF") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0)
    val corpus = embs.filter($"vec_id" =!= 0)
    val stagedDf = Similarity.ivfStagedTopK(spark, dir, corpus,
      "vec_id", "embedding", q, k = 20, nlist = 16, nprobe = 4)
    val staged = stagedDf.as[(Long, Double)].collect().toSeq
    val mem = Similarity.ivfSeededTopK(corpus, "vec_id", "embedding",
      q, k = 20, nlist = 16, nprobe = 4).as[(Long, Double)].collect().toSeq
    assert(staged == mem, "staged probe must equal the in-memory index")
    // the staged scan reads ONLY the nprobe probed list_id directories
    val scans = allNodes(executedPlan(stagedDf)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.toString.contains("list_id")),
      s"no list_id partition filter: ${scan.partitionFilters}")
    val selected = scan.selectedPartitions.partitionCount
    val total = spark.table(Similarity.ivfStagedTable(dir))
      .select($"list_id").distinct().count()
    assert(selected <= 4, s"probe read $selected partitions, nprobe=4")
    assert(selected < total,
      s"probe read $selected of $total list partitions - no pruning")
  }

  test("t21 RAG chunking is shuffle-free: explode + codegen'd slicing, " +
      "no Exchange") {
    import spark.implicits._
    val df = graft.operators.TextAnalysis.ragChunks(
      Tables.load(spark, dir, "documents").select($"doc_id", $"text"),
      "doc_id", "text", window = 64, stride = 48)
    assert(shuffles(df).isEmpty,
      "chunking must be a pure per-partition generator explode")
  }

  test("t20 BPE encode joins broadcast the vocabulary-scale tables, " +
      "never shuffling the exploded corpus") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    val merges = graft.operators.TextAnalysis.bpeLearnMerges(
      docs, "text", iters = 4)
    val df = graft.operators.TextAnalysis.bpeEncode(
      docs, "doc_id", "text", merges)
    val joins = allNodes(executedPlan(df)).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty)
    val nonBroadcast = joins.filterNot(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
    assert(nonBroadcast.isEmpty,
      s"corpus-side shuffle join planned: ${nonBroadcast.map(_.nodeName)}")
  }

  test("t22 BPE id materialization assembles arrays without exploding " +
      "segments at corpus scale: broadcast joins only, and the per-doc " +
      "assembly shuffle ships id arrays, never segmentation strings") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    val merges = graft.operators.TextAnalysis.bpeLearnMerges(
      docs, "text", iters = 4)
    val df = graft.operators.TextAnalysis.bpeEncodeIds(
      docs, "doc_id", "text", merges)
    val joins = allNodes(executedPlan(df)).collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }
    assert(joins.nonEmpty)
    val nonBroadcast = joins.filterNot(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
    assert(nonBroadcast.isEmpty,
      s"corpus-side shuffle join planned: ${nonBroadcast.map(_.nodeName)}")
    // the only corpus-scale exchange is the groupBy(doc id) assembly;
    // its rows must be (id, collect partials of long arrays) — a string
    // there would mean the corpus shuffled words or segments
    val docKeyed = shuffles(df).filter { e =>
      e.outputPartitioning match {
        case h: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
          h.expressions.flatMap(_.references.map(_.name)).contains("id")
        case _ => false
      }
    }
    def hasString(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case org.apache.spark.sql.types.StringType => true
        case a: org.apache.spark.sql.types.ArrayType =>
          hasString(a.elementType)
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.exists(f => hasString(f.dataType))
        case m: org.apache.spark.sql.types.MapType =>
          hasString(m.keyType) || hasString(m.valueType)
        case _ => false
      }
    docKeyed.foreach { e =>
      val strs = e.child.output.filter(a => hasString(a.dataType))
      assert(strs.isEmpty,
        s"t22 doc-assembly shuffle ships strings: ${strs.map(_.name)}")
    }
  }

  test("p22 hilbert layout: a 2-D rectangle predicate prunes files via " +
      "its curve runs and matches the direct filter exactly") {
    import spark.implicits._
    val laid = graft.operators.Layout.eventsHilbertLayout(
      Tables.load(spark, dir, "events"), nShards = 16)
    val out = java.nio.file.Files.createTempDirectory("hilbert").toString
    laid.write.mode("overwrite").partitionBy("shard").parquet(out)
    val full = spark.read.parquet(out)
    // a mid-grid rectangle in (user, day) cell space
    val (x0, x1, y0, y1) = (64L, 127L, 32L, 95L)
    val pruned = full.filter(graft.operators.Layout.hilbertRectPredicate(
      $"h", $"shard", bits = 8, nShards = 16, x0, x1, y0, y1))
    val direct = full.filter($"u8".between(x0, x1) && $"d8".between(y0, y1))
    // exact: the runs ARE the rectangle, just in curve coordinates
    assert(pruned.select($"event_id").as[Long].collect().sorted.toSeq ==
      direct.select($"event_id").as[Long].collect().sorted.toSeq)
    assert(pruned.count() > 0, "test rectangle must be non-empty")
    val scanned = allNodes(executedPlan(pruned)).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.get
    assert(scanned < full.inputFiles.length,
      s"rect predicate read $scanned of ${full.inputFiles.length} files " +
        "- shard IN-set did not prune")
  }

  test("s15 range search joins probe buckets to the corpus as an " +
      "equi-join - no cartesian, no nested loop") {
    val plan = planString(
      SparkEntry.queries("s15_range_search")(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("p23 k-core: each peel round semi-joins the keep set by " +
      "broadcast - the edge list itself is never re-shuffled") {
    import spark.implicits._
    val edges = (for (a <- 1L to 30L; b <- a + 1 to 30L if b - a <= 3)
      yield (a, b)).toDF("a", "b").localCheckpoint()
    val round = graft.operators.Graph.peelRound(edges, k = 2)
    val plan = planString(round)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // the only exchanges feed the node-scale degree aggregate (and its
    // broadcast) - none may repartition the edge relation itself
    val edgeShuffles = shuffles(round).filter(
      _.child.schema.fieldNames.toSet == Set("a", "b"))
    assert(edgeShuffles.isEmpty,
      s"edge list was shuffled:\n${plan.take(3000)}")
  }

  test("s18 MIPS plans TakeOrderedAndProject - scan + heap, no global sort") {
    val plan = planString(SparkEntry.queries("s18_mips")(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("p25 mixture resample: keep decision is row-local - the weights " +
      "broadcast and the doc stream never shuffles") {
    import spark.implicits._
    val df = SparkEntry.queries("p25_temperature_mixture")(spark, dir)
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin"), plan.take(3000))
    // the only exchanges may carry source-scale weight rows or the
    // final ORDER BY - never a shuffle keyed on the doc stream itself
    val docShuffles = shuffles(df).filter { e =>
      val names = e.child.schema.fieldNames.toSet
      names.contains("text") || names.contains("doc_id") &&
        !names.contains("weight_ppm") && names.size > 2
    }
    assert(docShuffles.forall(_.outputPartitioning.toString
        .contains("rangepartitioning")),
      s"doc rows hash-shuffled:\n${plan.take(3000)}")
  }

  test("p24 resample: the observation-to-cell join is an equi-join and " +
      "nothing plans a cartesian or range join") {
    val plan = planString(SparkEntry.queries("p24_resample_locf")(spark, dir))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }

  test("t26 bigram-LM tercile rank never funnels through a single " +
      "partition") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    val df = graft.operators.TextAnalysis.bigramLmBuckets(
      docs, "doc_id", "text")
    // the oracle's row_number() OVER (ORDER BY mean, doc_id) would plan
    // Exchange SinglePartition; the distributed prefix-rank must not
    val single = shuffles(df).filter(_.outputPartitioning ==
      org.apache.spark.sql.catalyst.plans.physical.SinglePartition)
    assert(single.isEmpty,
      "bigram-LM tercile rank collapsed to a single partition")
  }

  test("p29 quality curriculum never funnels through a single partition") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    val df = graft.operators.TextAnalysis.qualityCurriculum(
      docs, "doc_id", "text", seed = "audit")
    // the oracle's row_number() OVER (ORDER BY stage, k) would plan
    // Exchange SinglePartition; the distributed prefix-rank must not
    val single = shuffles(df).filter(_.outputPartitioning ==
      org.apache.spark.sql.catalyst.plans.physical.SinglePartition)
    assert(single.isEmpty,
      "curriculum stream position collapsed to a single partition")
  }

  test("p30 curriculum ASSIGNMENT from the frozen artifact is per-" +
      "document only (streaming-safe): no single-partition exchange") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    graft.operators.TextAnalysis.ensureBigramLmStaged(
      spark, dir, docs, "doc_id", "text")
    val df = graft.operators.TextAnalysis.curriculumAssignFromArtifact(
      spark, docs, "doc_id", "text", dir, "audit")
    val single = shuffles(df).filter(_.outputPartitioning ==
      org.apache.spark.sql.catalyst.plans.physical.SinglePartition)
    assert(single.isEmpty,
      "late-arrival stage assignment collapsed to a single partition " +
        "(a global rank leaked into the streaming-safe path)")
  }

  test("t27 LM-artifact SERVING is per-document only: no single-" +
      "partition exchange anywhere in the scoring plan") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    graft.operators.TextAnalysis.ensureBigramLmStaged(
      spark, dir, docs, "doc_id", "text")
    val df = graft.operators.TextAnalysis.bigramLmBucketsFromArtifact(
      spark, docs, "doc_id", "text", dir)
    // serving must need NO global rank (the cut-points are frozen
    // literals): a SinglePartition exchange here would mean the tercile
    // computation leaked into the per-document scoring path
    val single = shuffles(df).filter(_.outputPartitioning ==
      org.apache.spark.sql.catalyst.plans.physical.SinglePartition)
    assert(single.isEmpty,
      "artifact serving planned a single-partition exchange")
  }

  test("CDC changesBetween diffs distribute: hash exchanges only, no " +
      "single-partition funnel, and the plan reads only changed dirs") {
    import spark.implicits._
    import graft.engine.PartitionedManifest
    val root = java.nio.file.Files.createTempDirectory("graft-cdc-plan")
      .toString
    val rows = (0 until 4).flatMap(b => (1 to 50).map(i =>
      ((b * 100 + i).toLong, b)))
    PartitionedManifest.seed(spark, root, rows.toDF("i", "bk"), "bk")
    val s1 = PartitionedManifest.commitSnapshot(spark, root, "bk",
      Map.empty, keepSnapshots = 3)
    val s2 = PartitionedManifest.commitSnapshot(spark, root, "bk",
      Map("2" -> (1 to 40).map(i => (200 + i).toLong * 7).toDF("i")),
      keepSnapshots = 3)
    val df = PartitionedManifest.changesBetween(spark, root, "bk", "int",
      s1, s2)
    val single = shuffles(df).filter(_.outputPartitioning ==
      org.apache.spark.sql.catalyst.plans.physical.SinglePartition)
    assert(single.isEmpty,
      "the multiset diff planned a single-partition exchange")
    assert(df.inputFiles.nonEmpty &&
      df.inputFiles.forall(_.contains("/bk=2/")), df.inputFiles.toSeq)
  }
}
