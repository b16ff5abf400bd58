package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.EventsStreaming
import graft.operators.TextAnalysis

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("windowed streaming counts match the batch equivalent") {
    import spark.implicits._
    val batchEvents = Tables.load(spark, dir, "events")
    // batch "stream": feed the fixture through a file stream one-shot
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(EventsStreaming.eventSchema)
      .parquet(tmp)
    val q = EventsStreaming.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_out")
      val want = EventsStreaming.windowedCounts(batchEvents)
      assert(got.count() == want.count())
      assert(got.agg(sum($"n")).head().getLong(0) == batchEvents.count())
    } finally q.stop()
  }

  test("watermark drops late data: a finalized window never re-emits") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ev(id: Long, hhmm: String): EventsStreaming.Event =
      EventsStreaming.Event(id,
        java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), 1L, "click", 1.0)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.Event]
    val q = EventsStreaming.windowedCounts(mem.toDF(), "1 hour", "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      mem.addData(ev(1, "10:05"), ev(2, "10:20")) // window [10:00, 11:00)
      q.processAllAvailable()
      mem.addData(ev(3, "12:00")) // watermark → 11:50: closes + emits W1
      q.processAllAvailable()
      mem.addData(ev(4, "10:30")) // LATE: below watermark — must be dropped
      q.processAllAvailable()
      mem.addData(ev(5, "13:30")) // watermark → 13:20: closes W2 (12:00)
      q.processAllAvailable()
      val rows = spark.table("late_out")
        .select($"win_start".cast("string"), $"n").as[(String, Long)]
        .collect().toMap
      assert(rows("2024-01-01 10:00:00") == 2L,
        s"late event leaked into a finalized window: $rows")
      assert(rows("2024-01-01 12:00:00") == 1L, rows.toString)
    } finally q.stop()
  }

  test("streaming dedup keeps one row per event_id within the watermark") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ev(id: Long, mm: Int): EventsStreaming.Event =
      EventsStreaming.Event(id,
        java.sql.Timestamp.valueOf(f"2024-01-01 10:$mm%02d:00"), 1L, "click", 1.0)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.Event]
    val q = EventsStreaming.dedupByKey(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData(ev(1, 0), ev(1, 1), ev(2, 2)) // id 1 duplicated
      q.processAllAvailable()
      mem.addData(ev(1, 3), ev(3, 4)) // id 1 again, still within horizon
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select($"event_id").as[Long]
        .collect().toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("sliding windows count each event window/slide times") {
    import spark.implicits._
    val batch = Tables.load(spark, dir, "events")
    val slid = EventsStreaming.slidingCounts(batch, "1 hour", "30 minutes")
    assert(slid.agg(sum($"n")).head().getLong(0) == 2 * batch.count())
  }

  test("streaming curation keeps the same corpus as the batch pipeline") {
    import spark.implicits._
    // stream the documents fixture (with planted duplicates) through the
    // curation composition; the kept FINGERPRINT set must equal the batch
    // p02 selection (kept doc ids differ only on which duplicate survives)
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("ts", lit(java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
    val dup = docs.filter($"doc_id" < 25)
      .withColumn("doc_id", $"doc_id" + 100000L)
    val tmp = java.nio.file.Files.createTempDirectory("graft-curate").toString
    docs.unionByName(dup).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(docs.unionByName(dup).schema).parquet(tmp)
    val q = EventsStreaming.curate(stream, "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("curate_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("curate_out")
      val batch = SparkEntry.queries("p02_curation_pipeline")(spark, dir)
      assert(streamed.select("fp").distinct().count() == streamed.count(),
        "streaming dedup left duplicate fingerprints")
      assert(streamed.count() == batch.count(),
        s"streamed ${streamed.count()} vs batch ${batch.count()}")
    } finally q.stop()
  }

  test("streaming as-of attribution equals the batch operator on an in-order replay") {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
    // in-order replay: the file stream feeds whole-fixture batches, and
    // the handler sorts each per-user slice by event time
    val tmp = java.nio.file.Files.createTempDirectory("graft-asof").toString
    events.write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream
      .schema(EventsStreaming.eventSchema).parquet(tmp)
      .as[EventsStreaming.Event]
    val q = EventsStreaming.asofAttribution(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out").start()
    val want = SparkEntry.queries("p04_asof_join")(spark, dir)
      .select($"event_id", $"view_event_id", $"view_value")
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap
    try {
      q.processAllAvailable()
      val got = spark.table("asof_out")
        .select($"event_id", $"view_event_id", $"view_value").collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
        .toMap
      assert(got.size == want.size, s"${got.size} purchases vs ${want.size}")
      assert(got == want)
    } finally q.stop()

    // batch mode runs the same handler single-pass
    val batchGot = EventsStreaming.asofAttribution(spark,
        events.as[EventsStreaming.Event])
      .collect()
      .map(m => m.event_id -> m.view_event_id.map(id => (id, m.view_value.get)))
      .toMap
    assert(batchGot == want)
  }

  test("quiet key's session closes on watermark advance, not wall clock") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ev(id: Long, user: Long, hhmm: String): EventsStreaming.Event =
      EventsStreaming.Event(id,
        java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), user, "click", 1.0)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.Event]
    val q = EventsStreaming
      .sessionize(spark, mem.toDS(), gapMs = 30 * 60 * 1000L,
        watermark = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // user 1 goes quiet after 10:10 (out-of-order within the batch);
      // user 2 keeps the stream moving
      mem.addData(ev(2, 1L, "10:10"), ev(1, 1L, "10:00"), ev(3, 2L, "10:05"))
      q.processAllAvailable()
      assert(spark.table("sess_out").isEmpty, "nothing closed yet")
      // watermark → 13:50, far past user 1's last+gap (10:40): the NEXT
      // batch fires the event-time timeout — no sleep involved
      mem.addData(ev(4, 2L, "14:00"))
      q.processAllAvailable()
      mem.addData(ev(5, 2L, "14:01"))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select($"user_id", $"n_events", $"session_start".cast("string"),
          $"session_end".cast("string"))
        .as[(Long, Long, String, String)].collect().toSet
      // user 1's tail session closed by the WATERMARK timeout (no new user-1
      // data ever arrived); user 2's first session closed inline by the gap
      assert(rows == Set(
        (1L, 2L, "2024-01-01 10:00:00", "2024-01-01 10:10:00"),
        (2L, 1L, "2024-01-01 10:05:00", "2024-01-01 10:05:00")),
        rows.mkString("; "))
    } finally q.stop()
  }

  test("late in-watermark event from an earlier batch extends, never rewinds") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    def ev(id: Long, user: Long, hhmm: String): EventsStreaming.Event =
      EventsStreaming.Event(id,
        java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00"), user, "click", 1.0)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.Event]
    val q = EventsStreaming
      .sessionize(spark, mem.toDS(), gapMs = 30 * 60 * 1000L,
        watermark = "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("late_sess_out").start()
    try {
      mem.addData(ev(1, 1L, "10:20"))
      q.processAllAvailable() // state: start=end=10:20
      // LATE but above the watermark: must extend start to 10:05, keep end
      mem.addData(ev(2, 1L, "10:05"))
      q.processAllAvailable()
      mem.addData(ev(3, 2L, "14:00")) // advance watermark far past last+gap
      q.processAllAvailable()
      mem.addData(ev(4, 2L, "14:01"))
      q.processAllAvailable()
      val rows = spark.table("late_sess_out")
        .filter($"user_id" === 1L)
        .select($"n_events", $"session_start".cast("string"),
          $"session_end".cast("string"))
        .as[(Long, String, String)].collect().toSeq
      assert(rows == Seq((2L, "2024-01-01 10:05:00", "2024-01-01 10:20:00")),
        rows.mkString("; "))
    } finally q.stop()
  }

  test("stateful sessionization emits closed sessions") {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventsStreaming.Event]
    val sessions = EventsStreaming.sessionize(spark, events)
    val n = sessions.count()
    assert(n > 0, "no sessions emitted")
    assert(sessions.filter($"session_end" < $"session_start").count() == 0)
  }

  test("streaming MinHash band near-dup equals batch under a SHUFFLED replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // fixture + planted near-dups (copies share ALL bands with their
    // original); ts spreads docs over two event-time windows, each copy
    // in its original's window
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def tsOf(id: Long): java.sql.Timestamp =
      new java.sql.Timestamp(base.getTime + (id % 2) * 3600L * 1000)
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => EventsStreaming.DocArrival(r.getLong(0), r.getString(1),
        tsOf(r.getLong(0))))
    val planted = docs.filter(_.doc_id < 25)
      .map(d => d.copy(doc_id = d.doc_id + 100000L, ts = tsOf(d.doc_id)))
    val all = docs ++ planted

    // batch reference: the SAME operator on a static frame
    val batchRows = EventsStreaming
      .nearDupBands(spark.createDataFrame(all.toSeq), "ts")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(batchRows.nonEmpty)

    // shuffled replay across three micro-batches, then a far-future
    // sentinel advances the watermark so append mode flushes the windows
    val shuffled = all.sortBy(d => (d.doc_id * 2654435761L) % 1000003)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.DocArrival]
    val q = EventsStreaming.nearDupBands(mem.toDF(), "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      shuffled.grouped(math.max(shuffled.length / 3, 1)).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
      mem.addData(EventsStreaming.DocArrival(999999999L, "zzz sentinel",
        new java.sql.Timestamp(base.getTime + 48L * 3600 * 1000)))
      q.processAllAvailable()
      val got = spark.table("neardup_out")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      // arrival-order independence: the flushed buckets equal batch
      assert(got == batchRows,
        s"stream-batch: ${(got -- batchRows).take(5)}; " +
          s"batch-stream: ${(batchRows -- got).take(5)}")
      // the planted copies (id > original, so never a bucket winner)
      // actually surface as candidates
      val flagged = got.map(_._3).filter(_ >= 100000L).map(_ - 100000L)
      assert(flagged.size >= 20, s"only ${flagged.size}/25 planted found")
    } finally q.stop()
  }

  test("streaming SimHash near-dup equals batch under a SHUFFLED replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // near-identical planted copies: one token appended, so the SimHash
    // signature lands within the hamming ball of its original (unlike
    // exact copies, which only exercise hamming 0)
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def tsOf(id: Long): java.sql.Timestamp =
      new java.sql.Timestamp(base.getTime + (id % 2) * 3600L * 1000)
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => EventsStreaming.DocArrival(r.getLong(0), r.getString(1),
        tsOf(r.getLong(0))))
    val planted = docs.filter(_.doc_id < 25)
      .map(d => d.copy(doc_id = d.doc_id + 100000L, ts = tsOf(d.doc_id),
        text = d.text + " zq"))
    val all = docs ++ planted

    // batch reference: the SAME operator on a static frame
    val batchRows = EventsStreaming
      .simhashNearDup(spark.createDataFrame(all.toSeq), "ts")
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(batchRows.nonEmpty)

    // shuffled replay across three micro-batches, then a far-future
    // sentinel advances the watermark so append mode flushes the windows
    val shuffled = all.sortBy(d => (d.doc_id * 2654435761L) % 1000003)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.DocArrival]
    val q = EventsStreaming.simhashNearDup(mem.toDF(), "ts")
      .writeStream.outputMode("append")
      .format("memory").queryName("simhash_out").start()
    try {
      shuffled.grouped(math.max(shuffled.length / 3, 1)).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
      mem.addData(EventsStreaming.DocArrival(999999999L, "zzz sentinel",
        new java.sql.Timestamp(base.getTime + 48L * 3600 * 1000)))
      q.processAllAvailable()
      val got = spark.table("simhash_out")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      // arrival-order independence: the flushed buckets equal batch
      assert(got == batchRows,
        s"stream-batch: ${(got -- batchRows).take(5)}; " +
          s"batch-stream: ${(batchRows -- got).take(5)}")
      // near-identical planted copies surface within the hamming ball
      val flaggedPairs = got.filter(t => t._4 >= 100000L && t._3 == t._4 - 100000L)
      assert(flaggedPairs.size >= 15,
        s"only ${flaggedPairs.map(t => t._3).size} planted near-dup pairs found")
      // and they are genuine NEAR dups, not exact: some hamming > 0
      assert(flaggedPairs.exists(_._5 > 0))
    } finally q.stop()
  }

  test("streaming per-source quota equals the batch operator under a SHUFFLED replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def tsOf(id: Long): java.sql.Timestamp =
      new java.sql.Timestamp(base.getTime + (id % 2) * 3600L * 1000)
    val rows = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"source", $"n_chars").collect()
      .map(r => EventsStreaming.ScoredArrival(r.getLong(0), r.getString(1),
        r.getLong(2), tsOf(r.getLong(0))))

    // batch reference: the SAME operator on a static frame
    val batchRows = EventsStreaming
      .quotaTopK(spark.createDataFrame(rows.toSeq), "ts", "source",
        "doc_id", "n_chars", k = 10)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(batchRows.nonEmpty)

    // and the window slices equal the BATCH Quota operator row for row —
    // the twin claim, not just self-consistency
    for (w <- 0 to 1) {
      val slice = rows.filter(_.doc_id % 2 == w)
      val wStart = new java.sql.Timestamp(base.getTime + w * 3600L * 1000)
      val batchOp = graft.operators.Quota.keepTopKPerGroup(
          spark.createDataFrame(slice.toSeq), "source", "doc_id", "n_chars",
          k = 10)
        .collect().map(r => (wStart, r.getString(0), r.getLong(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(batchRows.filter(_._1 == wStart) == batchOp,
        s"window $w diverges from the batch Quota operator")
    }

    val shuffled = rows.sortBy(d => (d.doc_id * 2654435761L) % 1000003)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.ScoredArrival]
    val q = EventsStreaming.quotaTopK(mem.toDF(), "ts", "source",
        "doc_id", "n_chars", k = 10)
      .writeStream.outputMode("append")
      .format("memory").queryName("quota_out").start()
    try {
      shuffled.grouped(math.max(shuffled.length / 3, 1)).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
      mem.addData(EventsStreaming.ScoredArrival(999999999L, "zz", 1L,
        new java.sql.Timestamp(base.getTime + 48L * 3600 * 1000)))
      q.processAllAvailable()
      val got = spark.table("quota_out")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getDouble(4))).toSet
      assert(got == batchRows,
        s"stream-batch: ${(got -- batchRows).take(5)}; " +
          s"batch-stream: ${(batchRows -- got).take(5)}")
    } finally q.stop()
  }

  test("streaming CDC fold equals the batch latest-wins under a SHUFFLED replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the p13 feed shape, derived from events
    val feed = Tables.load(spark, dir, "events")
      .select(($"user_id" * 12 + 1).as("k"),
        when($"event_type" === "signup", "I")
          .when($"event_type" === "error", "D").otherwise("U").as("op"),
        $"ts", $"event_id".as("seq"), $"value".as("v"))
      .as[EventsStreaming.CdcChange]
    val rows = feed.collect()

    // deterministic shuffle: order-independence is the operator's claim,
    // so replay the feed WAY out of order across three micro-batches
    val shuffled = rows.sortBy(c => (c.seq * 2654435761L) % 1000003)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.CdcChange]
    val q = EventsStreaming.cdcFold(spark, mem.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("cdc_out").start()
    try {
      shuffled.grouped(math.max(shuffled.length / 3, 1)).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
      // final emission per key = the row with the newest (ts_ms, seq)
      val got = spark.table("cdc_out")
        .as[EventsStreaming.CdcCurrent].collect()
        .groupBy(_.k).view.mapValues(_.maxBy(c => (c.ts_ms, c.seq)))
        .mapValues(c => (c.present, c.v)).toMap

      // driver-side latest-wins reference (the batch fold's rule)
      val want = rows.groupBy(_.k).view.mapValues { cs =>
        val last = cs.maxBy(c => (c.ts.getTime, c.seq))
        (last.op != "D", last.v)
      }.toMap
      assert(got == want)
      // sanity: the feed genuinely exercises deletes and live rows
      assert(want.values.exists(!_._1) && want.values.exists(_._1))
    } finally q.stop()
  }

  test("streaming funnel equals batch under a SHUFFLED replay, including " +
      "late-arriving earlier signups that re-gate pruned views") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    var eid = 0L
    def ev(u: Long, tpe: String, sec: Long): EventsStreaming.Event = {
      eid += 1
      EventsStreaming.Event(eid, new java.sql.Timestamp(base + sec * 1000),
        u, tpe, 1.0)
    }
    // u1 in order; u2's signup arrives LAST with the earliest time;
    // u3 exercises the exact prune (views 80/90 arrive under signup@60,
    // then signup@40 + view@45 re-gate; purchase@44 is inadmissible);
    // u4 never signs up -> no row
    val arrivalOrder = Seq(
      ev(1, "signup", 1000), ev(1, "view", 2000), ev(1, "purchase", 3000),
      ev(2, "view", 100), ev(2, "purchase", 150),
      ev(3, "signup", 60), ev(3, "view", 80), ev(3, "view", 90),
      ev(3, "purchase", 44), ev(3, "purchase", 200),
      ev(4, "view", 10), ev(4, "purchase", 20),
      ev(3, "signup", 40), ev(3, "view", 45),
      ev(2, "signup", 50))

    // batch twin on the same rows (order-independent: no sort applied)
    val batchRows = EventsStreaming
      .funnel(spark, spark.createDataset(arrivalOrder))
      .collect().map(r => (r.user_id, r.t_signup, r.t_view, r.t_purchase))
      .toSet
    def us(sec: Long) = Some((base + sec * 1000) * 1000L)
    assert(batchRows == Set(
      (1L, us(1000), us(2000), us(3000)),
      (2L, us(50), us(100), us(150)),
      (3L, us(40), us(45), us(200))))

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.Event]
    val q = EventsStreaming.funnel(spark, mem.toDS(), watermark = "24 hours")
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    try {
      // replay in arrival order across four micro-batches (the late
      // signups land in the final batch), then a far-future sentinel
      // advances the watermark past every user's quiet period
      arrivalOrder.grouped(4).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      mem.addData(EventsStreaming.Event(999L,
        new java.sql.Timestamp(base + 96L * 3600 * 1000), 999L, "signup", 1.0))
      q.processAllAvailable()
      val got = spark.table("funnel_out")
        .as[EventsStreaming.FunnelRow]
        .collect().map(r => (r.user_id, r.t_signup, r.t_view, r.t_purchase))
        .toSet
      assert(got == batchRows,
        s"stream-batch: ${got -- batchRows}; batch-stream: ${batchRows -- got}")
    } finally q.stop()
  }

  test("stream-static enrichment: broadcast dim join over micro-batches " +
      "equals the batch join; left_outer keeps unmatched events") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dim = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("user_id", "seg")
    def ev(id: Long, u: Long): EventsStreaming.Event =
      EventsStreaming.Event(id,
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), u, "view", 1.0)
    val all = Seq(ev(10, 1), ev(11, 2), ev(12, 3), ev(13, 2), ev(14, 3))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.Event]
    val q = EventsStreaming.enrich(mem.toDF(), dim, "user_id", "left_outer")
      .select($"event_id", $"seg")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      all.grouped(2).foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      val got = spark.table("enrich_out")
        .as[(Long, Option[String])].collect().toSet
      val want = EventsStreaming
        .enrich(spark.createDataset(all).toDF(), dim, "user_id", "left_outer")
        .select($"event_id", $"seg")
        .as[(Long, Option[String])].collect().toSet
      assert(got == want)
      // unmatched users flow with null segment; matched ones enrich
      assert(got.contains((12L, None)) && got.contains((10L, Some("BUILDING"))))
    } finally q.stop()
  }

  test("stream-stream interval join equals the p21 grid range join under " +
      "a SHUFFLED replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    var eid = 0L
    def ev(u: Long, tpe: String, minute: Long): EventsStreaming.Event = {
      eid += 1
      EventsStreaming.Event(eid, new java.sql.Timestamp(base + minute * 60000),
        u, tpe, 1.0)
    }
    val rnd = new scala.util.Random(5)
    val all = (1L to 6L).flatMap { u =>
      (1 to 12).map { _ =>
        ev(u, if (rnd.nextBoolean()) "view" else "purchase",
          rnd.nextInt(300).toLong)
      }
    }
    // batch reference: the SAME operator on static frames (inner join on
    // complete inputs — the stream twin must reach the identical pair set)
    def split(rows: Seq[EventsStreaming.Event]) = {
      val df = spark.createDataset(rows).toDF()
      (df.filter($"event_type" === "view"),
        df.filter($"event_type" === "purchase"))
    }
    val (bv, bp) = split(all)
    val want = EventsStreaming.touchPairs(bv, bp, window_ = "1 hour")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)

    val memV = { implicit val sq = spark.sqlContext
      MemoryStream[EventsStreaming.Event] }
    val memP = { implicit val sq = spark.sqlContext
      MemoryStream[EventsStreaming.Event] }
    val q = EventsStreaming.touchPairs(memV.toDF(), memP.toDF(),
        window_ = "1 hour", watermark = "10 hours")
      .writeStream.outputMode("append")
      .format("memory").queryName("touch_out").start()
    try {
      val shuffled = rnd.shuffle(all)
      shuffled.grouped(18).foreach { b =>
        val (vs, ps) = b.partition(_.event_type == "view")
        if (vs.nonEmpty) memV.addData(vs: _*)
        if (ps.nonEmpty) memP.addData(ps: _*)
        q.processAllAvailable()
      }
      // advance BOTH watermarks so every in-window pair flushes
      val late = new java.sql.Timestamp(base + 48L * 3600 * 1000)
      memV.addData(EventsStreaming.Event(9998L, late, 99L, "view", 1.0))
      memP.addData(EventsStreaming.Event(9999L, late, 99L, "purchase", 1.0))
      q.processAllAvailable()
      val got = spark.table("touch_out")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
        .filter(_._1 != 99L) // drop the sentinel's self-pair
      assert(got == want,
        s"stream-batch: ${(got -- want).take(5)}; " +
          s"batch-stream: ${(want -- got).take(5)}")
    } finally q.stop()
  }

  test("batch funnel operator equals the p07 query on the events fixture") {
    import spark.implicits._
    val events = Tables.load(spark, dir, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[EventsStreaming.Event]
    val got = EventsStreaming.funnel(spark, events)
      .collect()
      .map(r => (r.user_id, r.t_signup.get, r.t_view, r.t_purchase)).toSet
    val want = SparkEntry.queries("p07_funnel")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming scene cuts equal batch under a SHUFFLED replay") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    // two videos, 24 frames each, underlying image changes every 3
    // frames — a deterministic integer mix stands in for the aHash
    // (consecutive-scene hamming >= 14 here; within-scene 0)
    def hash(v: Long, scene: Long): Long = (v * 1000003L + scene) * 2654435761L
    val frames = for (v <- Seq(1L, 2L); i <- 0L until 24L) yield
      EventsStreaming.Frame(v, i, hash(v, i / 3),
        new java.sql.Timestamp(base + i * 1000))
    val batchRows = EventsStreaming
      .sceneCuts(spark, spark.createDataset(frames), threshold = 8)
      .collect().map(c => (c.video_id, c.frame_idx, c.hamming, c.is_cut))
      .toSet
    assert(batchRows.size == 2 * 23)
    assert(batchRows.forall { case (_, idx, ham, cut) =>
      if (idx % 3 == 0) cut && ham >= 8 else !cut && ham == 0 })

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.Frame]
    val q = EventsStreaming.sceneCuts(spark, mem.toDS(), threshold = 8,
        watermark = "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("scene_out").start()
    try {
      // deterministic shuffle: frames interleave across videos and
      // arrive far from presentation order, in 7-frame micro-batches
      val shuffled = frames.sortBy(f =>
        ((f.frame_idx * 7 + f.video_id * 3) % 13, f.video_id, f.frame_idx))
      shuffled.grouped(7).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      // far-future sentinel advances the watermark past every frame;
      // its own single frame has no predecessor and emits nothing
      mem.addData(EventsStreaming.Frame(999L, 0L, 0L,
        new java.sql.Timestamp(base + 96L * 3600 * 1000)))
      q.processAllAvailable()
      val got = spark.table("scene_out")
        .as[EventsStreaming.SceneCut]
        .collect().map(c => (c.video_id, c.frame_idx, c.hamming, c.is_cut))
        .toSet
      assert(got == batchRows,
        s"stream-batch: ${got -- batchRows}; batch-stream: ${batchRows -- got}")
    } finally q.stop()
  }

  test("streaming decontamination gate equals the batch d06 complement") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    val evalDocs = docs.filter($"doc_id" < 20)
    val train = docs.filter($"doc_id" >= 20).unionByName(
      graft.operators.Dedup.withPlantedDups(evalDocs, "doc_id", "text",
        nPlant = 20, idOffset = 100000L, dropWords = 5)
        .filter($"doc_id" >= 100000L))
    val evalGrams = evalDocs
      .select(explode(graft.operators.Dedup.shingles($"text", 8)).as("g"))
      .distinct().as[String].collect().toSeq
    val contaminated = graft.operators.Dedup
      .contaminatedDocs(train, evalDocs, "doc_id", "text", n = 8)
      .as[Long].collect().toSet
    val expectClean = train.select($"doc_id").as[Long].collect().toSet --
      contaminated
    assert(contaminated.nonEmpty && expectClean.nonEmpty)

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = EventsStreaming.decontaminate(
        mem.toDF().toDF("doc_id", "text"), "text", evalGrams, n = 8)
      .writeStream.outputMode("append")
      .format("memory").queryName("decon_out").start()
    try {
      train.as[(Long, String)].collect().grouped(40).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
      val got = spark.table("decon_out")
        .select($"doc_id").as[Long].collect().toSet
      assert(got == expectClean,
        s"extra: ${got -- expectClean}; missing: ${expectClean -- got}")
    } finally q.stop()
  }

  test("streaming IVF ingest appends into the served list_id layout: " +
      "stream==batch assignment, probes over the mixed directory still " +
      "prune and match the in-memory index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Similarity
    val embs = Tables.load(spark, dir, "embeddings")
    val corpus = embs.filter($"vec_id" =!= 0)
    val centroids = Similarity.seededCentroids(
      corpus, "vec_id", "embedding", nlist = 16)
    val root = java.nio.file.Files.createTempDirectory("ivf-ingest").toString
    // half the corpus staged in batch (the s19 ingest step) ...
    EventsStreaming.ivfAssign(
        corpus.filter($"vec_id" % 2 === 1).select($"vec_id", $"embedding"),
        centroids)
      .write.mode("append").partitionBy("list_id").parquet(root)
    // ... the other half arrives as a stream, appended micro-batch by
    // micro-batch into the SAME layout via foreachBatch (the production
    // continuous-ingest pattern; at-least-once — idempotent ids)
    val arrivals = corpus.filter($"vec_id" % 2 === 0)
      .select($"vec_id", $"embedding")
      .as[EventsStreaming.VecArrival].collect()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.VecArrival]
    val q = EventsStreaming.ivfAssign(mem.toDF(), centroids)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").partitionBy("list_id").parquet(root)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("ivf-chk").toString)
      .start()
    try {
      arrivals.grouped(math.max(arrivals.length / 3, 1)).foreach { b =>
        mem.addData(b.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // 1. the directory holds the full corpus with batch-identical lists
    val dirDf = spark.read.parquet(root)
    val gotAssign = dirDf.select($"vec_id", $"list_id".cast("long"))
      .as[(Long, Long)].collect().toMap
    val wantAssign = EventsStreaming.ivfAssign(
        corpus.select($"vec_id", $"embedding"), centroids)
      .select($"vec_id", $"list_id".cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(gotAssign == wantAssign)
    // 2. a probe over the mixed directory equals the in-memory index and
    //    reads only its nprobe list directories
    val qv = embs.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0)
    val probed = Similarity.seededProbeLists(spark, centroids, qv, nprobe = 4)
    val qCol = array(qv.map(v => lit(v)): _*)
    val servedDf = dirDf.filter($"list_id".isin(probed: _*))
      .select($"vec_id",
        graft.functions.VectorFunctions.cosine($"embedding", qCol).as("cos"))
      .orderBy($"cos".desc, $"vec_id").limit(20)
    val served = servedDf.as[(Long, Double)].collect().toSeq
    val mem20 = Similarity.ivfSeededTopK(corpus, "vec_id", "embedding",
      qv, k = 20, nlist = 16, nprobe = 4).as[(Long, Double)].collect().toSeq
    assert(served == mem20)
    val scan = servedDf.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.selectedPartitions.partitionCount <= 4,
      s"probe read ${scan.selectedPartitions.partitionCount} list dirs")
  }
  test("streaming merge-publish twin: micro-batch upserts fold into the " +
      "partitioned manifest atomically per batch, stream == batch merge, " +
      "untouched partitions keep their seed version") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.engine.{ManifestTable, PartitionedManifest}
    val root = java.nio.file.Files.createTempDirectory("merge-twin").toString
    // seed: 40 keys across 4 partitions
    val seedRows = (0L until 40L).map(k => Upsert(k, s"base$k", (k % 4).toInt))
    PartitionedManifest.seed(spark, root, seedRows.toDF(), "bk")
    PartitionedManifest.commitSnapshot(spark, root, "bk", Map.empty)
    // upserts: updates to bk 0/1 keys plus brand-new keys in bk 1 -
    // partitions 2 and 3 are never touched
    val ups = Seq(
      Seq(Upsert(0, "upd0", 0), Upsert(5, "upd5", 1)),
      Seq(Upsert(8, "upd8", 0), Upsert(100, "new100", 1)),
      Seq(Upsert(0, "upd0b", 0), Upsert(101, "new101", 1)))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Upsert]
    val q = mem.toDF().writeStream
      .foreachBatch(EventsStreaming.mergePublishBatch(
        spark, root, "bk", "k") _)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("merge-chk").toString)
      .start()
    try ups.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    finally q.stop()
    // stream result == the batch merge of all upserts (last write wins
    // across batches - batch 3 re-upserts k=0)
    val got = PartitionedManifest.readSnapshot(spark, root, "bk", "int")
      .select($"k", $"payload").as[(Long, String)].collect().toMap
    val want = seedRows.map(u => u.k -> u.payload).toMap ++
      ups.flatten.map(u => u.k -> u.payload).toMap
    assert(got == want)
    // untouched partitions were never republished
    for (bk <- Seq(2, 3))
      assert(ManifestTable.currentVersion(s"$root/bk=$bk")
        .get.startsWith("v000001"), s"bk=$bk was rewritten")
    // each micro-batch was ONE snapshot commit (seed commit + horizon:
    // only the last two survive GC, but generation numbers prove count)
    val lastSnap = PartitionedManifest.snapshots(spark, root).last
    assert(lastSnap.startsWith("s000004"), lastSnap) // 1 seed + 3 batches
  }


  test("streaming encode-ingest twin: docs arriving on a stream are " +
      "encoded with the frozen tokenizer and append into the t22 " +
      "layout; stream == batch arrays over the mixed directory") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").filter($"doc_id" < 60)
    val merges = TextAnalysis.bpeLearnMerges(docs, "text", iters = 4)
    // the tokenizer artifact is merges AND the pinned id vocabulary -
    // both derive from the ingest-time reference corpus and freeze
    val vocab = TextAnalysis.bpeVocabIds(docs, "text", merges)
      .localCheckpoint()
    val out = java.nio.file.Files.createTempDirectory("enc-twin").toString
    // half the corpus encoded in batch (the t22 ingest step) ...
    TextAnalysis.bpeEncodeIdsWithVocab(
        docs.filter($"doc_id" % 2 === 1), "doc_id", "text", merges, vocab)
      .write.mode("append").parquet(out)
    // ... the other half arrives as a stream
    val arrivals = docs.filter($"doc_id" % 2 === 0)
      .withColumn("ts", org.apache.spark.sql.functions.current_timestamp())
      .as[EventsStreaming.DocArrival].collect()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.DocArrival]
    val q = mem.toDF().select($"doc_id", $"text").writeStream
      .foreachBatch(EventsStreaming.encodeIdsBatch(
        spark, out, merges, vocab) _)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("enc-chk").toString)
      .start()
    try arrivals.grouped(math.max(arrivals.length / 3, 1)).foreach { b =>
      mem.addData(b.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val mixed = spark.read.option("recursiveFileLookup", "true")
      .parquet(out)
    val rows = mixed.as[(Long, Seq[Long])].collect()
    val got = rows.toMap
    assert(rows.length == got.size,
      "duplicate doc_ids in the staged layout (lost idempotency)")
    val want = TextAnalysis.bpeEncodeIds(docs, "doc_id", "text", merges)
      .as[(Long, Seq[Long])].collect().toMap
    // the frozen vocab came from the SAME reference corpus, so the
    // self-derived batch encode and the frozen-vocab encode agree
    assert(got == want, "mixed batch+streamed encodings must equal batch")
    // at-least-once REPLAY: re-running a micro-batch id with the same
    // rows must rewrite its directory, not append duplicates
    val replayRows = docs.filter($"doc_id" % 2 === 0).limit(5)
    EventsStreaming.encodeIdsBatch(spark, out, merges, vocab)(
      replayRows.toDF(), 99L)
    val once = spark.read.option("recursiveFileLookup", "true")
      .parquet(out).count()
    EventsStreaming.encodeIdsBatch(spark, out, merges, vocab)(
      replayRows.toDF(), 99L)
    val twice = spark.read.option("recursiveFileLookup", "true")
      .parquet(out).count()
    assert(once == twice,
      s"replayed batch appended duplicates: $once -> $twice")
  }

  test("streaming LM-filter twin: docs scored on a stream against the " +
      "frozen staged model == batch serving, and replay is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val corpus = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    TextAnalysis.ensureBigramLmStaged(spark, dir, corpus, "doc_id", "text")
    // the served set includes never-seen text - the left-join smoothing
    // must hold on the stream path too
    val served = corpus.filter($"doc_id" < 40).unionByName(
      Seq((900001L, "spark zzzq table qqqz join the"),
        (900002L, "zzzq qqqz zzzq")).toDF("doc_id", "text"))
    val out = java.nio.file.Files.createTempDirectory("lm-twin").toString
    val arrivals = served
      .withColumn("ts", org.apache.spark.sql.functions.current_timestamp())
      .as[EventsStreaming.DocArrival].collect()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.DocArrival]
    val q = mem.toDF().select($"doc_id", $"text").writeStream
      .foreachBatch(EventsStreaming.lmScoreBatch(spark, out, dir) _)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("lm-chk").toString)
      .start()
    try arrivals.grouped(math.max(arrivals.length / 3, 1)).foreach { b =>
      mem.addData(b.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.option("recursiveFileLookup", "true").parquet(out)
      .select($"doc_id", $"mean_nll_micros", $"bucket")
      .as[(Long, Long, String)].collect().sorted.toSeq
    val want = TextAnalysis.bigramLmBucketsFromArtifact(
        spark, served, "doc_id", "text", dir)
      .select($"doc_id", $"mean_nll_micros", $"bucket")
      .as[(Long, Long, String)].collect().sorted.toSeq
    assert(got == want, "streamed scores must equal batch serving")
    // replayed micro-batch rewrites its directory, never duplicates
    val replay = served.limit(5).toDF()
    EventsStreaming.lmScoreBatch(spark, out, dir)(replay, 99L)
    val once = spark.read.option("recursiveFileLookup", "true")
      .parquet(out).count()
    EventsStreaming.lmScoreBatch(spark, out, dir)(replay, 99L)
    val twice = spark.read.option("recursiveFileLookup", "true")
      .parquet(out).count()
    assert(once == twice,
      s"replayed batch appended duplicates: $once -> $twice")
  }

  test("streaming curriculum twin (p29): micro-batches arriving after " +
      "the cut-points froze get their stage with NO global rank, and " +
      "sorting the accumulated assignments reproduces the batch " +
      "curriculum's positions exactly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val seed = "cur-v1"
    val corpus = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text")
    TextAnalysis.ensureBigramLmStaged(spark, dir, corpus, "doc_id", "text")
    // late arrivals include never-seen text — assignable without
    // touching the frozen artifact's training corpus again
    val served = corpus.filter($"doc_id" < 40).unionByName(
      Seq((900001L, "spark zzzq table qqqz join the"),
        (900002L, "zzzq qqqz zzzq")).toDF("doc_id", "text"))
    val out = java.nio.file.Files.createTempDirectory("cur-twin").toString
    val arrivals = served
      .withColumn("ts", org.apache.spark.sql.functions.current_timestamp())
      .as[EventsStreaming.DocArrival].collect()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[EventsStreaming.DocArrival]
    val q = mem.toDF().select($"doc_id", $"text").writeStream
      .foreachBatch(
        EventsStreaming.curriculumAssignBatch(spark, out, dir, seed) _)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("cur-chk").toString)
      .start()
    try arrivals.grouped(math.max(arrivals.length / 3, 1)).foreach { b =>
      mem.addData(b.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    // the accumulated stream assignments, ordered by (stage, k, id),
    // ARE the batch curriculum: positions match row for row
    val accumulated = spark.read
      .option("recursiveFileLookup", "true").parquet(out)
      .select($"doc_id", $"bucket", $"stage", $"k")
      .as[(Long, String, Int, String)].collect()
      .sortBy(t => (t._3, t._4, t._1))
      .zipWithIndex.map { case ((id, b, _, _), i) => (id, b, i.toLong) }
      .toSeq
    val want = TextAnalysis.curriculumFromArtifact(
        spark, served, "doc_id", "text", dir, seed)
      .select($"doc_id", $"bucket", $"pos")
      .as[(Long, String, Long)].collect().sortBy(_._3).toSeq
    assert(accumulated == want,
      s"stream-accumulated curriculum diverged from batch " +
        s"(${accumulated.take(3)}… vs ${want.take(3)}…)")
    // no late-arrival rescans: the stage decision never needed a rank —
    // a SINGLE-doc batch gets the same stage the full batch gives it
    val lone = Seq((900002L, "zzzq qqqz zzzq")).toDF("doc_id", "text")
    val loneStage = TextAnalysis.curriculumAssignFromArtifact(
        spark, lone, "doc_id", "text", dir, seed)
      .select($"stage").as[Int].head()
    assert(loneStage ==
      accumulated.collectFirst { case (900002L, b, _) =>
        Seq("head", "middle", "tail").indexOf(b) }.get,
      "a lone late micro-batch must assign the same stage")
    // replayed micro-batch rewrites its directory, never duplicates
    EventsStreaming.curriculumAssignBatch(spark, out, dir, seed)(
      served.limit(4).toDF(), 99L)
    val once = spark.read.option("recursiveFileLookup", "true")
      .parquet(out).count()
    EventsStreaming.curriculumAssignBatch(spark, out, dir, seed)(
      served.limit(4).toDF(), 99L)
    val twice = spark.read.option("recursiveFileLookup", "true")
      .parquet(out).count()
    assert(once == twice,
      s"replayed batch appended duplicates: $once -> $twice")
  }

  test("graft-cdc source follows a BRANCH ref: the audit stream sees " +
      "staged commits main readers cannot, and a published (fast-" +
      "forwarded) branch leaves the stream caught up") {
    import spark.implicits._
    import graft.engine.PartitionedManifest
    val root = java.nio.file.Files.createTempDirectory("graft-cdcbr")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcbr-ck")
      .toString
    val rows = (0 until 2).flatMap(b => (1 to 5).map(i =>
      ((b * 100 + i).toLong, b)))
    PartitionedManifest.seed(spark, root, rows.toDF("i", "bk"), "bk")
    PartitionedManifest.commitSnapshot(spark, root, "bk", Map.empty,
      keepSnapshots = 4)
    PartitionedManifest.createBranch(spark, root, "audit")
    val got = scala.collection.mutable.Buffer.empty[(Long, Int, String)]
    val q = spark.readStream.format("graft-cdc")
      .option("root", root).option("partCol", "bk")
      .option("partType", "int").option("ref", "audit").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.collect().map(r => (r.getLong(0), r.getInt(1),
          r.getString(2)))
        ()
      }.start()
    try {
      q.processAllAvailable() // bootstrap at the branch head (= fork)
      assert(got.size == 10 && got.forall(_._3 == "insert"))
      got.clear()
      // a STAGED branch commit: invisible to main, streamed to the
      // audit follower
      PartitionedManifest.commitSnapshotToBranch(spark, root, "bk",
        Map("1" -> Seq(900L, 901L).toDF("i")), "audit",
        keepSnapshots = 4)
      q.processAllAvailable()
      assert(PartitionedManifest.read(spark, root, "bk", "int")
        .filter($"i" >= 900).count() == 0, "staged data leaked to main")
      assert(got.count(_._3 == "insert") == 2 &&
        got.count(_._3 == "delete") == 5, got.toSeq.sortBy(_._1))
      got.clear()
      // publish: the branch head becomes main; the follower is already
      // AT the head, so nothing re-emits
      PartitionedManifest.fastForward(spark, root, "bk", "audit")
      q.processAllAvailable()
      assert(got.isEmpty, s"published branch must not re-emit: $got")
    } finally q.stop()
  }

  test("graft-table streaming sink: each micro-batch folds in as ONE " +
      "atomic key-merged snapshot commit, replayed batchIds are " +
      "skipped, and the CDC source's diff of the commit matches the " +
      "batch") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.engine.PartitionedManifest
    val root = java.nio.file.Files.createTempDirectory("graft-tsink")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tsink-ck")
      .toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Upsert]
    val q = mem.toDF().writeStream.format("graft-table")
      .option("root", root).option("partCol", "bk").option("keyCol", "k")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      mem.addData(Upsert(1, "a", 0), Upsert(2, "b", 0), Upsert(3, "c", 1))
      q.processAllAvailable()
      val t1 = PartitionedManifest.read(spark, root, "bk", "int")
      assert(t1.count() == 3)
      val s1 = PartitionedManifest.currentSnapshot(spark, root).get
      // batch 2: update k=2, insert k=4 — one commit, key-merged
      mem.addData(Upsert(2, "B", 0), Upsert(4, "d", 1))
      q.processAllAvailable()
      val got = PartitionedManifest.read(spark, root, "bk", "int")
        .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, "a", 0), (2L, "B", 0), (3L, "c", 1),
        (4L, "d", 1)), got)
      val snaps = PartitionedManifest.snapshots(spark, root)
      assert(snaps.length == 2, s"one commit per batch: $snaps")
      // the CDC source's contract composes: the commit's diff IS the
      // batch's row-level effect
      val s2 = PartitionedManifest.currentSnapshot(spark, root).get
      val ch = PartitionedManifest.changesBetween(spark, root, "bk",
        "int", s1, s2).as[(Long, String, Int, String)]
        .collect().sortBy(r => (r._4, r._1)).toSeq
      assert(ch == Seq((2L, "b", 0, "delete"), (2L, "B", 0, "insert"),
        (4L, "d", 1, "insert")), ch)
    } finally q.stop()
    // exactly-once: a REPLAYED batchId is skipped, not re-merged — no
    // new snapshot, identical content
    val sink = new graft.streaming.TableSinkProvider().createSink(
      spark.sqlContext, Map("root" -> root, "partCol" -> "bk",
        "keyCol" -> "k"), Nil,
      org.apache.spark.sql.streaming.OutputMode.Update())
    val before = PartitionedManifest.snapshots(spark, root)
    sink.addBatch(1, Seq(Upsert(2, "XXX", 0)).toDF())
    assert(PartitionedManifest.snapshots(spark, root) == before,
      "replayed batchId must be a no-op")
    assert(PartitionedManifest.read(spark, root, "bk", "int")
      .filter($"payload" === "XXX").count() == 0)
    // a NEW batchId commits
    sink.addBatch(2, Seq(Upsert(2, "Z", 0)).toDF())
    assert(PartitionedManifest.read(spark, root, "bk", "int")
      .filter($"payload" === "Z").count() == 1)
  }

  test("graft-table sink in mergeOnRead mode: partition-creating " +
      "batches fall back to full commits, steady-state batches land as " +
      "delta-only MOR layers, and readers + CDC resolve them") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.hadoop.fs.{Path => HPath}
    import graft.engine.{ManifestTable, PartitionedManifest}
    val root = java.nio.file.Files.createTempDirectory("graft-tsink-mor")
      .toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-tsink-mor-ck").toString
    val fs = new HPath(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def liveIsMor(v: Int) = fs.exists(new HPath(
      ManifestTable.currentDataDir(s"$root/bk=$v").get, "_mor.tsv"))
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Upsert]
    val q = mem.toDF().writeStream.format("graft-table")
      .option("root", root).option("partCol", "bk").option("keyCol", "k")
      .option("mergeOnRead", "true")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      // batch 0 creates both partitions: full-commit fallback
      mem.addData(Upsert(1, "a", 0), Upsert(2, "b", 0), Upsert(3, "c", 1))
      q.processAllAvailable()
      assert(!liveIsMor(0) && !liveIsMor(1),
        "partition-creating batch must land as a full commit")
      val s1 = PartitionedManifest.currentSnapshot(spark, root).get
      // batch 1 touches existing partitions only: ONE MOR commit
      mem.addData(Upsert(2, "B", 0), Upsert(4, "d", 1))
      q.processAllAvailable()
      assert(liveIsMor(0) && liveIsMor(1),
        "steady-state batch must layer delta-only MOR dirs")
      val got = PartitionedManifest.read(spark, root, "bk", "int")
        .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
      assert(got == Seq((1L, "a", 0), (2L, "B", 0), (3L, "c", 1),
        (4L, "d", 1)), got)
      val s2 = PartitionedManifest.currentSnapshot(spark, root).get
      val ch = PartitionedManifest.changesBetween(spark, root, "bk",
        "int", s1, s2).as[(Long, String, Int, String)]
        .collect().sortBy(r => (r._4, r._1)).toSeq
      assert(ch == Seq((2L, "b", 0, "delete"), (2L, "B", 0, "insert"),
        (4L, "d", 1, "insert")), ch)
    } finally q.stop()
  }

  test("graft-cdc streaming source: the first batch bootstraps the " +
      "table as inserts, each snapshot commit arrives as its row-level " +
      "diff, and a checkpoint restart replays exactly the unprocessed " +
      "generations") {
    import spark.implicits._
    import graft.engine.PartitionedManifest
    val root = java.nio.file.Files.createTempDirectory("graft-cdcsrc")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcsrc-ck")
      .toString
    val rows = (0 until 2).flatMap(b => (1 to 10).map(i =>
      ((b * 100 + i).toLong, b)))
    PartitionedManifest.seed(spark, root, rows.toDF("i", "bk"), "bk")
    PartitionedManifest.commitSnapshot(spark, root, "bk", Map.empty,
      keepSnapshots = 4)
    val got = scala.collection.mutable.Buffer.empty[(Long, Long, Int, String)]
    def start() = spark.readStream.format("graft-cdc")
      .option("root", root).option("partCol", "bk")
      .option("partType", "int").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        got ++= df.collect().map(r => (id, r.getLong(0), r.getInt(1),
          r.getString(2)))
        ()
      }.start()
    val q = start()
    try {
      q.processAllAvailable()
      // bootstrap: the whole table as inserts, one batch
      assert(got.size == 20 && got.forall(_._4 == "insert"), got.size)
      val b0 = got.map(_._1).distinct
      assert(b0.size == 1, s"bootstrap must be ONE batch: $b0")
      got.clear()
      // commit 2: replace bk=1 (update i+=1000 for evens, one delete)
      val p1 = (101 to 110).filter(_ != 105)
        .map(i => if (i % 2 == 0) (i + 1000).toLong else i.toLong).toDF("i")
      PartitionedManifest.commitSnapshot(spark, root, "bk",
        Map("1" -> p1), keepSnapshots = 4)
      q.processAllAvailable()
      val dels = got.filter(_._4 == "delete").map(_._2).sorted
      val ins = got.filter(_._4 == "insert").map(_._2).sorted
      assert(dels == Seq(102L, 104L, 105L, 106L, 108L, 110L), dels)
      assert(ins == Seq(1102L, 1104L, 1106L, 1108L, 1110L), ins)
      assert(got.forall(_._3 == 1), "only the changed partition's rows")
    } finally q.stop()
    // a commit lands while the stream is DOWN; the checkpoint restart
    // replays exactly that generation's diff, nothing else
    got.clear()
    PartitionedManifest.commitSnapshot(spark, root, "bk",
      Map("0" -> (1 to 5).map(_.toLong).toDF("i")), keepSnapshots = 4)
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(got.nonEmpty && got.forall(_._3 == 0),
        s"restart must replay only the offline commit's diff: $got")
      assert(got.filter(_._4 == "delete").map(_._2).sorted ==
        (6 to 10).map(_.toLong), got.filter(_._4 == "delete"))
      // caught up: nothing more arrives
      val n = got.size
      q2.processAllAvailable()
      assert(got.size == n, "caught-up stream must not re-emit")
    } finally q2.stop()
  }

  test("graft-cdc source over a SPEC table: bootstrap carries the " +
      "composite partition fields, per-commit diffs are the spec " +
      "changesBetween rows, and a merge-on-read commit streams its " +
      "logical effect") {
    import spark.implicits._
    import graft.engine.SpecManifest
    import graft.engine.SpecManifest.{Bucket, Identity, PartField, PartitionSpec}
    val root = java.nio.file.Files.createTempDirectory("graft-cdcspec")
      .toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdcspec-ck")
      .toString
    val spec = PartitionSpec(Seq(
      PartField("g", "grp", Identity),
      PartField("b", "k", Bucket(2))))
    val base = (0 until 20).map(i => (i.toLong, i * 1.0, s"g${i % 2}"))
      .toDF("k", "v", "grp")
    SpecManifest.seed(spark, root, base, spec)
    val got = scala.collection.mutable.Buffer
      .empty[(Long, Double, String, String)]
    val q = spark.readStream.format("graft-cdc")
      .option("root", root).option("spec", spec.renderCompact).load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.collect().map(r => (r.getLong(0), r.getDouble(1),
          r.getString(3), r.getString(5))) // k, v, g, _change_type
        ()
      }.start()
    try {
      q.processAllAvailable() // bootstrap: the whole table as inserts
      assert(got.size == 20 && got.forall(_._4 == "insert") &&
        got.count(_._3 == "g0") == 10, s"bootstrap wrong: ${got.size}")
      got.clear()
      // a MOR commit's stream effect is its LOGICAL row diff
      val leaf = SpecManifest.leafKeys(spark, root, spec).find { vs =>
        SpecManifest.readLeaf(spark, root, spec, vs)
          .filter($"k" === 0L).count() > 0
      }.get
      SpecManifest.commitMerge(spark, root, spec, Seq("k"),
        upserts = Map(leaf -> Seq((0L, -5.0, "g0")).toDF("k", "v", "grp")))
      q.processAllAvailable()
      assert(got.toSet == Set((0L, 0.0, "g0", "delete"),
        (0L, -5.0, "g0", "insert")),
        s"MOR commit diff wrong: ${got.toSeq.sorted}")
    } finally q.stop()
  }
}

/** Top-level: MemoryStream encoders need an outer-scope-free case class. */
final case class Upsert(k: Long, payload: String, bk: Int)

/** The streaming half of the SQL surface: `graft-spec-table` resolving
  * a CATALOG-NAMED table, so a stream lands in the same table SQL
  * sessions create, query and maintain. */
class GraftNamedSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  test("graft-spec-table sink resolves option(\"table\", \"g.db.t\") " +
      "through the session's GraftCatalog: micro-batches land " +
      "exactly-once as MOR deltas, and SQL reads serve them") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.hadoop.fs.{Path => HPath}
    val wh2 =
      java.nio.file.Files.createTempDirectory("graft-gstream").toString
    spark.conf.set("spark.sql.catalog.gstream", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gstream.warehouse", wh2)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gstream.db")
    spark.sql("""CREATE TABLE gstream.db.ev
      (k BIGINT, payload STRING, bk INT)
      PARTITIONED BY (identity(bk))""")
    // seed through SQL so every leaf exists (MOR steady state)
    spark.sql("""INSERT INTO gstream.db.ev VALUES
      (1, 'a', 0), (2, 'b', 0), (3, 'c', 1)""")
    val ckpt =
      java.nio.file.Files.createTempDirectory("graft-gstream-ck").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Upsert]
    val q = mem.toDF().writeStream.format("graft-spec-table")
      .option("table", "gstream.db.ev").option("keyCol", "k")
      .option("mergeOnRead", "true")
      .option("checkpointLocation", ckpt)
      .outputMode("update").start()
    try {
      mem.addData(Upsert(2, "B", 0), Upsert(4, "d", 1))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.sql(
      "SELECT k, payload FROM gstream.db.ev ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c"), (4L, "d")), got)
    // the steady-state batch layered a MOR delta — it did not rewrite
    val root = s"$wh2/db/ev"
    val fs = new HPath(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val live = graft.engine.ManifestTable
      .currentVersion(s"$root/p_bk=0").get
    assert(fs.exists(new HPath(s"$root/p_bk=0/$live/_mor.tsv")),
      "the named-sink batch must land merge-on-read")
    // exactly-once: a REPLAYED batchId through the same table name is
    // a no-op
    val sink = new graft.streaming.SpecTableSinkProvider().createSink(
      spark.sqlContext, Map("table" -> "gstream.db.ev",
        "keyCol" -> "k", "mergeOnRead" -> "true"), Nil,
      org.apache.spark.sql.streaming.OutputMode.Update())
    sink.addBatch(0, Seq(Upsert(2, "XXX", 0)).toDF())
    assert(spark.sql(
      "SELECT count(*) FROM gstream.db.ev WHERE payload = 'XXX'")
      .head().getLong(0) == 0, "replayed batchId must be a no-op")
    // a NEW batchId commits
    sink.addBatch(1, Seq(Upsert(5, "e", 1)).toDF())
    assert(spark.sql("SELECT payload FROM gstream.db.ev WHERE k = 5")
      .head().getString(0) == "e")
  }

  test("named sink keeps flowing across ALTER TABLE: a stale-shaped " +
      "leaf routes through the aligning copy-on-write branch instead " +
      "of wedging commitMerge, then MOR resumes") {
    import spark.implicits._
    import org.apache.hadoop.fs.{Path => HPath}
    val wh2 =
      java.nio.file.Files.createTempDirectory("graft-galter").toString
    spark.conf.set("spark.sql.catalog.galter", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.galter.warehouse", wh2)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS galter.db")
    spark.sql("""CREATE TABLE galter.db.ev
      (k BIGINT, payload STRING, bk INT)
      PARTITIONED BY (identity(bk))""")
    spark.sql("INSERT INTO galter.db.ev VALUES (1, 'a', 0), (2, 'b', 1)")
    val sink = new graft.streaming.SpecTableSinkProvider().createSink(
      spark.sqlContext, Map("table" -> "galter.db.ev",
        "keyCol" -> "k", "mergeOnRead" -> "true"), Nil,
      org.apache.spark.sql.streaming.OutputMode.Update())
    sink.addBatch(0, Seq(Upsert(2, "B", 1)).toDF())
    // schema evolves UNDER the running sink — pre-ALTER leaves keep
    // their stale file shape until something rewrites them
    spark.sql("ALTER TABLE galter.db.ev ADD COLUMN note STRING")
    // this batch touches BOTH leaves: the MOR fast path must step
    // aside (stale bottoms cannot take current-shaped deltas) and the
    // copy-on-write branch reshapes them while applying the upserts
    sink.addBatch(1,
      Seq(Upsert(1, "A", 0), Upsert(3, "c", 1)).toDF())
    val got = spark.sql("""SELECT k, payload, note FROM galter.db.ev
      ORDER BY k""").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) "NULL" else r.getString(2))).toSeq
    assert(got == Seq((1L, "A", "NULL"), (2L, "B", "NULL"),
      (3L, "c", "NULL")), s"stream across ALTER: $got")
    // leaves are now current-shaped: the NEXT batch is MOR again
    sink.addBatch(2, Seq(Upsert(3, "C", 1)).toDF())
    val root = s"$wh2/db/ev"
    val fs = new HPath(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val live = graft.engine.ManifestTable
      .currentVersion(s"$root/p_bk=1").get
    assert(fs.exists(new HPath(s"$root/p_bk=1/$live/_mor.tsv")),
      "post-reshape batches must resume merge-on-read")
    assert(spark.sql("SELECT payload FROM galter.db.ev WHERE k = 3")
      .head().getString(0) == "C")
  }

  test("graft-cdc source resolves option(\"table\", \"g.db.t\") " +
      "through the session's GraftCatalog (the sink's symmetric " +
      "half): bootstrap, SQL-DML commit diffs, restart replay") {
    val wh2 =
      java.nio.file.Files.createTempDirectory("graft-gcdc").toString
    spark.conf.set("spark.sql.catalog.gcdc", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gcdc.warehouse", wh2)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcdc.db")
    // retention must cover the stream's replay window: a restarting
    // stream re-reads its last committed generation range, so a table
    // that feeds CDC keeps more than the default 2 snapshots
    spark.sql("""CREATE TABLE gcdc.db.t (k BIGINT, v DOUBLE)
      PARTITIONED BY (bucket(2, k))
      TBLPROPERTIES ('graft.keep_snapshots' = '8')""")
    assert(spark.sql("SHOW TBLPROPERTIES gcdc.db.t").collect()
      .exists(r => r.getString(0) == "graft.keep_snapshots" &&
        r.getString(1) == "8"))
    spark.sql("INSERT INTO gcdc.db.t " +
      "SELECT id, CAST(id AS DOUBLE) FROM range(1, 11)")
    val ckpt =
      java.nio.file.Files.createTempDirectory("graft-gcdc-ck").toString
    val got = scala.collection.mutable.Buffer
      .empty[(Long, Double, String)]
    def start() = spark.readStream.format("graft-cdc")
      .option("table", "gcdc.db.t").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.collect().map(r =>
          (r.getLong(0), r.getDouble(1), r.getString(3)))
        ()
      }.start()
    val q = start()
    try {
      q.processAllAvailable()
      assert(got.size == 10 && got.forall(_._3 == "insert"),
        s"bootstrap must carry the whole table as inserts: ${got.size}")
      got.clear()
      // a SQL UPDATE commit arrives as its logical row diff
      spark.sql("UPDATE gcdc.db.t SET v = -1.0 WHERE k = 3")
      q.processAllAvailable()
      assert(got.toSet == Set((3L, 3.0, "delete"), (3L, -1.0, "insert")),
        s"UPDATE diff wrong: ${got.toSeq.sorted}")
    } finally q.stop()
    // a SQL DELETE lands while the stream is DOWN: the checkpoint
    // restart replays exactly that diff
    got.clear()
    spark.sql("DELETE FROM gcdc.db.t WHERE k = 5")
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(got.toSeq == Seq((5L, 5.0, "delete")),
        s"restart must replay only the offline DELETE: $got")
    } finally q2.stop()
  }
}
