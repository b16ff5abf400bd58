package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables
import graft.streaming.EventsStreaming

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
}
