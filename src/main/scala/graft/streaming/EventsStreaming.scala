package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming extension (the reference is batch-only —
  * SURVEY.md §2.2 "Streaming: none"; this is §7 step 8 beyond-parity).
  *
  * The `events` fixture drives three canonical shapes:
  *  - watermarked tumbling/sliding window aggregation,
  *  - stateful sessionization via flatMapGroupsWithState,
  *  - append-mode sink, exactly-once per micro-batch.
  *
  * Scale posture: state is keyed by (window, event_type) / user_id and
  * lives in the state store (RocksDB-backed on a real cluster); the
  * watermark bounds state size. No collect, no global sort.
  */
object EventsStreaming {

  /** Schema of the events fixture with ts at micros (see Tables.load). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked tumbling-window counts per event type. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"))

  /** Watermarked SLIDING-window counts (each event lands in
    * window/slide overlapping windows). */
  def slidingCounts(events: DataFrame, window_ : String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("event_type"), col("n"))

  /** Exactly-once-per-id ingest dedup — the streaming twin of d01:
    * duplicate event_ids arriving within the watermark horizon are
    * dropped, and an id's state is freed once the watermark passes it,
    * so state stays bounded by the horizon instead of growing with the
    * stream. */
  def dedupByKey(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class SessionAgg(user_id: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp)
  private final case class SessionState(n: Long, start: Long, last: Long)

  /** Stateful sessionization: a session closes after `gapMs` of
    * inactivity. A processing-time timeout flushes the open session when
    * a key goes quiet (no new events ever arrive for it) and clears its
    * state — without it, tail sessions are silently lost and per-key
    * state grows unbounded in a real stream. In batch execution Spark
    * never fires timeouts; closed sessions are still emitted inline. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[SessionAgg] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // key went quiet past the gap: emit the open session, drop state
            val st = state.get
            state.remove()
            if (st.n > 0L)
              Iterator(SessionAgg(userId, st.n,
                new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.last)))
            else Iterator.empty
          } else {
            // micro-batch arrival: fold events in ts order, emit closed sessions
            val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
            val out = Seq.newBuilder[SessionAgg]
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st.n == 0L) st = SessionState(1L, t, t)
              else if (t - st.last > gapMs) {
                out += SessionAgg(userId, st.n,
                  new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.last))
                st = SessionState(1L, t, t)
              } else st = SessionState(st.n + 1, st.start, t)
            }
            state.update(st)
            state.setTimeoutDuration(gapMs)
            out.result().iterator
          }
      }
  }
}
