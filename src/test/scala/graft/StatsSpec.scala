package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Stats

class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  test("weighted hash sample is deterministic, weight-proportional, and " +
      "independent of partitioning") {
    import spark.implicits._
    // two strata: heavy rows (w=1000) and light rows (w=10)
    val rows = ((1 to 200).map(i => (i.toLong, 1000L)) ++
      (201 to 400).map(i => (i.toLong, 10L))).toDF("id", "w")
    val kept = Stats.weightedHashSample(rows, "id", "w", targetK = 100L,
      salt = "t").select($"id").as[Long].collect().toSet
    val kept2 = Stats.weightedHashSample(rows.repartition(13), "id", "w",
      targetK = 100L, salt = "t").select($"id").as[Long].collect().toSet
    assert(kept == kept2, "sample must not depend on partitioning")
    val heavy = kept.count(_ <= 200)
    val light = kept.size - heavy
    // E[heavy] ≈ 100·(200·1000/202000) ≈ 99, E[light] ≈ 1
    assert(heavy > 70 && heavy <= 200, s"heavy=$heavy")
    assert(light < 10, s"light=$light")
    // per-row keep probability caps at 1 — a degenerate heavy row cannot
    // inflate the sample
    val capped = Stats.weightedHashSample(
      Seq((1L, 1000000L), (2L, 1L)).toDF("id", "w"), "id", "w",
      targetK = 5L, salt = "t").count()
    assert(capped <= 2)
  }

  test("weighted sample accepts realistic targetK (> 867 regression)") {
    import spark.implicits._
    // targetK 50k over 100 rows: expected keep probability caps at 1, so
    // everything is kept — the point is the DECIMAL arithmetic no longer
    // overflows when targetK stops fitting beside 2^60 in one literal
    val rows = (1 to 100).map(i => (i.toLong, 500L)).toDF("id", "w")
    val kept = Stats.weightedHashSample(rows, "id", "w",
      targetK = 50000L, salt = "big").count()
    assert(kept == 100L)
  }

  test("weighted sample with weight 0 rows never keeps them") {
    import spark.implicits._
    val rows = (1 to 50).map(i => (i.toLong, if (i <= 25) 0L else 7L))
      .toDF("id", "w")
    val kept = Stats.weightedHashSample(rows, "id", "w", targetK = 10L,
      salt = "z").select($"id").as[Long].collect()
    assert(kept.forall(_ > 25))
  }

  test("resample+LOCF: gaps fill forward, never backward; single-event " +
      "keys get a one-cell grid") {
    import spark.implicits._
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    val rows = Seq(
      (1L, ts(0), "purchase", 10.0),   // cell 00:00
      (1L, ts(1), "view", 99.0),       // shapes grid only
      (1L, ts(13), "purchase", 20.0),  // cell 12:00 (6h steps from 00:00)
      (1L, ts(20), "view", 0.0),       // extends grid to 18:00
      (2L, ts(5), "purchase", 7.0)     // single event -> one cell
    ).toDF("user_id", "ts", "event_type", "value")
    val got = Stats.resampleLocf(rows, "user_id", "ts", "value",
        obsPred = col("event_type") === "purchase", stepHours = 6)
      .orderBy($"user_id", $"h")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01 00:00:00.0", Some(10.0), Some(10.0)),
      (1L, "2024-01-01 06:00:00.0", None, Some(10.0)),       // gap: LOCF
      (1L, "2024-01-01 12:00:00.0", Some(20.0), Some(20.0)),
      (1L, "2024-01-01 18:00:00.0", None, Some(20.0)),
      (2L, "2024-01-01 05:00:00.0", Some(7.0), Some(7.0))))
  }
}
