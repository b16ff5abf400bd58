package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  /** Driver-side reference: per left row, the right row with the
    * greatest ts <= left ts (ties on ts broken by greatest tiebreak). */
  private def bruteAsof(
      lefts: Seq[(Long, Long, Long)], // (key, id, ts)
      rights: Seq[(Long, Long, Long, Double)]) // (key, id, ts, v)
      : Map[(Long, Long), Option[(Long, Double)]] =
    lefts.map { case (k, id, t) =>
      val m = rights.filter(r => r._1 == k && r._3 <= t)
        .sortBy(r => (r._3, r._2)).lastOption
      (k, id) -> m.map(r => (r._2, r._4))
    }.toMap

  test("as-of join matches a brute-force scan on random data with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // small ts range forces equal-ts collisions on both sides
    val lefts = (0L until 300L).map(i =>
      (rnd.nextInt(8).toLong, i, rnd.nextInt(40).toLong))
    val rights = (0L until 300L).map(i =>
      (rnd.nextInt(8).toLong, 1000L + i, rnd.nextInt(40).toLong,
        rnd.nextInt(100).toDouble))
    val l = lefts.toDF("k", "id", "ts")
    val r = rights.toDF("k", "id", "ts", "v")
    val got = AsOf.asofBackward(l, r, Seq("k"), "ts", "ts", "id")
      .select($"k", $"id", $"r_id", $"r_v")
      .collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (if (x.isNullAt(2)) None else Some((x.getLong(2), x.getDouble(3)))))
      .toMap
    val want = bruteAsof(lefts, rights)
    assert(got.size == lefts.size, "every left row must survive")
    assert(got == want)
  }

  test("equal-timestamp right rows resolve to the greatest tiebreak") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("k", "id", "ts")
    val r = Seq((1L, 7L, 100L, 7.0), (1L, 9L, 100L, 9.0),
      (1L, 8L, 100L, 8.0)).toDF("k", "id", "ts", "v")
    val row = AsOf.asofBackward(l, r, Seq("k"), "ts", "ts", "id")
      .select($"r_id", $"r_v").collect().head
    assert((row.getLong(0), row.getDouble(1)) == ((9L, 9.0)))
  }

  test("unmatched left rows keep null right payloads (left-outer)") {
    import spark.implicits._
    val l = Seq((1L, 10L, 50L), (2L, 11L, 50L)).toDF("k", "id", "ts")
    val r = Seq((1L, 7L, 60L, 7.0)).toDF("k", "id", "ts", "v") // all after
    val rows = AsOf.asofBackward(l, r, Seq("k"), "ts", "ts", "id")
      .orderBy($"id").collect()
    assert(rows.length == 2 && rows.forall(_.isNullAt(3)))
  }

  test("as-of plan has one exchange and zero join nodes") {
    import spark.implicits._
    val l = (0L until 100L).map(i => (i % 5, i, i)).toDF("k", "id", "ts")
    val r = (0L until 100L).map(i => (i % 5, i + 1000L, i, i.toDouble))
      .toDF("k", "id", "ts", "v")
    val plan = AsOf.asofBackward(l, r, Seq("k"), "ts", "ts", "id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"no join node expected:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"exactly one shuffle expected, got $exchanges:\n$plan")
  }

  test("non-numeric tiebreak column is rejected loudly, not silently nulled") {
    import spark.implicits._
    val left = Seq((1L, 1L, 10L)).toDF("k", "id", "ts")
    val right = Seq((1L, "a", 5L, 1.0)).toDF("k", "name", "ts", "v")
    val e = intercept[IllegalArgumentException] {
      AsOf.asofBackward(left, right, Seq("k"), "ts", "ts", "name")
    }
    assert(e.getMessage.contains("tiebreak"))
  }
}
