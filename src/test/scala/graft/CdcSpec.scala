package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc

class CdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  test("latest-wins fold: upsert, delete, delete-of-absent, ordering ties") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    // key 1: U then D (D last → gone); key 2: D then U (U last → survives);
    // key 4: I for a key not in base; key 5: D of an absent key (no-op);
    // key 2's two same-ts changes tie-break on seq (higher seq wins)
    val changes = Seq(
      (1L, "U", 1L, 1L, 11.0),
      (1L, "D", 2L, 2L, 0.0),
      (2L, "D", 1L, 3L, 0.0),
      (2L, "U", 2L, 4L, 22.0),
      (2L, "U", 2L, 5L, 23.0),
      (4L, "I", 1L, 6L, 44.0),
      (5L, "D", 1L, 7L, 0.0)
    ).toDF("k", "op", "t", "seq", "v")

    val got = Cdc.applyLatestWins(base, "k", changes, "op",
        Seq($"t", $"seq"), Map("name" -> lit("new")))
      .orderBy($"k")
      .as[(Long, String, Double, String)].collect().toSeq

    assert(got == Seq(
      (2L, "b", 23.0, "update"),  // latest (t=2,seq=5) wins, name kept
      (3L, "c", 30.0, "base"),    // untouched
      (4L, "new", 44.0, "insert") // insert default for non-payload col
    ))
  }
}
