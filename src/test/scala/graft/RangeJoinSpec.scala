package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  test("point-in-interval equals a brute-force theta join, across cell " +
      "widths and cell-boundary-straddling intervals") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (1 to 300).map(i => (i.toLong, rnd.nextInt(200).toLong))
      .toDF("pid", "t")
    val ivs = (1 to 60).map { i =>
      val lo = rnd.nextInt(200).toLong
      (i.toLong, lo, lo + rnd.nextInt(15).toLong)
    }.toDF("iid", "lo", "hi")
    val expect = pts.join(ivs, $"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    for (cell <- Seq(1L, 7L, 16L, 1000L)) {
      val got = RangeJoin.pointInInterval(pts, $"t", ivs, $"lo", $"hi", cell)
        .select($"pid", $"iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"cell=$cell produced dup pairs")
      assert(got.toSet == expect, s"cell=$cell mismatch")
    }
  }

  test("composite keys: per-entity containment equals the brute-force " +
      "per-entity theta join") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val pts = (1 to 400).map(i =>
      (i.toLong, (i % 7).toLong, rnd.nextInt(100).toLong)).toDF("pid", "u", "t")
    val ivs = (1 to 80).map { i =>
      val lo = rnd.nextInt(100).toLong
      (i.toLong, (i % 7).toLong, lo, lo + rnd.nextInt(20).toLong)
    }.toDF("iid", "u", "lo", "hi")
    val expect = pts.as("p").join(ivs.as("i"),
        $"p.u" === $"i.u" && $"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val got = RangeJoin.pointInInterval(pts, $"t", ivs, $"lo", $"hi",
        cell = 16L, keys = Seq("u"))
      .select($"pid", $"iid").as[(Long, Long)].collect()
    assert(got.length == got.toSet.size)
    assert(got.toSet == expect)
  }

  test("negative coordinates: truncating division is monotone, so grid " +
      "cells stay consistent across zero") {
    import spark.implicits._
    // pre-epoch timestamps / negative offsets: `div` truncates toward
    // zero (cell 0 spans (-cell, cell)) — irregular but CONSISTENT
    // between the point's cell and the interval's cell range, which is
    // all containment needs
    val pts = (-30L to 30L).map(t => (t, t)).toDF("pid", "t")
    val ivs = Seq((1L, -25L, -10L), (2L, -5L, 5L), (3L, -31L, 31L))
      .toDF("iid", "lo", "hi")
    val expect = pts.join(ivs, $"t" >= $"lo" && $"t" <= $"hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    for (cell <- Seq(1L, 7L, 100L)) {
      val got = RangeJoin.pointInInterval(pts, $"t", ivs, $"lo", $"hi", cell)
        .select($"pid", $"iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"cell=$cell dup pairs")
      assert(got.toSet == expect, s"cell=$cell mismatch")
    }
  }

  test("empty-overlap and point-width intervals behave") {
    import spark.implicits._
    val pts = Seq((1L, 5L), (2L, 50L)).toDF("pid", "t")
    val ivs = Seq((10L, 5L, 5L), (11L, 6L, 7L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pts, $"t", ivs, $"lo", $"hi", 10L)
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }
}
