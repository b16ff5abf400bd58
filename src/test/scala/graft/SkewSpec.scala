package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.sources.Tables

/** Salted-join skew mitigation: result parity with the plain join, and
  * the salt actually spreads a hot key. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("salted join is row-identical to the plain join") {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    val orders = Tables.load(spark, dir, "orders")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderstatus")
    val plain = li.join(orders, "l_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("decimal(18,2)")).as("q"))
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(li, orders, "l_orderkey", salt = 7)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"l_quantity".cast("decimal(18,2)")).as("q"))
      .collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("a planted hot key of IDENTICAL rows spreads across salt sub-keys") {
    import spark.implicits._
    // 10k fully identical rows — the pathological post-pruning shape a
    // row-content hash would collapse onto ONE sub-key
    val big = spark.range(10000).select(lit(1L).as("k"))
    val small = Seq((1L, "x")).toDF("k", "v")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
    assert(salted.count() == 10000)
    val distinctSalts = big
      .withColumn("__s", pmod(xxhash64(monotonically_increasing_id()), lit(8)))
      .select("__s").distinct().count()
    assert(distinctSalts == 8, s"identical rows collapsed to $distinctSalts sub-keys")
  }
}
