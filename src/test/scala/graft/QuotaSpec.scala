package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quota
import graft.sources.Tables

class QuotaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("per-group quota equals the ranked-window formulation") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"source", $"doc_id", $"n_chars")
    val got = Quota.keepTopKPerGroup(docs, "source", "doc_id", "n_chars", 7)
      .select($"source", $"rank", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"n_chars".desc, $"doc_id")
    val want = docs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 7)
      .select($"source", $"rank", $"doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.groupBy(_._1).forall(_._2.size == 7))
  }

  test("quota partial aggregate runs map-side (before the exchange)") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"source", $"doc_id", $"n_chars")
    val plan = Quota.keepTopKPerGroup(docs, "source", "doc_id", "n_chars", 5)
      .queryExecution.executedPlan.toString
    // partial ObjectHashAggregate below the shuffle: the plan prints
    // bottom-up, so the FIRST aggregate mention must precede Exchange
    val aggIdx = plan.indexOf("ObjectHashAggregate")
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    assert(aggIdx >= 0 && exIdx >= 0, plan)
    assert(plan.lastIndexOf("ObjectHashAggregate") > exIdx,
      s"expected a partial aggregate under the exchange:\n$plan")
  }
}
