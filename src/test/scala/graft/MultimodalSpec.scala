package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("expression decode equals the batched mapPartitions decode") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(
      Tables.load(spark, dir, "documents").limit(50))
    val viaExpr = media
      .select($"media_id", Multimodal.byteHistogram($"payload").as("features"))
      .as[(Long, Array[Double])].collect().toMap
    val viaIter = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f.features).toMap
    assert(viaExpr.keySet == viaIter.keySet)
    viaExpr.foreach { case (id, f) =>
      assert(f.toSeq == viaIter(id).toSeq, s"media_id=$id")
    }
    // histogram is a normalized distribution
    viaExpr.values.foreach(f => assert(math.abs(f.sum - 1.0) < 1e-9))
  }

  test("feature summary stays inside whole-stage codegen") {
    val df = Multimodal.featureSummary(spark,
      Tables.load(spark, dir, "documents"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"),
      "expression path must not introduce an encoder boundary")
    assert(df.count() == 3) // png / jpeg / wav
  }
}
