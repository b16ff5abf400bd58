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

  test("frame sampling keeps every stride-th chunk and reassembles") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(
      Tables.load(spark, dir, "documents").limit(20))
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
      .as[(Long, String, Int, Array[Byte])].collect()
    assert(frames.nonEmpty)
    // only even frame indices survive stride 2
    assert(frames.forall(_._3 % 2 == 0))
    // each sampled frame is the exact payload slice it claims to be
    val payloads = media.select($"media_id", $"payload")
      .as[(Long, Array[Byte])].collect().toMap
    frames.foreach { case (id, _, idx, bytes) =>
      val expect = payloads(id).slice(idx * 64, idx * 64 + 64)
      assert(bytes.toSeq == expect.toSeq, s"media $id frame $idx")
    }
    // stride 1 covers the whole payload exactly
    val full = Multimodal.sampleFrames(media, frameBytes = 64, stride = 1)
      .as[(Long, String, Int, Array[Byte])].collect()
      .groupBy(_._1).map { case (id, fs) =>
        id -> fs.sortBy(_._3).flatMap(_._4).toSeq
      }
    full.foreach { case (id, got) =>
      assert(got == payloads(id).toSeq, s"media $id reassembly")
    }
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
