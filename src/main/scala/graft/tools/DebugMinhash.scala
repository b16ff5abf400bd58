package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Scratch diagnostic for d02 candidate-pair counts (not part of the API). */
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = Dedup.withPlantedDups(
      Tables.load(spark, dir, "documents").select($"doc_id", $"text"),
      "doc_id", "text", nPlant = 25, idOffset = 100000L, dropWords = 5)
    var t0 = System.nanoTime()
    println(s"docs: ${docs.count()}  words/doc p50: " +
      docs.select(size(split(trim($"text"), "\\s+")).as("nw"))
        .agg(expr("percentile(nw, 0.5)"), max($"nw")).head())
    println(f"count time ${(System.nanoTime()-t0)/1e9}%.1f")
    t0 = System.nanoTime()
    val sigs = docs.select($"doc_id".as("id"),
      Dedup.minhashSignature(Dedup.shingles($"text"), 64).as("sig")).persist()
    println(s"sigs: ${sigs.count()}, distinct sigs: ${sigs.select($"sig").distinct().count()}")
    println(f"sig time ${(System.nanoTime()-t0)/1e9}%.1f")
    t0 = System.nanoTime()
    val banded = sigs.select($"id", explode(Dedup.bandKeys($"sig", 16, 4)).as("band"))
    val bandSizes = banded.groupBy($"band").count()
    println("top band sizes: " + bandSizes.orderBy($"count".desc).limit(5).collect().mkString(", "))
    println(f"band time ${(System.nanoTime()-t0)/1e9}%.1f")
    t0 = System.nanoTime()
    val cand = banded.as("a").join(banded.as("b"), Seq("band"))
      .filter($"a.id" < $"b.id")
      .select($"a.id".as("id_a"), $"b.id".as("id_b"))
    println(s"candidate pairs (pre-distinct): ${cand.count()}")
    println(f"cand time ${(System.nanoTime()-t0)/1e9}%.1f")
    t0 = System.nanoTime()
    println(s"candidate pairs (distinct): ${cand.distinct().count()}")
    println(f"distinct time ${(System.nanoTime()-t0)/1e9}%.1f")
    spark.stop()
  }
}
