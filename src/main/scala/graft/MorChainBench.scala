package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf10 rehearsal datapoint for the MERGE-ON-READ READ PATH under a
  * LONG chain (the r15 verdict's brief #7): the per-commit rehearsals
  * cover write cost; this measures what a reader pays when folds lag —
  * a 12-layer delta chain on a hot partition — and what the fold-down
  * costs when it finally runs.
  *
  * `runMain graft.MorChainBench <sfDir> [layers]` — seeds orders
  * hash-partitioned 8 ways, lands `layers` commitMerge batches
  * (~0.5% delta each: upserts + deletes) on ONE hot partition, then
  * times (warm, best of 2): a full read() count over the chain, a CDC
  * diff across the whole chain, and the compact() fold. Prints
  * `[morchain]` lines for BENCH_NOTES.
  */
object MorChainBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val layers = if (args.length > 1) args(1).toInt else 12
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.engine.PartitionedManifest

    val root = java.nio.file.Files
      .createTempDirectory("graft-morchain").toString
    val base = graft.sources.Tables.load(spark, sfDir, "orders")
      .select($"o_orderkey".cast("long").as("k"),
        $"o_totalprice".cast("double").as("p"),
        ($"o_orderkey" % 8).cast("int").as("bk"))
    val t0 = System.nanoTime()
    PartitionedManifest.seed(spark, root, base, "bk")
    PartitionedManifest.commitSnapshot(spark, root, "bk", Map.empty,
      keepSnapshots = layers + 2)
    println(f"[morchain] seed ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val s0 = PartitionedManifest.currentSnapshot(spark, root).get
    // `layers` delta batches on the hot partition bk=0: ~0.5% upserts
    // (rotating key slices so layers overlap partially) + 0.1% deletes
    val t1 = System.nanoTime()
    (1 to layers).foreach { i =>
      val up = base.filter($"bk" === 0 && ($"k" % 1600) === (i % 16))
        .withColumn("p", $"p" + i).drop("bk")
      val del = base.filter($"bk" === 0 &&
          ($"k" % 8000) === (800 + i))
        .select($"k")
      PartitionedManifest.commitMerge(spark, root, "bk", Seq("k"),
        upserts = Map("0" -> up), deletes = Map("0" -> del),
        keepSnapshots = layers + 2)
    }
    println(f"[morchain] $layers merge commits " +
      f"${(System.nanoTime() - t1) / 1e9}%.3f s")
    def best2(label: String)(f: => Long): Unit = {
      val times = (1 to 2).map { _ =>
        val t = System.nanoTime(); val r = f
        ((System.nanoTime() - t) / 1e9, r)
      }
      println(f"[morchain] $label ${times.map(_._1).min}%.3f s " +
        s"rows=${times.head._2}")
    }
    best2("read-over-chain") {
      PartitionedManifest.read(spark, root, "bk", "int").count()
    }
    best2("cdc-across-chain") {
      val cur = PartitionedManifest.currentSnapshot(spark, root).get
      PartitionedManifest.changesBetween(spark, root, "bk", "int",
        s0, cur).count()
    }
    val t2 = System.nanoTime()
    val (_, folded) = PartitionedManifest.compact(spark, root, "bk",
      keepSnapshots = layers + 2)
    println(f"[morchain] fold ${(System.nanoTime() - t2) / 1e9}%.3f s " +
      s"partitions=${folded.mkString(",")}")
    best2("read-after-fold") {
      PartitionedManifest.read(spark, root, "bk", "int").count()
    }
    spark.stop()
  }
}
