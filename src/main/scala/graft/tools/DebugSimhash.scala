package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing for d03 (not part of the API). */
object DebugSimhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("d03_dedup_simhash")(spark, dir).count()
      println(f"d03 run $i: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    spark.stop()
  }
}
