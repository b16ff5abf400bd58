package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing for the engine-path bench entries (not part of the API). */
object DebugW01 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    Seq("e01_packet_run", "w01_migration_int4_to_int8", "w02_delete_rewrite")
      .foreach { q =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).count()
        println(f"$q: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
    spark.stop()
  }
}
