package graft
import org.apache.spark.sql.SparkSession
object TimeQ {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",")
    val sfDir = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B hook for conf experiments, e.g. GRAFT_CONF="spark.sql.join.preferSortMergeJoin=false"
    sys.env.get("GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    names.foreach { n =>
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val rows = SparkEntry.queries(n)(spark, sfDir).count()
        println(f"[timeq] $n run$i ${(System.nanoTime()-t0)/1e9}%.3f s " +
          s"rows=$rows")
      }
    }
    spark.stop()
  }
}
