package graft
import org.apache.spark.sql.SparkSession
object CountQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.grouped(2).foreach { case Array(n, d) =>
      println(s"[countq] $n $d rows=" +
        SparkEntry.queries(n)(spark, d).count())
    }
    spark.stop()
  }
}
