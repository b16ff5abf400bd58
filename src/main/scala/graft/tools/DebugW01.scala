package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Scratch timing for the engine-path bench entries (not part of the API).
  * Counts Spark jobs and their summed wall time per query so driver-side
  * overhead (analysis, commit protocol) separates from execution. */
object DebugW01 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nJobs = new AtomicInteger
    val jobMs = new AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        nJobs.incrementAndGet()
        Option(starts.remove(j.jobId)).foreach(t0 => jobMs.addAndGet(j.time - t0))
      }
    })
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    Seq("e01_packet_run", "w01_migration_int4_to_int8", "w02_delete_rewrite")
      .foreach { q =>
        Thread.sleep(300) // let listener drain
        nJobs.set(0); jobMs.set(0)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"$q: wall $wall%.1f s, jobs ${nJobs.get()}, " +
          f"job-time ${jobMs.get() / 1000.0}%.1f s")
      }
    spark.stop()
  }
}
