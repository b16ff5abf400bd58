package graft
import org.scalatest.funsuite.AnyFunSuite
class DbgCdcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  test("dbg stream full") {
    val wh = java.nio.file.Files.createTempDirectory("dbg-cdc").toString
    spark.conf.set("spark.sql.catalog.gdbg", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdbg.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdbg.db")
    spark.sql("CREATE TABLE gdbg.db.t (k BIGINT, v DOUBLE) PARTITIONED BY (bucket(2, k))")
    spark.sql("INSERT INTO gdbg.db.t SELECT id, CAST(id AS DOUBLE) FROM range(1, 11)")
    val root = s"$wh/db/t"
    val ckpt = java.nio.file.Files.createTempDirectory("dbg-cdc-ck").toString
    val got = scala.collection.mutable.Buffer.empty[(Long, Double, String)]
    def start() = spark.readStream.format("graft-cdc")
      .option("table", "gdbg.db.t").load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        println(s"[dbg] batch $id rows=" + df.count())
        got ++= df.collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(3)))
        ()
      }.start()
    val q = start()
    try {
      q.processAllAvailable()
      got.clear()
      spark.sql("UPDATE gdbg.db.t SET v = -1.0 WHERE k = 3")
      q.processAllAvailable()
      println("[dbg] upd got=" + got.toSeq.sorted)
    } finally q.stop()
    got.clear()
    spark.sql("DELETE FROM gdbg.db.t WHERE k = 5")
    println("[dbg] snaps after del=" + graft.engine.SpecManifest.snapshots(spark, root))
    val q2 = start()
    try {
      q2.processAllAvailable()
      println("[dbg] restart got=" + got.toSeq.sorted)
    } finally q2.stop()
  }
}
