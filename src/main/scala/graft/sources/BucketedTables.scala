package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed twin tables: the co-located-join storage layout.
  *
  * At 100 TB the single biggest shuffle in any fact-to-fact query is the
  * join key repartition — `orders ⋈ lineitem` moves BOTH tables across
  * the cluster every query. Bucketing is the ingest-time answer: write
  * each table hash-partitioned into the same number of buckets on the
  * join key (`bucketBy`), and every subsequent equi-join on that key is
  * exchange-free — each task reads bucket i of both sides locally. The
  * sort order inside each bucket (`sortBy`) additionally feeds the
  * sort-merge join pre-sorted input. This is the Spark-native analog of
  * the reference's keyed batching (pg_default storage is heap; the
  * reference gains locality from index scans —
  * `/root/reference/dbccore/dbccore.py:831` routes per-key batches);
  * Catalyst instead proves bucket-compatibility at plan time.
  *
  * Write-once per (session, sfDir): the first call stages the bucketed
  * tables into the session warehouse (an INGEST cost, like s03's IVF
  * assignment); queries then read `spark.table(...)`, never the raw
  * parquet. PlanAuditSpec pins the exchange-free plan.
  */
object BucketedTables {

  val Buckets = 8

  private val staged = scala.collection.mutable.Set.empty[(String, String)]

  private def tag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  def ordersTable(dir: String): String = s"orders_bkt_${tag(dir)}"
  def lineitemTable(dir: String): String = s"lineitem_bkt_${tag(dir)}"

  /** Stage the bucketed twins once per (session, sfDir); subsequent
    * calls are cache hits. Suites run sequentially, so holding the
    * monitor across the (rare) write keeps duplicate-overwrite races
    * out without the ivfIndex outside-monitor dance. */
  /** A killed JVM can leave the managed location on disk while the (in-
    * memory) catalog forgets the table; CTAS then fails with
    * LOCATION_ALREADY_EXISTS. Drop both halves before staging. */
  private def dropStale(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
  }

  def ensure(spark: SparkSession, dir: String): Unit = staged.synchronized {
    val key = (graft.SessionKey.of(spark), dir)
    if (!staged(key)) {
      dropStale(spark, ordersTable(dir))
      dropStale(spark, lineitemTable(dir))
      Tables.load(spark, dir, "orders").write.mode("overwrite")
        .format("parquet")
        .bucketBy(Buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(ordersTable(dir))
      Tables.load(spark, dir, "lineitem").write.mode("overwrite")
        .format("parquet")
        .bucketBy(Buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lineitemTable(dir))
      staged += key
    }
  }

  /** Per-order revenue over the bucketed twins: fact-to-fact equi-join
    * AND the keyed aggregation both reuse the bucket partitioning, so
    * the whole pipeline runs without one Exchange (plan-asserted). The
    * money sum is decimal-exact (the q01 rule). */
  def colocatedOrderRevenue(spark: SparkSession, dir: String): DataFrame = {
    ensure(spark, dir)
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")
    val o = spark.table(ordersTable(dir))
    val l = spark.table(lineitemTable(dir))
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(o("o_orderkey"), o("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
  }
}
