package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over a scale-factor directory.
  *
  * Mirrors the reference's source model — every packet query runs against a
  * set of named relations (`/root/reference/dbccore/dbccore.py:831-903`
  * ships SQL to PostgreSQL; here the relations are parquet tables and
  * Catalyst owns the plan). Tables are registered as temp views so both the
  * DataFrame API and `spark.sql` paths see the same names the DuckDB oracle
  * uses.
  *
  * Scale posture: `spark.read.parquet` is a file-source V1 scan — partition
  * pruning, predicate pushdown and column pruning all apply. At 100 TB the
  * same call reads a partitioned directory tree; nothing here assumes
  * single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should always be broadcast in joins. */
  val smallDims: Set[String] = Set("region", "nation")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df =
      if (name == "events") {
        // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
        // reader rejects; read the raw int64 and truncate to micros.
        // Integer `div` (not `/`) — ns-since-epoch exceeds double's 2^53
        // exact range, float division would corrupt microseconds.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path(dir, name))
      } else spark.read.parquet(path(dir, name))
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  /** Register every table of `dir` as a temp view (idempotent). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { t => load(spark, dir, t).createOrReplaceTempView(t) }

  /** Register only the named tables — each registration reads a parquet
    * footer, so a packet run that touches two tables should not pay for
    * ten (Engine resolves the referenced set from the packet SQL). */
  def registerSome(spark: SparkSession, dir: String, names: Seq[String]): Unit =
    names.filter(all.contains)
      .foreach { t => load(spark, dir, t).createOrReplaceTempView(t) }
}
