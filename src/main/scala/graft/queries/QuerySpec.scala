package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark program plus (optionally) the ANSI-SQL
  * oracle the driver runs through DuckDB on the same parquet tables.
  *
  * Contract (see /root/repo/SURVEY.md §5): the driver sorts columns by name
  * and hashes values, so every computed column must carry the SAME alias in
  * both the Spark program and the oracle, and both sides impose the same
  * total ORDER BY. Floating aggregates are computed in DECIMAL (exact,
  * order-independent) and cast to DOUBLE at the end — never summed as raw
  * doubles, whose low bits depend on partial-aggregation order.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** headline queries are timed by Bench */
    bench: Boolean = false)

object QuerySpec {
  /** Money/measure convention: exact decimal inside aggregation. */
  val Dec = "decimal(18,2)"
}
