package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC change-feed apply: fold an ordered stream of keyed I/U/D change
  * records into a base table, latest-wins per key — the batch form of
  * what a Delta/Hudi MERGE does with a change feed, and the standard way
  * a lakehouse table tracks an OLTP source
  * (`/root/reference/dbccore/dbccore.py:831` routes per-key batches of
  * exactly these upsert/delete shapes through the packet loop; here the
  * whole feed folds in one declarative plan).
  *
  * Scale shape: the ONLY wide work over the (small) change feed is one
  * key-partitioned window to pick each key's final op — changes ≪ base
  * by assumption. The base table is touched by exactly one keyed join
  * (full outer, so never-changed rows survive untouched); with AQE the
  * deduped feed broadcasts and the base never shuffles at all. No
  * driver-side loop: a 10^9-row feed folds the same way.
  */
object Cdc {

  /** Apply `changes` to `base`, latest-wins.
    *
    * Contract: `changes` carries the SAME key column name as `base`,
    * an `opCol` valued 'I'/'U'/'D', ordering columns (later = wins),
    * and payload columns NAMED LIKE the base columns they replace.
    * Rows whose final op is 'D' disappear; keys absent from base are
    * inserted ('I'/'U' both upsert — the feed may be compacted);
    * non-payload base columns keep their base value on update and take
    * `insertDefaults` on insert. Adds an `origin` column
    * (base/insert/update) for audit.
    */
  def applyLatestWins(
      base: DataFrame, key: String,
      changes: DataFrame, opCol: String, ordering: Seq[Column],
      insertDefaults: Map[String, Column] = Map.empty): DataFrame = {
    val payload = changes.columns
      .filter(c => c != key && c != opCol && base.columns.contains(c)).toSet

    val w = Window.partitionBy(col(key)).orderBy(ordering.map(_.desc): _*)
    val last = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")

    val joined = base.alias("b")
      .join(last.alias("c"), col(s"b.$key") === col(s"c.$key"), "full_outer")
      .filter(col(s"c.$opCol").isNull || col(s"c.$opCol") =!= "D")

    val outCols = base.columns.toSeq.map { bc =>
      if (bc == key)
        coalesce(col(s"b.$key"), col(s"c.$key")).as(key)
      else if (payload.contains(bc))
        when(col(s"c.$opCol").isNotNull, col(s"c.$bc"))
          .otherwise(col(s"b.$bc")).as(bc)
      else
        when(col(s"b.$key").isNotNull, col(s"b.$bc"))
          .otherwise(insertDefaults.getOrElse(bc, lit(null))).as(bc)
    }
    val origin = when(col(s"c.$opCol").isNull, "base")
      .when(col(s"b.$key").isNull, "insert")
      .otherwise("update").as("origin")
    joined.select(outCols :+ origin: _*)
  }
}
