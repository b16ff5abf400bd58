package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DateType, NumericType,
  StructType, TimestampType}

/** As-of (point-in-time) join — for every left row, attach the LATEST
  * right row whose timestamp is <= the left row's, per key: the temporal
  * alignment primitive Spark has no built-in for (feature snapshots at
  * label time, last-touch attribution, price-at-trade).
  *
  * The naive formulations are both 100 TB killers: a range join
  * (`l.ts >= r.ts` theta join) degenerates to a per-key cross product,
  * and "max(r.ts) <= l.ts then join back" scans the right side twice and
  * shuffles it twice. This instead runs the textbook union-merge:
  *
  *   1. tag each side and union into ONE stream of (keys, ts, side,
  *      payload) rows — no join node at all;
  *   2. one hash-shuffle by key, one in-partition sort by
  *      (ts, side, tiebreak) — right rows sort BEFORE left rows at equal
  *      ts, making the match inclusive;
  *   3. a running `last(right_payload, ignoreNulls)` over ROWS UNBOUNDED
  *      PRECEDING — Spark's incremental frame, O(rows) total — carries
  *      the newest right payload forward to every left row;
  *   4. keep left rows, unpack both payload structs.
  *
  * Cost: ONE exchange of |L|+|R| rows (each payload ships once), one
  * sort, zero join nodes (PlanAuditSpec pins exactly this shape). Skew
  * is bounded by per-key event volume, the same bound any per-entity
  * time-series op carries.
  *
  * Right rows sharing an exact (key, ts) are resolved deterministically:
  * the row with the greatest `tiebreakCol` wins (ASOF engines leave this
  * unspecified; a fixed rule makes the operator replayable).
  *
  * @param left      probe side; every row survives (left-outer semantics)
  * @param right     reference side, payload columns attached with `prefix`
  * @param keyCols   equality keys present on both sides
  * @param leftTs    left timestamp-ish column (any orderable type)
  * @param rightTs   right timestamp-ish column (same type as leftTs)
  * @param tiebreakCol right column ordering equal-timestamp right rows
  * @param prefix    prepended to attached right column names
  * @return left.* plus prefixed right payload columns (null when no
  *         right row is at or before the left timestamp)
  */
object AsOf {

  def asofBackward(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, tiebreakCol: String,
      prefix: String = "r_"): DataFrame = {
    // the greatest-tiebreak rule rides a lossless cast to long; a
    // non-numeric column would cast to all-null and silently turn the
    // documented determinism into arbitrary picks — reject it loudly
    val tbType = right.schema(tiebreakCol).dataType
    require(tbType.isInstanceOf[NumericType] || tbType == DateType ||
        tbType == TimestampType || tbType == BooleanType,
      s"tiebreak column '$tiebreakCol' has type $tbType, not losslessly " +
        "orderable as long; use a numeric/date/timestamp tiebreak")
    val lPayloadCols =
      left.columns.filterNot(c => keyCols.contains(c) || c == leftTs).toSeq
    val rPayloadCols = right.columns.filterNot(keyCols.contains).toSeq
    val lStruct = StructType(left.schema.filter(f => lPayloadCols.contains(f.name)))
    val rStruct = StructType(right.schema.filter(f => rPayloadCols.contains(f.name)))
    val keyed = keyCols.map(col)
    val tagged = left
      .select(keyed :+ col(leftTs).as("__t") :+ lit(1).as("__side") :+
        lit(null).cast("long").as("__tb") :+
        struct(lPayloadCols.map(col): _*).as("__l") :+
        lit(null).cast(rStruct).as("__r"): _*)
      .unionByName(right.select(
        keyed :+ col(rightTs).as("__t") :+ lit(0).as("__side") :+
          col(tiebreakCol).cast("long").as("__tb") :+
          lit(null).cast(lStruct).as("__l") :+
          struct(rPayloadCols.map(col): _*).as("__r"): _*))
    // right (side 0) before left (side 1) at equal __t => inclusive match;
    // among equal-(key, ts) right rows the greatest tiebreak sorts last,
    // so the running last() picks it. Nulls-first keeps left rows' null
    // __tb from outsorting any right tiebreak.
    val w = Window.partitionBy(keyed: _*)
      .orderBy(col("__t"), col("__side"), col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = tagged
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = lPayloadCols.map(c => col(s"__l.$c").as(c)) ++
      rPayloadCols.map(c => col(s"__m.$c").as(s"$prefix$c"))
    matched.select(keyed ++ Seq(col("__t").as(leftTs)) ++ out: _*)
  }
}
