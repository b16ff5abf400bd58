package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/point range joins realized as equi-joins over a coarse grid —
  * the shape that keeps a temporal-overlap join off Spark's
  * BroadcastNestedLoopJoin/CartesianProduct path at any data size.
  *
  * A predicate like `p.t BETWEEN i.lo AND i.hi` has no equality, so the
  * naive plan is all-pairs. Bucketing both sides onto a grid of width
  * `cell` restores an equi-key: an interval overlaps a point only if the
  * point's cell is one of the ceil(len/cell)+1 cells the interval covers,
  * so exploding each interval into its covered cells and hash-joining on
  * the cell id touches exactly the candidate pairs, then the exact
  * range predicate filters within the bucket. Cost is
  * |intervals|·(len/cell) replication against a co-partitioned shuffle —
  * tunable, local, and AQE-skew-splittable, where the nested-loop plan is
  * |points|·|intervals| and lives on one unsplittable stage. (Same
  * bucketing that backs interval joins in Flink's and Trino's temporal
  * operators; grid width should be on the order of the typical interval
  * length.)
  */
object RangeJoin {

  /** Join points to the intervals containing them, via grid cells.
    *
    * @param points    one row per point; `pt` must be an integer column
    *                  (e.g. epoch days/micros — caller picks the unit)
    * @param intervals one row per interval; `lo`/`hi` integer columns in
    *                  the same unit, inclusive on both ends
    * @param cell      grid width in the same unit; intervals explode into
    *                  (hi div cell) - (lo div cell) + 1 rows
    * @param keys      extra equi-key columns present on BOTH sides (e.g.
    *                  user_id for per-entity temporal joins); the hash key
    *                  becomes (keys..., cell), so a hot entity's candidate
    *                  set is further cut by the time grid — the skew
    *                  control a bare entity-keyed join lacks
    * @return points × containing-intervals, all columns of both inputs
    */
  def pointInInterval(points: DataFrame, pt: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      cell: Long, keys: Seq[String] = Seq.empty): DataFrame = {
    require(cell > 0, s"grid cell must be positive, got $cell")
    val cells = intervals
      .withColumn("_lo", lo.cast("long"))
      .withColumn("_hi", hi.cast("long"))
      .withColumn("_cell",
        explode(sequence(expr(s"_lo div ${cell}L"), expr(s"_hi div ${cell}L"))))
    val probes = points
      .withColumn("_pt", pt.cast("long"))
      .withColumn("_cell", expr(s"_pt div ${cell}L"))
    // equi-join on the cell id (+ caller keys); the exact containment
    // check runs inside the co-partitioned bucket. A point lies in
    // exactly one cell, so no pair can match twice — no distinct pass.
    probes.join(cells, keys :+ "_cell")
      .filter(col("_pt") >= col("_lo") && col("_pt") <= col("_hi"))
      .drop("_cell", "_pt", "_lo", "_hi")
  }
}
