package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Locality-preserving data layout: Z-order (Morton) interleaving of two
  * integer dimensions, and the shard assignment derived from it.
  *
  * The 100 TB problem this solves: a table is physically ordered by ONE
  * key, so range filters on a second dimension read everything. Mapping
  * (a, b) onto the Z-curve and partitioning by Z ranges gives every
  * shard a small rectangle in BOTH dimensions — a filter on either
  * column prunes most shards at the file level (the same layout Delta's
  * OPTIMIZE ZORDER BY and Hudi clustering write). The curve math is
  * pure integer bit-twiddling (the classic mask-spread sequence), so it
  * runs inside WholeStageCodegen here and replays exactly in any SQL
  * engine.
  */
object Layout {

  /** Spread the low 16 bits of `x` onto even bit positions (0, 2, …, 30)
    * — the textbook mask sequence, exact integer ops only. */
  def spreadBits16(x: Column): Column = {
    val v0 = x.bitwiseAND(lit(0xFFFFL))
    val v1 = (v0.bitwiseOR(shiftleft(v0, 8))).bitwiseAND(lit(0x00FF00FFL))
    val v2 = (v1.bitwiseOR(shiftleft(v1, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = (v2.bitwiseOR(shiftleft(v2, 2))).bitwiseAND(lit(0x33333333L))
    (v3.bitwiseOR(shiftleft(v3, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of (a, b): a's bits on even positions, b's on
    * odd. Monotone locality: close (a, b) pairs share long Z prefixes. */
  def zOrder16(a: Column, b: Column): Column =
    spreadBits16(a).bitwiseOR(shiftleft(spreadBits16(b), 1))

  /** Shard id = the top log2(nShards) bits of the Z code (nShards must
    * be a power of two): equal-width Z ranges, each a rectangle block
    * in (a, b) space. */
  def zShard(z: Column, nShards: Int): Column = {
    require(nShards > 0 && (nShards & (nShards - 1)) == 0,
      s"nShards must be a power of two, got $nShards")
    shiftright(z, 32 - Integer.numberOfTrailingZeros(nShards))
  }

  /** Events laid out on the (user_id, event-day) Z-curve: the layout a
    * 100 TB event store writes so BOTH per-user scans and per-day scans
    * prune files. Each dimension is min-max scaled to the full 16-bit
    * range first (what Delta's ZORDER range-bounds pass does) —
    * interleaving RAW values whose data range only touches the low bits
    * would leave every row in one Z quadrant and prune nothing. The
    * range scan is one min/max aggregate (4 scalars to the driver);
    * scaling is exact integer math, so the whole layout replays in SQL.
    * Returns (event_id, u16, d16, z, shard). */
  def eventsZLayout(events: DataFrame, nShards: Int = 16): DataFrame = {
    val base = events.select(col("event_id"), col("user_id").as("u"),
      // integer `div`, not `/` (Column./ is float division)
      expr("unix_micros(ts) div 86400000000L").as("d"))
    val r = base.agg(min(col("u")), max(col("u")),
      min(col("d")), max(col("d"))).head()
    val (umin, umax, dmin, dmax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val spanU = math.max(umax - umin, 1L)
    val spanD = math.max(dmax - dmin, 1L)
    val scaled = base.select(col("event_id"),
      expr(s"((u - ${umin}L) * 65535L) div ${spanU}L").as("u16"),
      expr(s"((d - ${dmin}L) * 65535L) div ${spanD}L").as("d16"))
    scaled.select(col("event_id"), col("u16"), col("d16"),
        zOrder16(col("u16"), col("d16")).as("z"))
      .withColumn("shard", zShard(col("z"), nShards))
  }

  /** Events laid out on the (user_id, event-day) HILBERT curve — the
    * strictly-better-locality sibling of [[eventsZLayout]]: consecutive
    * curve positions are always grid neighbors, so equal-width index
    * ranges (shards) are compact blobs with no Z-corner jumps, and a
    * filter on EITHER dimension prunes more shards at the file level.
    * Same min-max range scaling as the Z layout but onto an 8-bit grid
    * (256×256 cells → 16-bit curve index): at 100 TB the shard count is
    * what matters, and 4^8 cells already give 4096× the shard
    * granularity any real table needs; the per-cell fold is one
    * codegen'd integer loop (functions/Hilbert.scala) instead of an
    * exploding CASE unroll. Returns (event_id, u8, d8, h, shard).
    */
  def eventsHilbertLayout(events: DataFrame, nShards: Int = 16): DataFrame = {
    import graft.functions.Hilbert
    require(nShards > 0 && (nShards & (nShards - 1)) == 0,
      s"nShards must be a power of two, got $nShards")
    val base = events.select(col("event_id"), col("user_id").as("u"),
      expr("unix_micros(ts) div 86400000000L").as("d"))
    val r = base.agg(min(col("u")), max(col("u")),
      min(col("d")), max(col("d"))).head()
    val (umin, umax, dmin, dmax) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val spanU = math.max(umax - umin, 1L)
    val spanD = math.max(dmax - dmin, 1L)
    val scaled = base.select(col("event_id"),
      expr(s"((u - ${umin}L) * 255L) div ${spanU}L").as("u8"),
      expr(s"((d - ${dmin}L) * 255L) div ${spanD}L").as("d8"))
    scaled.select(col("event_id"), col("u8"), col("d8"),
        Hilbert.code(col("u8"), col("d8"), bits = 8).as("h"))
      .withColumn("shard",
        shiftright(col("h"), 16 - Integer.numberOfTrailingZeros(nShards)))
  }

  /** Contiguous Hilbert-index runs covering the cell rectangle
    * [x0..x1] × [y0..y1] — THE pruning primitive a curve layout exists
    * for: a 2-D predicate becomes a short list of 1-D index intervals,
    * and each interval prunes shards/files at the scan. Enumerated by
    * an exhaustive walk of the fixed 2^bits × 2^bits grid — pure
    * METADATA-scale work (65k cells at the layout's 8 bits, independent
    * of data volume, driver-side microseconds), which sidesteps the
    * rotation bookkeeping a recursive quadrant descent needs; larger
    * grids would switch to the descent.
    *
    * @return merged inclusive (lo, hi) index runs, ascending
    */
  def hilbertRuns(bits: Int, x0: Long, x1: Long,
      y0: Long, y1: Long): Seq[(Long, Long)] = {
    import graft.functions.HilbertIndex
    val n = 1L << bits
    require(0 <= x0 && x0 <= x1 && x1 < n && 0 <= y0 && y0 <= y1 && y1 < n,
      s"rect [$x0,$x1]x[$y0,$y1] outside the $n x $n grid")
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var d = 0L
    var runStart = -1L
    val total = n * n
    while (d < total) {
      val (x, y) = HilbertIndex.inverse(bits, d)
      val in = x >= x0 && x <= x1 && y >= y0 && y <= y1
      if (in) { if (runStart < 0) runStart = d }
      else if (runStart >= 0) { runs += ((runStart, d - 1)); runStart = -1L }
      d += 1
    }
    if (runStart >= 0) runs += ((runStart, total - 1))
    runs.toSeq
  }

  /** The rectangle predicate, pushed down a Hilbert layout: an IN-set
    * on the partition column (prunes files before any row is read)
    * AND an OR-of-BETWEENs on the curve index (exact cell containment,
    * min/max-prunable per row group). Both sides are plain comparisons
    * on stored columns, so they reach the scan as PushedFilters /
    * PartitionFilters — plan-asserted in PlanAuditSpec. */
  def hilbertRectPredicate(hCol: Column, shardCol: Column, bits: Int,
      nShards: Int, x0: Long, x1: Long, y0: Long, y1: Long): Column = {
    require(nShards > 0 && (nShards & (nShards - 1)) == 0,
      s"nShards must be a power of two, got $nShards")
    val runs = hilbertRuns(bits, x0, x1, y0, y1)
    require(runs.nonEmpty, "empty rectangle")
    val shift = 2 * bits - Integer.numberOfTrailingZeros(nShards)
    val shards = runs.flatMap { case (lo, hi) => (lo >> shift) to (hi >> shift) }
      .distinct.map(java.lang.Long.valueOf)
    val hPred = runs.map { case (lo, hi) => hCol.between(lo, hi) }
      .reduce(_ || _)
    shardCol.isin(shards: _*) && hPred
  }

  /** Small-file compaction plan: assign each input file to an output bin
    * so every bin holds ~`targetBytes`, greedily in file order within a
    * partition — the planning pass behind OPTIMIZE/compaction
    * maintenance. bin = (bytes of earlier files) div target, so a bin
    * closes once it reaches the target (the last file may overflow it by
    * less than one file — first-fit-in-order semantics, deterministic
    * and oracle-replayable as one window running sum).
    *
    * Scale shape: the input is FILE METADATA (one row per file — ~10^5
    * rows for a 100 TB table, not 10^12 data rows), so the per-partition
    * window is metadata-scale; the plan then drives one
    * read-shuffle-write of only the affected partitions.
    *
    * @return (partCol, fileCol, bytesCol, bin) — the compaction plan
    */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
      bytesCol: String, targetBytes: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(partCol)).orderBy(col(fileCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files.select(col(partCol), col(fileCol), col(bytesCol))
      .withColumn("__before", coalesce(sum(col(bytesCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__before div ${targetBytes}L"))
      .drop("__before")
  }
}
