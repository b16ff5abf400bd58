package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-then-chunk step of an LLM pretraining
  * pipeline: documents are laid out in one deterministic global token
  * stream (doc-id order) and cut into fixed-size context windows; each
  * document lands in chunks [chunk_first, chunk_last], straddling a
  * boundary when its tokens cross a multiple of `window`.
  *
  * The core is a GLOBAL prefix sum of token counts, and the naive
  * formulation — `sum(n) over (ORDER BY id)` with no partitionBy — is a
  * single-partition window: the whole corpus funnels through one task,
  * the classic 100 TB scale-killer (PlanAuditSpec pins its absence).
  * Instead this runs the textbook distributed scan:
  *   1. range-partition by id (partitions are globally id-ordered);
  *   2. one tiny aggregation computes per-partition token subtotals —
  *      numPartitions rows to the driver, nothing else leaves;
  *   3. exclusive prefix offsets of those subtotals broadcast back via a
  *      literal map, and the cumulative sum completes per-partition
  *      (window PARTITIONED by the range-partition id, fully parallel).
  *
  * Every quantity is an exact integer, so the SQL oracle replays the
  * layout with a plain ordered cumsum.
  *
  * @return (id, n_tokens, tok_start, chunk_first, chunk_last) — tok_start
  *         is the document's offset in the global stream, chunks are
  *         0-based windows of `window` tokens; empty-token docs occupy
  *         zero width and report their boundary position's chunk.
  */
object Packing {

  def sequenceChunks(
      docs: DataFrame, idCol: String, textCol: String,
      window: Int, numPartitions: Option[Int] = None): DataFrame =
    sequenceChunksFromCounts(
      docs.select(col(idCol).cast("long").as("id"),
        size(TextAnalysis.tokens(col(textCol))).cast("long")
          .as("n_tokens")),
      idCol, window, numPartitions)

  /** [[sequenceChunks]] over PRE-COUNTED lengths — the packer a real
    * pipeline runs over t22's staged token-id table, where `n_tokens`
    * is the BPE token count of the materialized arrays rather than a
    * whitespace proxy (p28). Input must be (id long, n_tokens long). */
  def sequenceChunksFromCounts(
      counted: DataFrame, idCol: String,
      window: Int, numPartitions: Option[Int] = None): DataFrame = {
    // 1. id-ordered partitions (ranges are globally ordered, so prefix
    //    offsets by partition id ARE stream offsets); the in-partition
    //    sort keeps the checkpoint layout ordered, and the window below
    //    re-sorts only within its own hash partitions. Default: let AQE
    //    pick/coalesce the partition count; pass numPartitions to pin it
    //    (REPARTITION_BY_NUM is exempt from AQE coalescing).
    val ranged = numPartitions match {
      case Some(n) => counted.repartitionByRange(n, col("id"))
      case None => counted.repartitionByRange(col("id"))
    }
    val parted = ranged
      .sortWithinPartitions(col("id"))
      .withColumn("__pid", spark_partition_id())
    // materialize ONCE: the subtotal pass and the final pass must read the
    // same frozen __pid assignment (repartitionByRange re-samples ranges
    // per job, so an un-checkpointed plan could change partition ids
    // between the two passes and mis-key the offsets)
    val staged = parted.localCheckpoint()
    // 2. per-partition subtotals: numPartitions rows, driver-side scan
    val subtotals = staged.groupBy(col("__pid"))
      .agg(sum(col("n_tokens")).as("ptotal"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // 3. exclusive prefix offsets: offset(pid) = Σ subtotals of all
    //    lower-id partitions (scanLeft's init is the running sum BEFORE
    //    each pid, which is exactly the exclusive prefix)
    val pids = subtotals.keys.toSeq.sorted
    val offsets: Map[Int, Long] = pids
      .zip(pids.scanLeft(0L)((acc, pid) => acc + subtotals(pid)).init)
      .toMap
    // map_from_arrays literal lookup keeps the plan free of joins
    val offCol =
      if (pids.isEmpty) lit(0L)
      else element_at(
        map_from_arrays(
          array(pids.map(lit(_)): _*),
          array(pids.map(p => lit(offsets(p))): _*)),
        col("__pid"))
    val w = Window.partitionBy(col("__pid")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged
      .withColumn("tok_end", sum(col("n_tokens")).over(w) + offCol)
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .select(col("id").as(idCol), col("n_tokens"), col("tok_start"),
        floor(col("tok_start") / window).cast("long").as("chunk_first"),
        floor(greatest(col("tok_end") - 1, col("tok_start")) / window)
          .cast("long").as("chunk_last"))
  }

  /** Deterministic corpus shuffle + shard assignment — pretraining wants
    * a REPRODUCIBLE global permutation (same seed → same order on any
    * cluster, any partition count) and balanced shard files. The
    * permutation key is md5(seed ':' id): engine-independent, uniform,
    * and replayable by any SQL engine's `row_number() OVER (ORDER BY
    * key)` — which is also exactly the formulation that must NOT run
    * here (a global-ORDER window is one task doing the whole corpus).
    * Instead the permutation position comes from the sequenceChunks
    * machinery: range-partition by key (globally ordered ranges), count
    * rows per partition, broadcast exclusive prefix offsets, finish the
    * rank per-partition in parallel. Shards are `pos % nShards` —
    * perfectly balanced by construction, no sampling step.
    *
    * @return (id, pos 0-based global permutation position, shard)
    */
  def deterministicShuffle(
      docs: DataFrame, idCol: String, seed: String, nShards: Int,
      numPartitions: Option[Int] = None): DataFrame = {
    val keyed = docs.select(col(idCol).cast("long").as("id"),
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))).as("k"))
    withGlobalRowNumber(keyed, "__rn", Seq("k", "id"), numPartitions)
      .withColumn("pos", col("__rn") - 1L)
      .select(col("id").as(idCol), col("pos"),
        (col("pos") % nShards).as("shard"))
  }

  /** Distributed global `row_number` (1-based, in `orderCols` order) —
    * the [[sequenceChunks]]/[[deterministicShuffle]] machinery factored
    * out so ANY operator needing a total-order position (p26's
    * curriculum stream) gets the scale-safe scan instead of the
    * single-partition `Window.orderBy` it replaces:
    *   1. range-partition by the order columns (ranges are globally
    *      ordered, so per-partition offsets ARE stream positions);
    *   2. per-partition row counts — numPartitions longs to the driver,
    *      nothing else leaves;
    *   3. exclusive prefix offsets broadcast back as a literal map, and
    *      the rank completes per-partition (window PARTITIONED by the
    *      range-partition id, fully parallel).
    * The pid assignment is frozen with one localCheckpoint so the count
    * pass and the rank pass read identical ranges (repartitionByRange
    * re-samples per job otherwise). `orderCols` must be a TOTAL order —
    * ties would make the position nondeterministic across runs.
    */
  private[graft] def withGlobalRowNumber(
      df: DataFrame, posCol: String, orderCols: Seq[String],
      numPartitions: Option[Int] = None): DataFrame = {
    val ord = orderCols.map(col)
    val ranged = numPartitions match {
      case Some(n) => df.repartitionByRange(n, ord: _*)
      case None => df.repartitionByRange(ord: _*)
    }
    val staged = ranged.sortWithinPartitions(ord: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val counts = staged.groupBy(col("__pid"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = counts.keys.toSeq.sorted
    val offsets: Map[Int, Long] = pids
      .zip(pids.scanLeft(0L)((acc, pid) => acc + counts(pid)).init)
      .toMap
    val offCol =
      if (pids.isEmpty) lit(0L)
      else element_at(
        map_from_arrays(
          array(pids.map(lit(_)): _*),
          array(pids.map(p => lit(offsets(p))): _*)),
        col("__pid"))
    val w = Window.partitionBy(col("__pid")).orderBy(ord: _*)
    staged
      .withColumn(posCol, row_number().over(w).cast("long") + offCol)
      .drop("__pid")
  }
}
