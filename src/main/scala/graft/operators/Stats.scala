package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics at corpus scale. */
object Stats {

  /** Order-independent table content checksum per group: Σ over rows of
    * the md5-derived 64-bit hash of a canonical row rendering, mod 2^64
    * — the validation primitive a data-migration tool needs (the
    * reference's whole purpose is moving tables; its packets verify by
    * counts — `packets/test_int4_to_int8/05_step.sql` — while a checksum
    * catches VALUE corruption too, and two engines/two copies can each
    * compute it independently and compare one number per partition).
    *
    * Order-independence comes from + being commutative — no ORDER BY,
    * no collect; map-side partial sums make the shuffle one decimal per
    * partition per group. Emitted as hi/lo 32-bit halves so the unsigned
    * 2^64 total survives BIGINT on every engine. The caller's `rowStr`
    * must render identically across engines: integers/strings verbatim,
    * floats through DECIMAL (raw double→string notation diverges).
    */
  def contentChecksum(df: DataFrame, groupCol: String, rowStr: Column)
      : DataFrame = {
    val two64 = "CAST('18446744073709551616' AS DECIMAL(38,0))"
    df.select(col(groupCol),
        element_at(graft.functions.SimHash.tokenHash64(array(rowStr)), 1)
          .as("h"))
      .withColumn("hu", expr("CAST(h AS DECIMAL(38,0)) + " +
        s"CASE WHEN h < 0 THEN $two64 ELSE CAST(0 AS DECIMAL(38,0)) END"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"), sum(col("hu")).as("s"))
      .select(col(groupCol), col("n_rows"),
        expr(s"CAST((s % $two64) div 4294967296 AS BIGINT)")
          .as("checksum_hi"),
        expr(s"CAST((s % $two64) % 4294967296 AS BIGINT)")
          .as("checksum_lo"))
  }

  /** Per-group quantiles over a DETERMINISTIC hash sample — the scale
    * path for "what does the value distribution look like" when a full
    * sort is off the table: an md5-threshold row sample (the t06
    * convention — engine-independent, no RNG state) bounds the sort to
    * the sample, and each requested quantile is the discrete order
    * statistic at rank ceil(q·n/100) (an EXISTING value, never an
    * interpolation — so the result is engine-exact, where interpolated
    * quantiles and t-digest/KLL sketches never replay).
    *
    * The rank arithmetic is integer ((n·q + 99) div 100); ties in the
    * value order are broken by `idCol` so the row_number is total, and
    * the picked VALUE at a tied boundary is the same either way.
    *
    * Scale shape: the filter is a codegen'd md5 predicate at the scan;
    * only the ~rate fraction shuffles into the per-group sort window.
    * At 100 TB with a 1e-4 rate the window sees 10^7 rows — bounded.
    *
    * @return (groupCol, n_sample, p<q1>, p<q2>, …)
    */
  def hashSampleQuantiles(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, salt: String, rateHex: String,
      qs: Seq[Int] = Seq(25, 50, 90)): DataFrame = {
    val sampled = df.filter(
      substring(md5(concat(lit(s"$salt:"), col(idCol).cast("string"))),
        1, 2) < lit(rateHex))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(valueCol), col(idCol))
    val wc = Window.partitionBy(col(groupCol))
    val ranked = sampled
      .withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wc))
    val qCols = qs.map(q =>
      max(when(col("__rn") === expr(s"(__n * $q + 99) div 100"),
        col(valueCol))).as(s"p$q"))
    ranked.groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_sample"), qCols: _*)
  }

  /** Deterministic weight-proportional Bernoulli sample — the importance
    * sampler a data-mixture pipeline needs ("sample ~k docs, long docs
    * proportionally more often") with zero RNG state: row i is kept iff
    *
    *   h60(salt:id) · ΣW  <  2^60 · k · w_i
    *
    * where h60 is the first 60 bits of md5 as a uniform integer in
    * [0, 2^60). That is P(keep) = min(1, k·w_i/ΣW) — expected sample
    * size ≤ k (exactly k·w/ΣW summed, short only by the capped heavy
    * rows) — decided by one integer comparison. Both sides are computed
    * in exact wide-integer arithmetic (Spark DECIMAL(38,0), oracle-side
    * int128), never a float ratio, so the kept row SET replays
    * bit-identically on any engine at any parallelism; the operand casts
    * below keep every declared precision ≤ 38 (19+18+1 on both sides).
    *
    * Scale shape: the total weight is one scalar (broadcast back), and
    * the keep predicate is a codegen'd per-row expression — no shuffle,
    * no sort, no state; appending data changes other rows' inclusion
    * only through ΣW, exactly as importance sampling must.
    *
    * @param weightCol non-negative integral weights (e.g. n_chars)
    * @param targetK   expected sample size in rows
    */
  def weightedHashSample(df: DataFrame, idCol: String, weightCol: String,
      targetK: Long, salt: String): DataFrame = {
    require(targetK > 0, s"targetK must be positive, got $targetK")
    // Spark widens sum(decimal(18,0)) to decimal(28,0); the cast back
    // keeps the product's DECLARED precision at 19+18+1 = 38 (values
    // stay far under 10^18 — weights are doc lengths, not monies)
    val tot = df.agg(
      sum(col(weightCol).cast("decimal(18,0)")).cast("decimal(18,0)")
        .as("__W"))
    val h60 = conv(substring(
        md5(concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("decimal(19,0)")
    // keep iff h60·ΣW < 2^60·(targetK·w): the 2^60 literal stays at its
    // own 19-digit precision and targetK multiplies onto the WEIGHT side
    // in exact BIGINT (ANSI errors loudly on overflow), so any targetK
    // with targetK·max(w) < 10^18 works (the decimal(18,0) cast below is
    // the binding bound, tighter than the ~1.15e18 Long-multiply bound;
    // ANSI rejects the cast loudly above it) — folding targetK into the
    // literal capped targetK at ~867 before DECIMAL(21,0) overflowed
    val rhs = (lit(targetK) * col(weightCol).cast("long"))
      .cast("decimal(18,0)")
    df.crossJoin(broadcast(tot))
      .filter(h60 * col("__W") <
        expr(s"CAST('${BigInt(2).pow(60)}' AS DECIMAL(19,0))") * rhs)
      .drop("__W")
  }

  /** Time-series RESAMPLE to a regular grid with LOCF fill — the
    * densification pass feature pipelines run before any
    * fixed-frequency model sees event data: per key, an aligned
    * `stepHours`-hour grid spans the key's own [min, max] range; sparse
    * observations land on their grid cell by pure integer arithmetic
    * (so the cell join is an EQUI-join, never a range join), and
    * `last_value IGNORE NULLS` carries each observation forward across
    * the gaps.
    *
    * Scale shape: the grid explodes from one row per key (bounds
    * aggregate — map-side combinable), cells are (key, timestamp)
    * pairs, and the window partitions by key: every stage shuffles
    * key-scale or grid-scale rows, never raw events beyond the first
    * bounds/cell pass.
    *
    * @param obsPred which events carry an observation (others only
    *                shape the grid via the bounds)
    * @return (key, h, obs_v, filled) — one row per grid cell
    */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, obsPred: Column, stepHours: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val stepUs = stepHours.toLong * 3600L * 1000000L
    val bounds = events.groupBy(col(keyCol))
      .agg(date_trunc("hour", min(col(tsCol))).as("t0"),
        max(col(tsCol)).as("tmax"))
    val grid = bounds.select(col(keyCol),
      explode(expr(s"sequence(t0, tmax, interval $stepHours hours)")).as("h"))
    val obs = events.filter(obsPred)
      .join(bounds.select(col(keyCol), col("t0")), keyCol)
      .withColumn("h", expr(
        s"t0 + make_interval(0, 0, 0, 0, cast($stepHours * " +
          s"((unix_micros($tsCol) - unix_micros(t0)) div ${stepUs}L) " +
          "as int), 0, 0)"))
      .groupBy(col(keyCol), col("h"))
      .agg(max(col(valueCol)).as("obs_v"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq(keyCol, "h"), "left")
      .withColumn("filled", last(col("obs_v"), ignoreNulls = true).over(w))
  }
}
