package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.TextAnalysis.tokens

/** Deduplication operators for a 100 TB training-data pipeline.
  *
  * Design: every variant reduces to (1) a partition-local, codegen'd
  * signature computation (no shuffle), then (2) ONE shuffle on a compact
  * bucket key, then (3) bucket-local candidate joins + exact
  * verification. Nothing ever does an all-pairs comparison; the only
  * quadratic work is within a bucket, and buckets are bounded (salt /
  * AQE skew handling apply if a degenerate key appears).
  */
object Dedup {

  // ---------------------------------------------------------------------
  // Exact dedup: hash-groupBy on a normalized fingerprint.
  // Spark shape: groupBy(md5) — map-side partial agg, single shuffle.
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  // ---------------------------------------------------------------------
  // MinHash + LSH banding.

  /** Word w-shingles (default w=3) as a distinct array. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - w, lit(0))),
        i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
  }

  /** numPerm-wide MinHash signature: sig[p] = min over shingles of
    * xxhash64(shingle, p). Pure nested HOFs — one pass over the data. */
  def minhashSignature(sh: Column, numPerm: Int): Column =
    transform(sequence(lit(0), lit(numPerm - 1)),
      p => array_min(transform(sh, s => xxhash64(s, p))))

  /** LSH band keys: split the signature into `bands` rows-per-band groups;
    * key = xxhash64 of the band's slice + band index. Docs sharing ANY
    * band key become candidate pairs. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(concat_ws(",",
        transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string"))), b))

  /** Candidate near-dup pairs with exact Jaccard verification.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    */
  def minhashLsh(
      docs: DataFrame, idCol: String, textCol: String,
      numPerm: Int = 64, bands: Int = 16, threshold: Double = 0.5): DataFrame = {
    val rowsPerBand = numPerm / bands
    val sigs = docs
      .select(col(idCol).as("id"), shingles(col(textCol)).as("sh"))
      .withColumn("band", explode(bandKeys(
        minhashSignature(col("sh"), numPerm), bands, rowsPerBand)))
    // bucket-local self-join: shuffle key = band hash (already uniform)
    val a = sigs.select(col("band"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sigs.select(col("band"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard")).as("jaccard"))
  }

  // ---------------------------------------------------------------------
  // SimHash: 64-bit signature; near-dups = small Hamming distance.

  /** 64-bit SimHash over whitespace tokens: bit j is the sign of
    * Σ_tokens (±1 by bit j of xxhash64(token)). */
  def simhash(text: Column): Column = {
    val toks = tokens(text)
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, j) => acc + when(
        aggregate(toks, lit(0L), (s, t) =>
          s + when(call_function("shiftright", xxhash64(t), j).bitwiseAND(1) === 1, 1L).otherwise(-1L)
        ) >= 0, call_function("shiftleft", lit(1L), j)).otherwise(0L))
  }

  /** Near-dup pairs by SimHash: block on 4 × 16-bit chunks (pigeonhole —
    * any pair within Hamming distance 3 shares at least one chunk), then
    * verify bit_count(xor) <= maxHamming within blocks. */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
      .withColumn("chunk", explode(transform(sequence(lit(0), lit(3)),
        c => struct(c.as("c"),
          call_function("shiftright", col("sig"), c * 16).bitwiseAND(0xFFFFL).as("v")))))
    val a = sigs.select(col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("hamming")).as("hamming"))
  }

  // ---------------------------------------------------------------------
  // N-gram Jaccard via inverted index (exact, not probabilistic).

  /** Exact token-set Jaccard for all pairs sharing ≥1 token, via an
    * inverted-index join — the SQL-expressible exact counterpart of
    * minhashLsh (oracle-friendly). Restrict `docs` first at scale. */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      array_distinct(tokens(col(textCol))).as("tk"))
    val sizes = toks.select(col("id"), size(col("tk")).as("n"))
    val inv = toks.select(col("id"), explode(col("tk")).as("t"))
    val shared = inv.as("x").join(inv.as("y"), Seq("t"))
      .filter(col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("jaccard",
        col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  // ---------------------------------------------------------------------
  // Embedding cosine near-dup: LSH-bucketed, exact cosine verify.
  def embeddingNearDups(
      embs: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, lshBits: Int = 12): DataFrame = {
    val withBucket = embs.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", VectorFunctions.lshBucket(col("v"), lshBits))
    val a = withBucket.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = withBucket.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosine(col("v_a"), col("v_b")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("cos")).as("cos"))
  }

  // ---------------------------------------------------------------------
  /** Test fixture: union `docs` with perturbed copies (last `dropWords`
    * words removed, id offset) so near-dup operators have planted positives
    * with known ids — deterministic, derived only from the input. */
  def withPlantedDups(
      docs: DataFrame, idCol: String, textCol: String,
      nPlant: Int, idOffset: Long, dropWords: Int = 5): DataFrame = {
    val planted = docs.filter(col(idCol) < nPlant)
      .withColumn(idCol, col(idCol) + idOffset)
      .withColumn(textCol, {
        val toks = tokens(col(textCol))
        concat_ws(" ", slice(toks, lit(1), greatest(size(toks) - dropWords, lit(1))))
      })
    docs.unionByName(planted)
  }
}
