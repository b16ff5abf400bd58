package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** Text-analysis operators for a training-data pipeline: tokenization,
  * quality scoring, language ID, fingerprinting. All pure column
  * expressions (codegen'd, partition-local, zero shuffle) — each scales
  * linearly and is reproducible in ANSI SQL for the DuckDB oracle.
  */
object TextAnalysis {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword-boundary token count: letter runs, digit runs, or a
    * single non-space symbol — the classic pre-tokenizer split. */
  val BpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeIshTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeIshPattern), lit(0))).cast("long")

  def wordCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Gopher-style repetition signals: total words, distinct words, the
    * most frequent word and its count — the raw inputs of the
    * top-word-fraction and duplicate-word-fraction quality rules. Emitted
    * as EXACT integers (ratios are one division away) so the oracle
    * compare is float-free. Scale shape: one generator explode, then two
    * aggregations whose shuffles carry only (id, word) / (id) keys with
    * map-side partial aggregation — no text is shuffled. */
  def repetitionSignals(df: DataFrame, idCol: String, text: Column): DataFrame = {
    val words = df.select(col(idCol), explode(tokens(text)).as("w"))
    val wc = words.groupBy(col(idCol), col("w"))
      .agg(count(lit(1)).as("c"))
    val agg = wc.groupBy(col(idCol)).agg(
      sum(col("c")).cast("long").as("n_words"),
      count(lit(1)).as("n_distinct"),
      max(col("c")).as("top_c"))
    // tie on the top count → lexicographically first word (deterministic)
    wc.join(agg, idCol).filter(col("c") === col("top_c"))
      .groupBy(col(idCol), col("n_words"), col("n_distinct"), col("top_c"))
      .agg(min(col("w")).as("top_word"))
      .select(col(idCol), col("n_words"), col("n_distinct"),
        col("top_c"), col("top_word"))
  }

  /** Deterministic per-stratum hash sampling — training-mixture
    * construction (keep X% of source A, Y% of source B) that is exactly
    * reproducible on any engine: a row survives iff the leading byte of
    * md5(salt:id) falls under its stratum's threshold. A pure
    * partition-local filter (no shuffle, no RNG state); changing the salt
    * redraws the sample, changing a rate only grows/shrinks that stratum
    * monotonically (hexThreshold is monotone in the rate). */
  def hexThreshold(rate: Double): String = {
    val n = math.max(0, math.min(256, math.round(rate * 256))).toInt
    // the compare is LEXICOGRAPHIC on two hex chars: rate 1.0 needs a
    // sentinel above "ff" of the same shape ("100" would sort BELOW "20")
    if (n >= 256) "zz" else f"$n%02x"
  }

  def hashSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], salt: String): DataFrame = {
    val bucket = substring(
      md5(concat(lit(salt + ":"), col(idCol).cast("string"))), 1, 2)
    val threshold = rates.foldLeft(lit("00")) { case (acc, (k, r)) =>
      when(col(stratumCol) === k, lit(hexThreshold(r))).otherwise(acc)
    }
    df.filter(bucket < threshold)
  }

  /** Quality features: length, mean word length, punctuation ratio,
    * stopword ratio, alpha ratio. Deterministic double math (single
    * divisions of exact integer counts). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "or", "to", "in", "is", "it",
    "for", "on", "with", "as", "by", "at", "this", "that")

  def qualityFeatures(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val stopArr = array(Stopwords.map(lit): _*)
    df.withColumn("n_chars_m", length(text).cast("long"))
      .withColumn("n_words", size(toks).cast("long"))
      .withColumn("mean_word_len",
        (length(regexp_replace(text, "\\s+", "")).cast("double") / nTok))
      .withColumn("punct_ratio",
        length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
          length(text).cast("double"))
      .withColumn("stopword_ratio",
        size(filter(toks, t => array_contains(stopArr, t))).cast("double") / nTok)
      .withColumn("quality_score",
        round(least(lit(1.0),
          col("stopword_ratio") * 2.0 +
            when(col("n_words") >= 50, 0.5).otherwise(col("n_words").cast("double") / 100.0)), 6))
  }

  /** Language ID by stopword-profile overlap: score(lang) = |tokens ∩
    * profile(lang)| / |profile(lang)|; argmax with deterministic
    * tie-break on profile order. A real n-gram model plugs in the same
    * shape; the point is the scalable column-expression form. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "dans", "un", "une", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "no", "en", "un", "una", "por"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = array_distinct(tokens(lower(text)))
    LangProfiles.map { case (lang, profile) =>
      val profArr = array(profile.map(lit): _*)
      // |profile ∩ tokens| via the codegen'd array_intersect (both sides
      // distinct, so identical to the filter/contains formulation the
      // oracle uses — but without the interpreted-HOF boxing tax)
      lang -> (size(array_intersect(profArr, toks)).cast("double") /
        profile.size.toDouble)
    }
  }

  /** argmax over langScores with 'und' (undetermined) when max = 0. */
  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Content fingerprint: md5 of case-folded, whitespace-collapsed text —
    * the reference's MD5 action-identity idea (dbccore.py:941) applied to
    * document identity. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
    * MOSS scheme): hash every word k-gram (rolling hash over the token
    * stream), then keep the MINIMUM hash of each w-wide window of
    * consecutive k-gram hashes; the sorted distinct minima are the
    * document's fingerprint set. Guarantees: any shared run of w+k-1
    * tokens between two documents contributes at least one SHARED
    * fingerprint, while a local edit perturbs only the windows that
    * overlap it — the document-level rolling-hash sketch a corpus pipeline
    * matches on. Per-k-gram hashes are md5-derived, so a SQL oracle
    * rebuilds the set exactly. Implemented as the fused native
    * [[graft.functions.WinnowFingerprints]] expression (the HOF
    * formulation re-evaluated the inlined gram+hash pipeline per window —
    * 237 s at sf0.1 vs ~1 s fused). Partition-local, zero shuffle; the
    * set size is ~tokens/avg-gap, bounded by the window structure, not
    * the vocabulary. */
  def winnowFingerprints(text: Column, k: Int = 5, w: Int = 4): Column =
    graft.functions.Winnow.fingerprints(tokens(text), k, w)

  /** Unigram surprisal scoring — the CCNet/Gopher-style LM-quality
    * filter reduced to its engine-exact core: score every document by
    * the mean negative log-probability of its tokens under the corpus's
    * OWN unigram distribution (high surprisal = rare-token gibberish,
    * low = boilerplate). A real deployment swaps the unigram model for a
    * KenLM binary; the relational shape — vocab build, postings join,
    * per-doc reduction — is identical, and that shape is the operator.
    *
    * Engine-exact: token and vocab counts are exact integers,
    * `p = c/T` is one IEEE division, ln runs through
    * [[graft.functions.LnLibm]] (platform libm, matches DuckDB `ln`
    * bit-for-bit), and each token's surprisal quantizes to integer
    * micros BEFORE the per-doc sum, so every reduction is an order-free
    * integer sum and the mean is an integer division.
    *
    * Scale shape: vocab = one map-side-combined groupBy over tokens;
    * scoring = postings join on token (AQE broadcasts the vocab while it
    * fits; at 100 TB both sides hash-shuffle on the token key) then one
    * groupBy(doc). Nothing is all-pairs, nothing driver-side except the
    * scalar total.
    *
    * @return (id, n_tokens, surprisal_sum_micros, mean_surprisal_micros)
    */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val postings = df.select(col(idCol),
      explode(tokens(col(textCol))).as("tok"))
    val vocab = postings.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = vocab.agg(sum(col("c"))).head().getLong(0)
    // mirrored literally in the SQL oracle: floor(-1000000.0 * ln(c/T))
    val micros = floor(lit(-1000000.0) * graft.functions.MathNative.lnLibm(
      col("c").cast("double") / lit(total.toDouble))).cast("long")
    postings.join(vocab, "tok")
      .select(col(idCol), micros.as("m"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("m")).as("surprisal_sum_micros"))
      .withColumn("mean_surprisal_micros",
        expr("surprisal_sum_micros div n_tokens"))
  }

  /** Conditional bigram-LM quality scoring with head/middle/tail
    * bucketing — the full CCNet move (Wenzek et al. 2019): score every
    * document by its mean negative log-likelihood under an add-one-
    * smoothed bigram model trained on the corpus itself, then split the
    * corpus into three equal-population quality buckets by score rank.
    * [[unigramSurprisal]] is the context-free version; this one
    * conditions on the previous token, which is what separates fluent
    * boilerplate from shuffled-word gibberish (identical unigram
    * histograms, very different bigram likelihoods).
    *
    * Engine-exact: `P(w2|w1) = (c12 + 1) / (c1 + V)` is one IEEE
    * division of exact integer counts, ln runs through the platform
    * libm ([[graft.functions.MathNative.lnLibm]], bit-matches DuckDB),
    * and each bigram's NLL quantizes to integer micros BEFORE the
    * per-doc sum — every reduction is an order-free integer sum.
    *
    * Scale shape: the bigram stream is a per-document lag window
    * (partitioned by doc, bounded by doc length — never corpus-wide);
    * model counts are map-side-combined groupBys on compact token-pair
    * keys; scoring joins on (w1,w2)/(w1) — AQE broadcasts the model
    * while it fits, hash-shuffles both sides at 100 TB; the tercile
    * rank uses [[Packing.withGlobalRowNumber]]'s range-partition +
    * broadcast-offset scan, NOT a single-partition global window.
    * Driver-side: two scalars (vocab size, doc count).
    *
    * @return (id, n_bigrams, nll_sum_micros, mean_nll_micros, bucket)
    */
  def bigramLmBuckets(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (big, bc, pc, nv) = bigramModel(df, idCol, textCol)
    bigramLmRanked(big, bc, pc, nv, idCol)
  }

  /** Quality-staged training curriculum — the order a CCNet-filtered
    * corpus is actually consumed in: every document gets a global
    * stream position that serves the HEAD tercile first, then middle,
    * then tail, with a REPRODUCIBLE md5-keyed shuffle inside each
    * stage (same seed → same order on any cluster, the
    * [[Packing.deterministicShuffle]] contract).
    *
    * Scale shape: bucket assignment is [[bigramLmBuckets]]; the global
    * position is the distributed range-partition rank over
    * (stage, md5 key) — no single-partition window anywhere.
    *
    * @return (id, bucket, pos 0-based global training position)
    */
  def qualityCurriculum(df: DataFrame, idCol: String, textCol: String,
      seed: String): DataFrame = {
    val staged = bigramLmBuckets(df, idCol, textCol)
      .withColumn("stage",
        when(col("bucket") === "head", lit(0))
          .when(col("bucket") === "middle", lit(1)).otherwise(lit(2)))
      .withColumn("k",
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
    Packing.withGlobalRowNumber(staged, "__rn", Seq("stage", "k", idCol))
      .withColumn("pos", col("__rn") - lit(1L))
      .select(col(idCol), col("bucket"), col("pos"))
  }

  /** Per-document bigram stream: (id, w1, w2) for every adjacent token
    * pair — the ONE tokenization both training and serving share (a
    * hand-synced copy would let the frozen model silently diverge from
    * the scoring path). The lag window is per-document: bounded by doc
    * length, never corpus-wide. */
  private def bigramStream(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    toks
      .withColumn("w1", lag(col("tok"), 1).over(w))
      .filter(col("w1").isNotNull)
      .select(col(idCol), col("w1"), col("tok").as("w2"))
  }

  /** The add-one bigram model's pieces: (per-doc bigram stream,
    * pair counts (w1,w2,c12), prefix counts (w1,c1), vocab size). */
  private def bigramModel(df: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame, DataFrame, Long) = {
    val big = bigramStream(df, idCol, textCol)
    val bc = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val pc = big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val nv = df.select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .agg(countDistinct(col("tok"))).head().getLong(0)
    (big, bc, pc, nv)
  }

  /** Score + tercile-bucket a corpus given its model pieces (shared by
    * [[bigramLmBuckets]] and the ingest stager, which already has the
    * pieces in hand — re-deriving them would double the staging scans). */
  private def bigramLmRanked(big: DataFrame, bc: DataFrame, pc: DataFrame,
      nv: Long, idCol: String): DataFrame = {
    // mirrored literally in the SQL oracle:
    // floor(-1000000.0 * ln((c12 + 1.0) / (c1 + V)))
    val micros = floor(lit(-1000000.0) * graft.functions.MathNative.lnLibm(
      (col("c12").cast("double") + lit(1.0)) /
        (col("c1").cast("double") + lit(nv.toDouble)))).cast("long")
    val perDoc = big.join(bc, Seq("w1", "w2")).join(pc, Seq("w1"))
      .select(col(idCol), micros.as("m"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("m")).as("nll_sum_micros"))
      .withColumn("mean_nll_micros", expr("nll_sum_micros div n_bigrams"))
    val ranked = Packing.withGlobalRowNumber(
      perDoc, "__rn", Seq("mean_nll_micros", idCol))
    // total population from the already-checkpointed rank stage
    // (null max = empty/degenerate corpus -> empty result, not an NPE)
    val n = Option(ranked.agg(max(col("__rn"))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    ranked.withColumn("bucket",
        when(col("__rn") * 3 <= n, lit("head"))
          .when(col("__rn") * 3 <= 2 * n, lit("middle"))
          .otherwise(lit("tail")))
      .drop("__rn")
  }

  /** Fixed artifact table names for the per-sfDir staged bigram LM —
    * dir-SUFFIXED (one artifact per corpus; safe here because the t27
    * oracle replays from the raw corpus and never reads these, unlike
    * [[wordSegsStagedTable]], whose static oracle glob forces a single
    * dir-independent name with the dir folded into the tag). */
  def lmModelStagedTable(dir: String): String =
    "t27_bigram_lm_" +
      new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_") +
      // basename alone collides for distinct dirs sharing a leaf name
      // (two corpora would silently share one artifact slot)
      "_" + java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(3)
        .map(b => f"${b & 0xff}%02x").mkString
  def lmStatsStagedTable(dir: String): String =
    lmModelStagedTable(dir) + "_stats"

  // (session, table) -> the tag this session validated/staged. Unlike
  // wordSegsStagedKeys, presence alone short-circuits: computing the
  // content fingerprint IS a corpus scan, so warm serving must not pay
  // it per call. The deliberate trade-off: IN-SESSION regeneration of
  // the corpus under the same dir is out of contract (fixtures are
  // immutable within a session); CROSS-session staleness is what the
  // fingerprint catches.
  private val lmStagedKeys =
    scala.collection.mutable.Map.empty[(String, String), String]

  /** Stage the corpus's bigram LM as a FROZEN quality-filter artifact —
    * the CCNet production shape: the model (observed (w1,w2) pair
    * counts with their prefix counts) and a one-row stats table (vocab
    * size + the head/middle tercile CUT-POINTS measured on the training
    * corpus) persist at ingest, and every later scoring pass — fresh
    * session, new documents, a stream — is per-document work against
    * the frozen tables: no global rank, no corpus rescan. Session-
    * memoized and tag-validated like the s19–s22 index stagers.
    *
    * Scale shape: the model is vocabulary²-bounded (observed pairs
    * only), written with full parallelism; the cut-points reuse
    * [[bigramLmBuckets]]'s distributed tercile rank once, at ingest. */
  def ensureBigramLmStaged(spark: SparkSession, dir: String,
      docs: DataFrame, idCol: String, textCol: String): Unit =
    lmStagedKeys.synchronized {
      val model = lmModelStagedTable(dir)
      val stats = lmStatsStagedTable(dir)
      val key = (graft.SessionKey.of(spark), model)
      // memo hit = zero Spark jobs (the fingerprint is only computed
      // when this session has not yet validated the artifact)
      if (!lmStagedKeys.contains(key)) {
        // content-keyed: row count + an order-independent xxhash64
        // BIT_XOR over (id, text) — a corpus regenerated in place under
        // the same sfDir (even at the same row count) must invalidate
        // the staged model instead of silently serving stale counts/
        // cuts. bit_xor, not sum: full-range hash longs overflow an
        // ANSI Int64 sum
        val fpRow = docs.agg(count(lit(1)),
          expr(s"bit_xor(xxhash64(`$idCol`, `$textCol`))")).head()
        val tag = s"v1|docs=${fpRow.getLong(0)}|fp=${fpRow.get(1)}"
        if (!stagedDirValid(spark, model, tag) ||
            !stagedDirValid(spark, stats, tag)) {
          Seq(model, stats).foreach { t =>
            spark.sql(s"DROP TABLE IF EXISTS `$t`")
            val loc = artifactLoc(spark, t)
            loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(loc, true)
          }
          val (big, bc, pc, nv) = bigramModel(docs, idCol, textCol)
          bc.join(pc, "w1").select("w1", "w2", "c12", "c1")
            .write.mode("overwrite").format("parquet").saveAsTable(model)
          // cut-points from the SAME model pieces (no second corpus
          // scan pass through bigramLmBuckets)
          val ranked = bigramLmRanked(big, bc, pc, nv, idCol)
          val cuts = ranked.agg(
            max(when(col("bucket") === "head", col("mean_nll_micros")))
              .as("cut_head"),
            max(when(col("bucket") =!= "tail", col("mean_nll_micros")))
              .as("cut_middle")).head()
          val cutH = if (cuts.isNullAt(0)) Long.MinValue else cuts.getLong(0)
          val cutM = if (cuts.isNullAt(1)) Long.MinValue else cuts.getLong(1)
          import spark.implicits._
          Seq((nv, cutH, cutM)).toDF("nv", "cut_head", "cut_middle")
            .repartition(1)
            .write.mode("overwrite").format("parquet").saveAsTable(stats)
          Seq(model, stats).foreach(t => writeTag(spark, t, tag))
          // a rebuilt artifact invalidates this session's cached scalars
          lmStatsCache.synchronized {
            lmStatsCache.remove((graft.SessionKey.of(spark), stats))
          }
        }
        lmStagedKeys(key) = tag
      }
    }

  /** Score documents against the FROZEN staged LM and bucket by the
    * frozen cut-points — the serving path. Unseen pairs/prefixes
    * smooth through the same add-one formula (c12=0 / c1=0 via left
    * joins), so out-of-domain text scores high-NLL instead of failing.
    * Per-document cost only: the model join is AQE-sized (broadcast
    * while the model fits, hash-join at web scale), the bucket decision
    * is a row-local comparison against two frozen literals — no global
    * state, which is exactly what makes this the streaming-safe twin
    * shape. */
  // (session, stats table) -> (nv, cut_head, cut_middle): the frozen
  // scalars load once per session, not once per micro-batch (the
  // streaming twin calls this per trigger — a driver head() job each
  // time is pure overhead on constants)
  private val lmStatsCache =
    scala.collection.mutable.Map.empty[(String, String), (Long, Long, Long)]

  def bigramLmBucketsFromArtifact(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, dir: String): DataFrame = {
    val modelTable = lmModelStagedTable(dir)
    val statsTable = lmStatsStagedTable(dir)
    // serve ONLY a complete, matched artifact pair: a re-staging that
    // crashed between the two table writes leaves model/stats from
    // different corpora — scoring B's counts against A's cut-points
    // would be silently wrong (the staged-segs encode path has the
    // same guard)
    val mTag = stagedTagOf(spark, modelTable)
    val sTag = stagedTagOf(spark, statsTable)
    require(mTag.isDefined && mTag == sTag,
      s"staged LM artifact pair `$modelTable`/`$statsTable` is missing " +
        s"or torn (tags $mTag vs $sTag) — run ensureBigramLmStaged first")
    // PATH reads, not spark.table: a FRESH engine finds the tag-valid
    // artifact directories without any catalog registration (the t25
    // artifact contract; `_`-prefixed tag/metadata files are ignored by
    // the parquet reader)
    val model = spark.read.parquet(
      artifactLoc(spark, modelTable).toString)
    val (nv, cutH, cutM) = lmStatsCache.synchronized {
      lmStatsCache.getOrElseUpdate(
        (graft.SessionKey.of(spark), statsTable), {
          val st = spark.read.parquet(
            artifactLoc(spark, statsTable).toString).head()
          (st.getAs[Long]("nv"), st.getAs[Long]("cut_head"),
            st.getAs[Long]("cut_middle"))
        })
    }
    val big = bigramStream(docs, idCol, textCol)
    val pc = model.groupBy(col("w1")).agg(max(col("c1")).as("c1"))
    val micros = floor(lit(-1000000.0) * graft.functions.MathNative.lnLibm(
      (coalesce(col("c12"), lit(0L)).cast("double") + lit(1.0)) /
        (coalesce(col("c1"), lit(0L)).cast("double") +
          lit(nv.toDouble)))).cast("long")
    big
      .join(model.select("w1", "w2", "c12"), Seq("w1", "w2"), "left")
      .join(pc, Seq("w1"), "left")
      .select(col(idCol), micros.as("m"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("m")).as("nll_sum_micros"))
      .withColumn("mean_nll_micros", expr("nll_sum_micros div n_bigrams"))
      .withColumn("bucket",
        when(col("mean_nll_micros") <= cutH, lit("head"))
          .when(col("mean_nll_micros") <= cutM, lit("middle"))
          .otherwise(lit("tail")))
  }

  /** STREAMING-SAFE curriculum assignment against the FROZEN t27
    * artifact: every document gets its stage (from the frozen
    * cut-points — a row-local compare, no global rank) and its
    * reproducible md5 shuffle key. This is the per-micro-batch shape:
    * a document arriving AFTER the cut-points froze is assignable
    * immediately, and sorting any accumulated assignment set by
    * (stage, k, id) reproduces the batch curriculum's order exactly
    * (StreamingSpec pins stream == batch through this property).
    *
    * @return (id, bucket, stage, k)
    */
  def curriculumAssignFromArtifact(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, dir: String,
      seed: String): DataFrame =
    bigramLmBucketsFromArtifact(spark, docs, idCol, textCol, dir)
      .withColumn("stage",
        when(col("bucket") === "head", lit(0))
          .when(col("bucket") === "middle", lit(1)).otherwise(lit(2)))
      .withColumn("k",
        md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))))
      .select(col(idCol), col("bucket"), col("stage"), col("k"))

  /** Batch curriculum over the FROZEN artifact (p30): the same stage/
    * key assignment as [[curriculumAssignFromArtifact]], materialized
    * to global 0-based positions with the distributed range-partition
    * rank (no single-partition window — the p29 shape). Differs from
    * [[qualityCurriculum]] only in WHERE the buckets come from: frozen
    * ingest-time cut-points instead of a same-pass tercile rank, which
    * is what makes the assignment reproducible for late arrivals.
    *
    * @return (id, bucket, pos)
    */
  def curriculumFromArtifact(spark: SparkSession, docs: DataFrame,
      idCol: String, textCol: String, dir: String,
      seed: String): DataFrame = {
    val assigned =
      curriculumAssignFromArtifact(spark, docs, idCol, textCol, dir, seed)
    Packing.withGlobalRowNumber(assigned, "__rn", Seq("stage", "k", idCol))
      .withColumn("pos", col("__rn") - lit(1L))
      .select(col(idCol), col("bucket"), col("pos"))
  }

  /** PII scrubbing patterns — deliberately conservative RE2-compatible
    * regexes (no lookaround, no backreferences) so the same pattern text
    * runs identically under Spark's Java regex and the DuckDB oracle's
    * RE2. Order matters: emails before digit runs (an email's local part
    * may contain digits), IPs before digit runs (dotted quads). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val LongDigitPattern = "\\b[0-9]{9,}\\b"

  /** Redact emails, IPv4 addresses, and long digit runs (ids, phone-ish
    * numbers) to typed placeholder tokens — the scrubbing pass a
    * training-data pipeline runs before publication. Pure codegen'd
    * column expressions, partition-local, zero shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      LongDigitPattern, "<ID>")

  /** How many of each PII class a document carries (emails, IPs, long
    * digit runs) — the triage signal for routing docs to redaction. */
  def piiCounts(text: Column): (Column, Column, Column) =
    (size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long"),
     size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("long"),
     size(regexp_extract_all(regexp_replace(
         regexp_replace(text, EmailPattern, "<EMAIL>"), Ipv4Pattern, "<IP>"),
       lit(LongDigitPattern), lit(0))).cast("long"))

  /** Gopher-style document-quality RULE FLAGS (Rae et al. 2021 §A1.1,
    * adapted to word-level signals — the fixture corpus has no line
    * structure): word-count bounds, mean-word-length bounds, minimum
    * alphabetic-word fraction, minimum stopword presence. Every rule is
    * an exact-integer comparison (ratios become cross-multiplications:
    * `alpha/words > 4/5` ⇔ `5*alpha > 4*words`), so the boolean flags
    * are bit-identical on any engine — no float thresholds to drift.
    * Complements [[qualityFeatures]] (soft score) and
    * [[repetitionSignals]] (repetition rules) with the hard gate a
    * curation pipeline filters on. Pure codegen'd column expressions,
    * partition-local, zero shuffle.
    *
    * @return df + (n_words, chars_no_ws, alpha_words, n_stopwords,
    *         flag_n_words, flag_word_len, flag_alpha, flag_stopwords,
    *         keep)
    */
  def gopherFlags(df: DataFrame, text: Column): DataFrame = {
    val toks = tokens(text)
    val stopArr = array(Stopwords.map(lit): _*)
    df.withColumn("n_words", size(toks).cast("long"))
      .withColumn("chars_no_ws",
        length(regexp_replace(text, "\\s+", "")).cast("long"))
      .withColumn("alpha_words",
        size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("n_stopwords",
        size(filter(toks, t => array_contains(stopArr, t))).cast("long"))
      // 50 <= words <= 100000 (Gopher's doc-length gate)
      .withColumn("flag_n_words",
        col("n_words") >= 50 && col("n_words") <= 100000)
      // 3 <= mean word length <= 10, exactly: 3n <= chars <= 10n
      .withColumn("flag_word_len",
        col("chars_no_ws") >= col("n_words") * 3 &&
          col("chars_no_ws") <= col("n_words") * 10)
      // > 80% of words contain an alphabetic character: 5*alpha > 4*n
      .withColumn("flag_alpha",
        col("alpha_words") * 5 > col("n_words") * 4)
      // at least 2 stopword occurrences (Gopher's "2 of the required
      // stopwords" presence check)
      .withColumn("flag_stopwords", col("n_stopwords") >= 2)
      .withColumn("keep",
        col("flag_n_words") && col("flag_word_len") &&
          col("flag_alpha") && col("flag_stopwords"))
  }

  /** KMV distinct-cardinality sketch per group — the sketch path for
    * "how many distinct shingles/tokens does each source contribute" at
    * corpus scale, where an exact count(DISTINCT) would shuffle every
    * item. One generator explode → bounded [[graft.functions.KMinLongs]]
    * sketch (k longs per group per partition map-side) → closed-form
    * estimate. Emits the sketch size, the KMV estimate, and the exact
    * distinct count (exact is affordable at test scale and lets the
    * oracle grade the estimator itself — at 100 TB you'd drop it).
    * All-integer: the estimate is one HUGEINT-style decimal division,
    * replayed exactly by the oracle. */
  def kmvDistinctCardinality(df: DataFrame, groupCol: String, items: Column,
      k: Int = 128): DataFrame = {
    val kmin = udaf(new graft.functions.KMinLongs(k))
    val two64 = "CAST('18446744073709551616' AS DECIMAL(38,0))"
    val hashed = df.select(col(groupCol),
      explode(graft.functions.SimHash.tokenHash64(items)).as("h"))
    hashed.groupBy(col(groupCol))
      .agg(kmin(col("h")).as("sk"),
        countDistinct(col("h")).as("exact_distinct"))
      .withColumn("sketch_size", size(col("sk")).cast("long"))
      .withColumn("u_k", expr(
        s"CAST(element_at(sk, $k) AS DECIMAL(38,0)) + " +
          s"CASE WHEN element_at(sk, $k) < 0 THEN $two64 ELSE CAST(0 AS DECIMAL(38,0)) END"))
      .withColumn("est_distinct", expr(
        s"CASE WHEN sketch_size < $k THEN sketch_size " +
          s"ELSE CAST(floor(CAST(${k - 1} AS DECIMAL(38,0)) * $two64 / u_k) AS BIGINT) END"))
      .select(col(groupCol), col("sketch_size"), col("est_distinct"),
        col("exact_distinct"))
  }

  /** Cross-source overlap estimation from KMV sketches (Beyer et al.,
    * SIGMOD 2007 multiset-operation estimators): pairwise shingle-set
    * Jaccard and intersection size between every pair of sources,
    * computed from the per-source k-minimum-values synopses ALONE — the
    * sketches are the only thing compared, never the shingle sets. This
    * is how a 100 TB lake answers "how much does crawl A overlap crawl
    * B" for every source pair: one bounded-sketch aggregation over the
    * corpus (k longs per source), then pure array arithmetic on the
    * tiny source×source grid.
    *
    * Estimator: L = k smallest of K_A ∪ K_B (the union's own KMV
    * sketch, computable from the two sketches — closure under union is
    * THE KMV property); ρ = |L ∩ K_A ∩ K_B| / |L| estimates J(A,B);
    * est|A∪B| from L's k-th value; est|A∩B| = ρ·est|A∪B|. Every step is
    * integer-exact on md5-derived hashes, so a SQL oracle replays the
    * sketches and both estimates bit-for-bit. With `includeExact` the
    * exact overlap rides along (affordable at test scale, lets the
    * oracle grade the estimator); pass false at scale — the exact path
    * is a second corpus scan plus a (source, hash) self-join, precisely
    * the cost the sketches exist to avoid, and the column comes back 0.
    *
    * Unsigned-order trick: sketches hold signed longs in UNSIGNED KMV
    * order; XOR with Long.MinValue maps them to signed order, so
    * array_sort/array_union implement the unsigned merge natively.
    *
    * @return (source_a, source_b, union_sketch_size, jaccard_ppm,
    *         est_overlap, exact_overlap) with source_a < source_b
    */
  def kmvSourceOverlap(df: DataFrame, groupCol: String, items: Column,
      k: Int = 128, includeExact: Boolean = true): DataFrame = {
    val kmin = udaf(new graft.functions.KMinLongs(k))
    val two64 = "CAST('18446744073709551616' AS DECIMAL(38,0))"
    val hashed = df.select(col(groupCol),
      explode(graft.functions.SimHash.tokenHash64(items)).as("h"))
    val sketches = hashed.groupBy(col(groupCol)).agg(kmin(col("h")).as("sk"))
    // exact pairwise overlap: distinct (source, hash) self-joined on hash
    lazy val dh = hashed.distinct()
    val exact =
      if (!includeExact)
        // type-correct empty relation: the left join below then yields
        // exact_overlap = 0 for every pair without a second corpus scan
        sketches.select(col(groupCol).as("source_a"))
          .crossJoin(sketches.select(col(groupCol).as("source_b")))
          .withColumn("exact_overlap", lit(0L))
          .limit(0)
      else dh.select(col(groupCol).as("source_a"), col("h"))
        .join(dh.select(col(groupCol).as("source_b"), col("h")), Seq("h"))
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("exact_overlap"))
    val flip = (c: Column) =>
      transform(c, x => x.bitwiseXOR(lit(Long.MinValue)))
    val pairs = sketches
      .select(col(groupCol).as("source_a"), flip(col("sk")).as("fa"))
      .crossJoin(broadcast(sketches
        .select(col(groupCol).as("source_b"), flip(col("sk")).as("fb"))))
      .filter(col("source_a") < col("source_b"))
      .withColumn("l", slice(array_sort(array_union(col("fa"), col("fb"))),
        1, k))
      .withColumn("union_sketch_size", size(col("l")).cast("long"))
      .withColumn("inter_cnt", size(filter(col("l"),
        v => array_contains(col("fa"), v) && array_contains(col("fb"), v)))
        .cast("long"))
      // unflip the k-th union value back to its unsigned decimal
      // (try_element_at: null, not an ANSI error, when the union sketch
      // is shorter than k — the estimator branch is not taken then)
      .withColumn("u_raw", expr(
        s"try_element_at(l, $k) ^ CAST('${Long.MinValue}' AS BIGINT)"))
      .withColumn("u_k", expr(
        s"CAST(u_raw AS DECIMAL(38,0)) + CASE WHEN u_raw < 0 " +
          s"THEN $two64 ELSE CAST(0 AS DECIMAL(38,0)) END"))
      .withColumn("est_union", expr(
        s"CASE WHEN union_sketch_size < $k THEN union_sketch_size " +
          s"ELSE CAST(floor(CAST(${k - 1} AS DECIMAL(38,0)) * $two64 / u_k) AS BIGINT) END"))
      // integer-exact ppm and overlap: DECIMAL intermediates, `div` floor
      .withColumn("jaccard_ppm", expr(
        "inter_cnt * CAST(1000000 AS BIGINT) div union_sketch_size"))
      .withColumn("est_overlap", expr(
        "CAST(floor(CAST(inter_cnt AS DECIMAL(38,0)) * " +
          "CAST(est_union AS DECIMAL(38,0)) / union_sketch_size) AS BIGINT)"))
    pairs
      .join(exact, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"), col("union_sketch_size"),
        col("jaccard_ppm"), col("est_overlap"),
        coalesce(col("exact_overlap"), lit(0L)).as("exact_overlap"))
  }

  /** Deterministic stratified train/valid/test split: every document
    * hashes to a 16-bit value from md5(salt:source:id) and lands in a
    * split by fixed integer thresholds (train < 52429 ≈ 80%,
    * valid < 58982 ≈ 10%, else test). Hashing WITHIN the source stratum
    * makes per-source proportions independent of corpus mixture; the
    * assignment is a pure partition-local expression (zero shuffle, no
    * RNG state), stable under re-runs, appends, and repartitioning —
    * the reproducible-split contract a training pipeline needs.
    */
  def stratifiedSplit(df: DataFrame, idCol: String, stratumCol: String,
      salt: String): DataFrame = {
    val h = conv(substring(md5(concat(
      lit(salt + ":"), col(stratumCol), lit(":"),
      col(idCol).cast("string"))), 1, 4), 16, 10).cast("int")
    df.withColumn("split",
      when(h < 52429, "train").when(h < 58982, "valid").otherwise("test"))
  }

  /** Corpus-wide BPE pair statistics — the counting core of byte-pair-
    * encoding tokenizer training: every adjacent character pair inside
    * every whitespace token, counted across the corpus, top-N by
    * frequency (count DESC, pair ASC tie-break — a deterministic merge
    * order). One BPE training iteration = take the top pair, merge,
    * recount; this operator is that iteration's scan, and re-running it
    * on merged text iterates the training loop.
    *
    * Scale shape: a generator explode of (token → pairs) built from
    * codegen'd `transform(sequence(...))` (no UDF), then one
    * aggregation whose shuffle carries only (pair, partial-count) over
    * a tiny key domain (≤ alphabet², heavily map-side combined), then
    * TakeOrderedAndProject for the top-N — no global sort, nothing
    * driver-side. Counts are exact integers; the oracle replays them
    * bit-for-bit.
    *
    * @return (pair, c) — at most topN rows
    */
  def bpePairStats(df: DataFrame, textCol: String, topN: Int): DataFrame = {
    val toks = df.select(explode(tokens(col(textCol))).as("tok"))
      // a 1-char token has no pair; Spark's sequence(1, 0) would count
      // DOWN ([1,0]) rather than return empty like generate_series
      .filter(length(col("tok")) >= 2)
    toks.select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("pair"))
      .limit(topN)
  }

  /** BPE tokenizer TRAINING (Sennrich et al. ACL'16): learn `iters`
    * merge rules by iterated exact pair counting — the verb pair t14's
    * single-scan pair stats only started.
    *
    * The corpus is scanned ONCE into the word-frequency table (the
    * Sennrich formulation: pair counts are Σ over DISTINCT words of
    * in-word occurrences × word count), so every training iteration
    * runs at VOCABULARY scale, not corpus scale — the property that
    * makes T iterations affordable at 100 TB. Segmentations are
    * represented as boundary-wrapped strings (word "low" → "|l||o||w|")
    * and one merge (a,b) is `replace(rep, "|a||b|", "|ab|")` — string
    * replace is leftmost non-overlapping, which IS BPE's in-word merge
    * order, and the doubled separators make token boundaries unambiguous
    * (a match cannot start or end inside a longer token). Ties in the
    * pair argmax break (count DESC, a ASC, b ASC) so the learned table
    * is a pure function of the corpus; every stage is exact-integer and
    * string-literal arithmetic, so a DuckDB oracle replays training end
    * to end with `iters` unrolled CTE stages (the merge applied at stage
    * r comes from stage r's own argmax via a CROSS JOIN — no literals
    * needed).
    *
    * Words containing the separator char '|' are excluded up front (the
    * oracle replays the same guard); merged tokens never contain '|' by
    * construction.
    *
    * @return the learned merges in application order
    */
  def bpeLearnMerges(df: DataFrame, textCol: String,
      iters: Int): Seq[(String, String)] = {
    var rep = bpeWordTable(df, textCol).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 0 until iters) {
      val top = bpePairCounts(rep).limit(1).collect()
      if (top.nonEmpty) {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        rep = rep.withColumn("rep", call_function("replace", col("rep"),
            lit(s"|$a||$b|"), lit(s"|$a$b|")))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** BATCHED BPE training — the scale path [[bpeLearnMerges]]'s
    * 2-jobs-per-merge loop cannot take (a 32k-vocab tokenizer would be
    * ~10⁵ Spark jobs): each ROUND runs ONE pair-count scan, collects the
    * `candK` top candidates, and accepts up to `batchR` of them by a
    * deterministic greedy independence rule — a candidate is accepted
    * iff it does not INTERACT with any already-accepted merge of this
    * round, where (x,y) interacts with (a,b) iff they share a token
    * (x,y,a,b collide) or either concatenation equals one of the other's
    * tokens (xy ∈ {a,b} or ab ∈ {x,y} — the merged-token collision that
    * would let one application change the other's count). The round's
    * accepted merges take the next ranks; each round's segmentation is
    * then RE-DERIVED from the pristine word table by the constant-depth
    * [[graft.functions.BpeSegment]] greedy apply (≡ replaying the
    * cumulative table in rank order — see its Scaladoc), so no stage of
    * training builds an expression whose depth grows with the
    * vocabulary: a 32k-merge round is the same 4-node plan as an
    * 8-merge round.
    *
    * Equivalence argument (and the documented deviation): within a
    * round every accepted merge's count is EXACT at round start, and
    * pairwise non-interaction makes the applications commute — no
    * accepted merge changes another's count or pattern, so each merge
    * is applied under exactly the statistics it was selected on. The
    * deviation from strict-sequential BPE: counts are frozen per round,
    * so a pair whose count would have RISEN past a later accepted
    * candidate mid-round (only possible for pairs involving a
    * just-merged token) waits for the next round's exact recount; a
    * skipped interacting pair likewise re-competes next round with
    * fresh counts. The learned table is a pure function of (corpus,
    * rounds, batchR, candK) — every stage is deterministic, so the
    * DuckDB oracle replays training end to end: the same greedy runs as
    * a single-row-chain RECURSIVE CTE over the ranked candidates and
    * the batch applies via `list_reduce` (PipelineQueries t23).
    *
    * @return the learned merges in application order (round-major,
    *         rank order within a round)
    */
  def bpeLearnMergesBatched(df: DataFrame, textCol: String, rounds: Int,
      batchR: Int, candK: Int): Seq[(String, String)] =
    bpeLearnMergesToTarget(df, textCol, maxRounds = rounds,
      batchR = batchR, candK = candK, target = Int.MaxValue)

  /** [[bpeLearnMergesBatched]] with an early-stop merge-count target —
    * the production entry point: "learn a 32k vocabulary" instead of
    * "run N rounds". Stops after the first round that reaches `target`
    * merges (or when a round accepts nothing: corpus saturated), so the
    * learned table is identical to the uncapped run's prefix-by-rounds.
    *
    * The per-candidate independence check is hash-set based (a
    * candidate (a,b) is rejected iff a or b is a token of an accepted
    * merge, a or b IS an accepted concatenation, or a+b is an accepted
    * token) — O(1) per candidate, logically identical to the pairwise
    * rule t23's oracle replays, so candK can be vocabulary-sized
    * without a quadratic driver-side stall.
    *
    * `tieSweep` (off for the t23-compatible path): strict independence
    * throttles hard on a small alphabet — acceptance per round is
    * bounded by the live token pool, which only grows through merges
    * (measured ~7%/round on a 16-symbol hex corpus: reaching 32k would
    * take ~65 scans). But BELOW count 2 the frequency signal is
    * exhausted: every remaining candidate is an exact tie, and
    * strict-sequential BPE's choice among ties is pure tie-break
    * order anyway. With tieSweep on, the count-1 tier is accepted IN
    * BULK in the same deterministic (a, b) order, counts frozen for
    * the round (documented deviation: overlapping count-1 rules may
    * shadow each other when applied in rank order — a shadowed rule is
    * dead where overlapped, never wrong). Consistency is unaffected: a
    * candidate can only reference tokens that existed at round start,
    * so every merge still builds on strictly lower ranks and the
    * greedy apply remains identical to the rank-order replay (BpeSpec
    * verifies exactly this on the swept 33k table). */
  def bpeLearnMergesToTarget(df: DataFrame, textCol: String,
      maxRounds: Int, batchR: Int, candK: Int,
      target: Int, tieSweep: Boolean = false): Seq[(String, String)] = {
    require(maxRounds > 0 && batchR > 0 && candK >= batchR && target > 0)
    val words = bpeWordTable(df, textCol)
      .select(col("w"), col("wc")).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var saturated = false
    while (round < maxRounds && merges.size < target && !saturated) {
      val segs = words.select(col("wc"),
        Bpe.segments(col("w"), merges.toSeq).as("segs"))
      val cand = bpePairCountsFromSegs(segs).limit(candK).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val usedTok = scala.collection.mutable.Set.empty[String]
      val usedCat = scala.collection.mutable.Set.empty[String]
      val acc = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      for ((a, b, c) <- cand if acc.size < batchR) {
        val sweep = tieSweep && c <= 1L
        val interacts = !sweep && (usedTok(a) || usedTok(b) ||
          usedCat(a) || usedCat(b) || usedTok(a + b))
        if (!interacts) {
          acc += ((a, b))
          if (!sweep) { usedTok += a; usedTok += b; usedCat += a + b }
        }
      }
      if (acc.isEmpty) saturated = true else merges ++= acc
      round += 1
    }
    merges.toSeq
  }

  /** Staged tokenizer-artifact table name, content-keyed by the merge
    * table itself. */
  def bpeMergesStagedTable(dir: String,
      merges: Seq[(String, String)]): String = {
    val content = dir + "|" +
      merges.map { case (a, b) => a + "," + b }.mkString(";")
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(content.getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    s"bpe_merges_$tag"
  }

  private val bpeMergesStagedKeys =
    scala.collection.mutable.Set.empty[(String, String)]

  /** Persist a learned merge table as a tiny (rank, a, b) parquet table
    * — the TOKENIZER itself as an ingest artifact (vocabulary-scale; the
    * third leg after t22's staged encodings and s20/s21/s22's staged
    * indexes): a fresh engine reads the table back and applies the
    * identical tokenizer without retraining. */
  def ensureBpeMergesStaged(spark: SparkSession, dir: String,
      merges: Seq[(String, String)]): Unit =
    bpeMergesStagedKeys.synchronized {
      val table = bpeMergesStagedTable(dir, merges)
      val key = (graft.SessionKey.of(spark), table)
      if (!bpeMergesStagedKeys(key)) {
        spark.sql(s"DROP TABLE IF EXISTS `$table`")
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), table)
        loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(loc, true)
        import spark.implicits._
        merges.zipWithIndex
          .map { case ((a, b), i) => (i + 1L, a, b) }
          .toDF("rank", "a", "b")
          .coalesce(1)
          .write.mode("overwrite").format("parquet").saveAsTable(table)
        bpeMergesStagedKeys += key
      }
    }

  /** Load a staged merge table back in APPLICATION order (rank ASC) —
    * bounded collect, like the centroid/codebook loads. */
  def bpeMergesFromStaged(spark: SparkSession, table: String)
      : Seq[(String, String)] =
    spark.table(table).orderBy(col("rank"))
      .select(col("a"), col("b")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq

  private val bpeTargetCache =
    scala.collection.mutable.Map.empty[(String, String), Seq[(String, String)]]

  /** Content tag for the t25 artifacts: training parameters + a cheap
    * corpus fingerprint (slice row count), so a fresh session can tell
    * a reusable staged tokenizer from a stale one. */
  private def bpeArtifactTag(target: Int, sliceRows: Long): String =
    s"v1|target=$target|sliceRows=$sliceRows"

  private def artifactLoc(spark: SparkSession,
      table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)

  /** Local-filesystem glob over a staged artifact's parquet files, for
    * DuckDB oracle consumption. Derived from the SAME
    * `spark.sql.warehouse.dir` the staging helpers write under — a
    * CWD-relative "spark-warehouse" guess diverges the moment the
    * warehouse is configured anywhere else. Falls back to the Spark
    * default only when no session exists yet. */
  def stagedArtifactGlob(table: String): String = {
    val wh = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.conf.get("spark.sql.warehouse.dir"))
      .getOrElse(new java.io.File("spark-warehouse").getAbsolutePath)
    val local = new org.apache.hadoop.fs.Path(wh).toUri.getPath
    s"$local/$table/*.parquet"
  }

  /** The _GRAFT_TAG of a complete (_SUCCESS) staged artifact dir, if
    * present. */
  private def stagedTagOf(spark: SparkSession,
      table: String): Option[String] = {
    val loc = artifactLoc(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tagFile = new org.apache.hadoop.fs.Path(loc, "_GRAFT_TAG")
    if (fs.exists(new org.apache.hadoop.fs.Path(loc, "_SUCCESS")) &&
        fs.exists(tagFile)) {
      val in = fs.open(tagFile)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    } else None
  }

  /** Is a staged artifact directory present, complete (_SUCCESS), and
    * tagged with the expected content key (_GRAFT_TAG)? */
  private def stagedDirValid(spark: SparkSession, table: String,
      tag: String): Boolean =
    stagedTagOf(spark, table).contains(tag)

  private def writeTag(spark: SparkSession, table: String,
      tag: String): Unit = {
    val loc = artifactLoc(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new org.apache.hadoop.fs.Path(loc, "_GRAFT_TAG"),
      true)
    try out.write(tag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Fixed artifact table name for the t25 merge table. */
  def bpeTargetMergesTable(dir: String): String =
    "t25_merges_" +
      new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")

  /** Train a production-scale (target-merge-count) tokenizer ONCE per
    * sf directory and PERSIST it — the t24 tokenizer-as-artifact
    * contract at real vocabulary size: training is an ingest cost, and
    * a fresh engine (the per-round bench is one) reads the (rank, a,
    * b) table back instead of retraining. An underscore-prefixed tag
    * file records (params, training-slice row count) so a stale or
    * torn artifact retrains instead of serving wrong merges. */
  def ensureBpeTargetTrained(spark: SparkSession, dir: String,
      train: DataFrame, textCol: String, target: Int): Seq[(String, String)] =
    bpeTargetCache.synchronized {
      bpeTargetCache.getOrElseUpdate(
        (graft.SessionKey.of(spark), s"$dir#$target"), {
          val table = bpeTargetMergesTable(dir)
          val sliceRows = train.count()
          val tag = bpeArtifactTag(target, sliceRows)
          if (stagedDirValid(spark, table, tag)) {
            import spark.implicits._
            spark.read.parquet(artifactLoc(spark, table).toString)
              .orderBy(col("rank")).select(col("a"), col("b"))
              .as[(String, String)].collect().toSeq
          } else {
            val merges = bpeLearnMergesToTarget(train, textCol,
              maxRounds = 24, batchR = 16384, candK = 65536,
              target = target, tieSweep = true)
            import spark.implicits._
            spark.sql(s"DROP TABLE IF EXISTS `$table`")
            val loc = artifactLoc(spark, table)
            loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(loc, true)
            merges.zipWithIndex
              .map { case ((a, b), i) => (i + 1L, a, b) }
              .toDF("rank", "a", "b")
              .repartition(1)
              .write.mode("overwrite").format("parquet").saveAsTable(table)
            writeTag(spark, table, tag)
            merges
          }
        })
    }

  /** Tokenizer-quality evaluation — FERTILITY (tokens per word) and
    * COMPRESSION (chars per token) per document group, the standard
    * metrics a tokenizer ships with (SentencePiece reports fertility;
    * compression ratio is the GPT-family yardstick). High fertility on
    * a language/source = the vocabulary underfits it — exactly the
    * signal a multilingual data pipeline balances mixtures on.
    *
    * Scale shape: segmentation runs at VOCABULARY scale only (distinct
    * words through the broadcast-merge-map [[graft.functions.Bpe]]
    * expression — constant plan depth at any vocab size); corpus-scale
    * work is one compact (group, word) count and one join back; the
    * ratios quantize to integer micros via integer division, replaying
    * bit-exactly in the oracle.
    *
    * @return (group, n_words, n_chars, n_bpe, fertility_micros,
    *         chars_per_tok_micros)
    */
  def tokenizerEval(df: DataFrame, groupCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val occ = df.select(col(groupCol), explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1 && !col("w").contains("|"))
      .groupBy(col(groupCol), col("w")).agg(count(lit(1)).as("wc"))
    val dw = occ.select(col("w")).distinct()
      .withColumn("nseg", size(Bpe.segments(col("w"), merges)).cast("long"))
      .withColumn("wlen", length(col("w")).cast("long"))
    occ.join(dw, Seq("w"))
      .groupBy(col(groupCol))
      .agg(sum(col("wc")).as("n_words"),
        sum(col("wc") * col("wlen")).as("n_chars"),
        sum(col("wc") * col("nseg")).as("n_bpe"))
      // quotient/remainder composition instead of (1e6 * total):
      // a single group can hold >9.2e12 tokens at 100 TB, and the
      // direct product would wrap Int64 silently (DuckDB would raise)
      .withColumn("fertility_micros", expr(
        "(n_bpe div n_words) * 1000000 + " +
          "((n_bpe % n_words) * 1000000) div n_words"))
      .withColumn("chars_per_tok_micros", expr(
        "(n_chars div n_bpe) * 1000000 + " +
          "((n_chars % n_bpe) * 1000000) div n_bpe"))
  }

  /** DIR-INDEPENDENT name (one table, the sfDir lives in the content
    * TAG): the oracle SQL is a static string that cannot know the
    * runtime dir, so a dir-suffixed name would point the oracle at the
    * wrong artifact whenever verify runs against any other fixture.
    * Staging against a different dir invalidates the tag and rewrites
    * this one table — the query stages immediately before the oracle
    * reads, so the glob is always the just-written artifact. */
  def wordSegsStagedTable(dir: String): String = "t25_word_segs"

  // CURRENT staged tag per (session, table) — a Map, not a grow-only
  // Set: retrain A -> B -> A in one session must re-check the on-disk
  // tag (a set retaining every tag ever staged would skip the check and
  // serve B's artifact under A's key)
  private val wordSegsStagedKeys =
    scala.collection.mutable.Map.empty[(String, String), String]

  /** Stage the FULL corpus's distinct-word segmentation under a merge
    * table as a (w, segs) parquet table — the oracle-decomposition
    * artifact for vocabulary-scale encode checks: DuckDB re-derives
    * vocabulary ids, positions, per-doc order, and checksums entirely
    * from (w, segs) + the raw corpus, trusting only the per-word
    * segmentation map, which BpeSpec pins exactly (chain-replay
    * equivalence) at 32k+ merges. Vocabulary-scale rows, written with
    * full parallelism (the oracle reads a *.parquet glob); reused
    * across sessions through the same tag check as the merge artifact
    * (keyed additionally by the merge-table size + first/last rule so
    * a retrained tokenizer invalidates the segmentation map). */
  def ensureWordSegsStaged(spark: SparkSession, dir: String,
      docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): Unit =
    wordSegsStagedKeys.synchronized {
      val table = wordSegsStagedTable(dir)
      val tag = s"v1|dir=$dir|merges=${merges.size}|" +
        s"first=${merges.headOption}|last=${merges.lastOption}"
      // the memo records the CURRENT tag per table: a session that
      // retrains (even back to a previously-seen merge table) must
      // re-check the on-disk tag, not trust any tag it ever staged
      val key = (graft.SessionKey.of(spark), table)
      if (!wordSegsStagedKeys.get(key).contains(tag)) {
        if (!stagedDirValid(spark, table, tag)) {
          spark.sql(s"DROP TABLE IF EXISTS `$table`")
          val loc = artifactLoc(spark, table)
          loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(loc, true)
          bpeWordTable(docs, textCol)
            .select(col("w"), Bpe.segments(col("w"), merges).as("segs"))
            .write.mode("overwrite").format("parquet").saveAsTable(table)
          writeTag(spark, table, tag)
        }
        wordSegsStagedKeys(key) = tag
      }
    }

  /** (w, wc, rep): distinct corpus words with counts and the
    * boundary-wrapped initial (per-character) segmentation. */
  private def bpeWordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1 && !col("w").contains("|"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
      .withColumn("rep", expr("concat('|', concat_ws('||', " +
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))), '|')"))

  /** Exact weighted adjacent-pair counts over the current segmentation,
    * ordered (count DESC, a, b) — head is the next merge. */
  private def bpePairCounts(rep: DataFrame): DataFrame =
    bpePairCountsFromSegs(rep.select(col("wc"),
      expr("split(substring(rep, 2, length(rep) - 2), '\\\\|\\\\|')")
        .as("segs")))

  /** The same counts from a (wc, segs array) segmentation table. */
  private def bpePairCountsFromSegs(segsDf: DataFrame): DataFrame =
    segsDf
      .filter(size(col("segs")) >= 2)
      .select(col("wc"), explode(expr(
        "transform(sequence(1, size(segs) - 1), i -> " +
          "struct(element_at(segs, i) AS a, element_at(segs, i + 1) AS b))"))
        .as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("wc"))
      .groupBy(col("a"), col("b")).agg(sum(col("wc")).as("c"))
      .orderBy(col("c").desc, col("a"), col("b"))

  /** BPE APPLY + vocabulary: segment every corpus word with a learned
    * merge table and report the resulting token vocabulary (top-N by
    * frequency). The merge table rides into the scan as ONE broadcast
    * rank map inside the native [[graft.functions.BpeSegment]]
    * expression (greedy lowest-rank apply ≡ rank-order replay for a
    * trained table — see its Scaladoc), so plan depth is CONSTANT in
    * the merge count and a real 32k–100k vocabulary applies in one
    * pass. Runs at vocabulary scale like training (occurrences weight
    * the distinct-word table).
    *
    * @return (seg, c) — topN BPE tokens by (count DESC, seg ASC)
    */
  def bpeVocab(df: DataFrame, textCol: String,
      merges: Seq[(String, String)], topN: Int): DataFrame = {
    bpeWordTable(df, textCol)
      .select(col("wc"),
        explode(Bpe.segments(col("w"), merges)).as("seg"))
      .groupBy(col("seg")).agg(sum(col("wc")).as("c"))
      .orderBy(col("c").desc, col("seg"))
      .limit(topN)
  }

  /** BPE ENCODE: the corpus as token-ID sequences — the operator every
    * training-data pipeline runs last and most often. Ids come from the
    * frequency-ranked vocabulary (id = rank by count DESC, seg ASC, the
    * deterministic assignment both engines can replay); each document's
    * exact id SEQUENCE is pinned by an order-sensitive checksum
    * Σ position·id (exact integers — any reorder, drop, or wrong id
    * changes it), so the compact (doc, n_bpe, checksum) result
    * hash-checks the full encoding without shipping id arrays.
    *
    * Scale shape: the corpus explodes to (doc, word-position) pairs ONCE
    * and to nothing finer — per-word id sums (Σ id, Σ (si+1)·id, segment
    * count) precompute on the VOCABULARY table, so the checksum
    * decomposes as Σ_words (base_w·Σid + Σ(si+1)·id) with base_w one
    * running sum of segment counts over the doc's words. The only
    * corpus-scale stages are the word explode, a broadcast join of three
    * longs, and the per-doc word window — segments never explode at
    * corpus scale. Words containing the separator are skipped on both
    * engines (the training guard).
    *
    * @return (id, n_bpe, id_checksum) per document
    */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val (wordSegs, vocabIds) = bpeSegVocab(df, textCol, merges)
    encodeChecksumTail(df, idCol, textCol, wordSegs, vocabIds)
  }

  /** [[bpeEncode]] reading the word segmentation back from the staged
    * (w, segs) artifact instead of re-segmenting — the serving form:
    * after ingest (ensureWordSegsStaged), encoding a corpus never runs
    * the tokenizer again; per-word stats join against the staged map
    * and only corpus-scale assembly remains. */
  def bpeEncodeFromStagedSegs(spark: SparkSession, dir: String,
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the table name is dir-INDEPENDENT (one shared artifact; the sfDir
    // lives in the tag), so the serve path must VALIDATE the tag before
    // reading: blindly serving another dir's segmentation would be
    // silently wrong whenever the vocabularies overlap (every word
    // joins, the missing-word guard never fires, wrong token ids)
    val table = wordSegsStagedTable(dir)
    val tagOk = stagedTagOf(spark, table).exists(_.contains(s"|dir=$dir|"))
    require(tagOk, s"staged word-segmentation artifact `$table` was not " +
      s"staged for $dir — run ensureWordSegsStaged for this corpus first")
    val segsOnly = spark.read.parquet(
      artifactLoc(spark, table).toString)
    val wc = df.select(explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1 && !col("w").contains("|"))
      .groupBy(col("w")).agg(count(lit(1)).as("wc"))
    // LOUD failure for corpus words missing from the staged map (the
    // encodeIdsTail strict contract): silent inner-join drops would
    // deflate n_bpe/checksums when serving a corpus that grew past the
    // staged segmentation
    val wordSegs = wc.join(segsOnly, Seq("w"), "left")
      .withColumn("segs", when(col("segs").isNull, expr(
        // \\' so the SQL sees an ESCAPED quote inside the literal — a
        // bare '' would merge the fragments into one constant string
        // and swallow the `w` column reference (the word would never be
        // named in the error)
        "raise_error(concat('BPE encode: word \\'', w, " +
          "'\\' missing from the staged segmentation map'))")
        .cast("array<string>")).otherwise(col("segs")))
      .localCheckpoint()
    val vocabIds = wordSegs
      .select(col("wc"), explode(col("segs")).as("seg"))
      .groupBy(col("seg")).agg(sum(col("wc")).as("c"))
      .withColumn("tok_id", row_number().over(
        Window.orderBy(col("c").desc, col("seg"))).cast("long"))
      .select(col("seg"), col("tok_id"))
    // NO forced broadcast of the per-word table here: t25's derived
    // corpus has corpus-PROPORTIONAL distinct words (hash-words never
    // repeat), so the word aggregate is not vocabulary-small — forcing
    // it into a broadcast build is exactly the plan that falls over at
    // 100 TB. AQE picks broadcast when it measures small, shuffle when
    // not (measured at sf1: the forced build was a ~200 MB broadcast).
    encodeChecksumTail(df, idCol, textCol, wordSegs, vocabIds,
      hintBroadcast = false)
  }

  /** Shared checksum-encode assembly over a precomputed segmentation.
    * `hintBroadcast`: natural-language corpora have vocabulary-small
    * word tables (force the broadcast, plan-asserted in PlanAuditSpec);
    * derived corpora with corpus-proportional distinct words must let
    * AQE decide. */
  private def encodeChecksumTail(df: DataFrame, idCol: String,
      textCol: String, wordSegs: DataFrame,
      vocabIds: DataFrame, hintBroadcast: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // per DISTINCT word: segment count, Σ id, Σ (si+1)·id — all at
    // vocabulary scale, so the corpus never joins ids per segment; the
    // id table is broadcast (≤ alphabet + merges rows) so the segment
    // explode never shuffles, and the compact result is materialized
    // once — broadcast() below would otherwise re-run the whole chain
    val wordAgg = wordSegs
      .select(col("w"), posexplode(col("segs")).as(Seq("si", "seg")))
      .join(broadcast(vocabIds), "seg")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("nseg"), sum(col("tok_id")).as("sid"),
        sum((col("si") + 1).cast("long") * col("tok_id")).as("swid"))
      .localCheckpoint()
    val words = df
      .select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("wi", "w")))
      .filter(length(col("w")) >= 1 && !col("w").contains("|"))
    // base_w = segments before this word in the doc (exclusive prefix);
    // word positions are unique per doc so the frame is deterministic
    val based = words.join(
        if (hintBroadcast) broadcast(wordAgg) else wordAgg, "w")
      .withColumn("base", coalesce(sum(col("nseg")).over(
        Window.partitionBy(col("id")).orderBy(col("wi"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    based.groupBy(col("id"))
      .agg(sum(col("nseg")).as("n_bpe"),
        sum(col("base") * col("sid") + col("swid")).as("id_checksum"))
      .select(col("id").as(idCol), col("n_bpe"), col("id_checksum"))
  }

  /** Shared BPE-encode derivation: the segmented distinct-word table
    * (vocabulary-scale; materialized ONCE — it feeds both the vocab-id
    * derivation and the per-word passes, and without the checkpoint each
    * branch re-runs the corpus word-count scan and the segmentation)
    * and the frequency-ranked vocabulary ids (id = rank by count DESC,
    * seg ASC — the bare rank window is bounded-small by construction:
    * alphabet + merges rows). */
  private def bpeSegVocab(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val wordSegs = bpeWordTable(df, textCol)
      .select(col("w"), col("wc"),
        Bpe.segments(col("w"), merges).as("segs"))
      .localCheckpoint()
    val vocabIds = wordSegs
      .select(col("wc"), explode(col("segs")).as("seg"))
      .groupBy(col("seg")).agg(sum(col("wc")).as("c"))
      .withColumn("tok_id", row_number().over(
        Window.orderBy(col("c").desc, col("seg"))).cast("long"))
      .select(col("seg"), col("tok_id"))
    (wordSegs, vocabIds)
  }

  /** BPE ENCODE, materialized: each document's full token-id SEQUENCE as
    * an `array<long>` column — the dataset a trainer actually consumes
    * ([[bpeEncode]]'s checksum proves an encoding; this one PRODUCES
    * it). Ids are the same frequency-ranked vocabulary assignment, so
    * the two operators agree row-for-row (their shared checksum is the
    * oracle surface: Σ position·id recomputed FROM the array pins
    * order, content, and length at once).
    *
    * Scale shape: the ordered per-word id ARRAYS assemble at VOCABULARY
    * scale (segment posexplode + id join run on the distinct-word
    * table), then broadcast into the corpus word explode — the corpus
    * never explodes to segments. The only corpus-scale shuffle is the
    * per-doc assembly aggregate, and it ships compact long arrays
    * (collect_list partials), never segmentation strings; the word
    * order is restored by sorting the (word-position, ids) structs
    * inside the aggregate, so the result is partitioning-independent.
    *
    * @return (id, token_ids array<long>) per document with ≥1 word
    */
  def bpeEncodeIds(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val (wordSegs, vocabIds) = bpeSegVocab(df, textCol, merges)
    encodeIdsTail(df, idCol, textCol, wordSegs, vocabIds, strict = false)
  }

  /** The frozen (seg, tok_id) vocabulary of a corpus under a merge
    * table — the OTHER half of a tokenizer artifact: ids must be pinned
    * at ingest alongside the merges, or two encode invocations over
    * different corpora assign different ids to the same token. */
  def bpeVocabIds(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame =
    bpeSegVocab(df, textCol, merges)._2

  /** [[bpeEncodeIds]] against a FROZEN vocabulary (the streaming-ingest
    * form: merges AND ids are ingest-time artifacts; new documents
    * encode against them without re-deriving anything). A segment with
    * no id in the frozen vocabulary fails LOUDLY (real tokenizers add
    * byte-fallback; silently dropping tokens would corrupt sequences). */
  def bpeEncodeIdsWithVocab(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)], vocabIds: DataFrame): DataFrame = {
    val wordSegs = bpeWordTable(df, textCol)
      .select(col("w"), col("wc"),
        Bpe.segments(col("w"), merges).as("segs"))
    encodeIdsTail(df, idCol, textCol, wordSegs, vocabIds, strict = true)
  }

  /** Shared assembly tail: per-word ordered id arrays at vocabulary
    * scale, broadcast into the corpus word explode, per-doc concat. */
  private def encodeIdsTail(df: DataFrame, idCol: String, textCol: String,
      wordSegs: DataFrame, vocabIds: DataFrame,
      strict: Boolean): DataFrame = {
    val joined = wordSegs
      .select(col("w"), posexplode(col("segs")).as(Seq("si", "seg")))
      .join(broadcast(vocabIds.select(col("seg"), col("tok_id"))),
        Seq("seg"), if (strict) "left" else "inner")
    val checked =
      if (strict)
        // raise_error is codegen'd and only evaluates on the null branch
        joined.withColumn("tok_id",
          when(col("tok_id").isNull, expr(
            "raise_error(concat('BPE encode: segment \\'', seg, " +
              "'\\' has no id in the frozen vocabulary'))")
            .cast("long"))
            .otherwise(col("tok_id")))
      else joined
    // per DISTINCT word: its ordered token-id array (vocabulary scale)
    val wordIds = checked
      .groupBy(col("w"))
      .agg(expr("transform(array_sort(collect_list(struct(si, tok_id))), " +
        "x -> x.tok_id)").as("ids"))
    val words = df
      .select(col(idCol).as("id"),
        posexplode(tokens(col(textCol))).as(Seq("wi", "w")))
      .filter(length(col("w")) >= 1 && !col("w").contains("|"))
    words.join(broadcast(wordIds), "w")
      .groupBy(col("id"))
      .agg(expr("flatten(transform(array_sort(collect_list(struct(wi, ids))), " +
        "x -> x.ids))").as("token_ids"))
      .select(col("id").as(idCol), col("token_ids"))
  }

  /** Staged token-id table name, content-keyed by (sfDir, merge table)
    * — the s19 ivfStagedTable convention, with the tokenizer in the key
    * because the encoding IS a function of the merges (two tokenizers
    * over one corpus are two different staged datasets). */
  def bpeStagedTable(dir: String, merges: Seq[(String, String)]): String = {
    val content = dir + "|" +
      merges.map { case (a, b) => a + "," + b }.mkString(";")
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(content.getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    s"bpe_token_ids_$tag"
  }

  private val bpeStagedKeys =
    scala.collection.mutable.Set.empty[(String, String)]

  /** Write [[bpeEncodeIds]]'s result ONCE per (session, sfDir, merges)
    * as a parquet table, range-partitioned by doc id so shard-ordered
    * training reads are sequential file scans (the s19 ingest pattern:
    * staging is an ingest cost, queries and fresh sessions read the
    * files). A killed JVM can leave the managed location while the
    * in-memory catalog forgets the table; drop both halves first. */
  def ensureBpeTokensStaged(spark: SparkSession, dir: String,
      docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): Unit =
    bpeStagedKeys.synchronized {
      val table = bpeStagedTable(dir, merges)
      val key = (graft.SessionKey.of(spark), table)
      if (!bpeStagedKeys(key)) {
        spark.sql(s"DROP TABLE IF EXISTS `$table`")
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), table)
        loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(loc, true)
        bpeEncodeIds(docs, idCol, textCol, merges)
          .repartitionByRange(col(idCol))
          .write.mode("overwrite").format("parquet").saveAsTable(table)
        bpeStagedKeys += key
      }
    }

  /** Overlapping token-window CHUNKING — the retrieval/RAG ingestion
    * verb: each document splits into windows of `window` tokens every
    * `stride` tokens (overlap = window − stride), the last window
    * truncated, single short docs yielding one chunk. Chunk text is
    * reported as an md5 fingerprint plus token offsets, so the result
    * stays compact and the oracle verifies the exact reconstruction of
    * every chunk.
    *
    * Scale shape: one generator explode per doc (chunk count =
    * ⌈(n−window)/stride⌉+1 rows of integer offsets), the chunk text
    * re-assembled by a codegen'd slice+concat over the doc's own token
    * array — no shuffle at all until a consumer aggregates; the explode
    * ships (doc, offsets, md5), never the full text per chunk.
    *
    * @return (id, chunk_idx, tok_start, n_toks, chunk_md5)
    */
  def ragChunks(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    df.select(col(idCol), tokens(col(textCol)).as("tk"))
      .withColumn("n", size(col("tk")).cast("long"))
      .filter(col("n") >= 1)
      .withColumn("chunk_idx", explode(expr(
        s"sequence(0L, CAST(greatest(ceil((n - $window) / $stride.0), 0) AS LONG))")))
      .withColumn("tok_start", col("chunk_idx") * stride)
      .withColumn("n_toks",
        least(lit(window.toLong), col("n") - col("tok_start")))
      .select(col(idCol), col("chunk_idx"), col("tok_start"), col("n_toks"),
        md5(expr(s"concat_ws(' ', slice(tk, CAST(tok_start + 1 AS INT), " +
          s"CAST(n_toks AS INT)))")).as("chunk_md5"))
  }

  /** TF-IDF keyword extraction: the `topK` highest-scoring terms of
    * every document, scored tf × ln((N+1)/(df+1)) — the classic
    * smoothed idf. The idf quantizes to integer micros straight off the
    * ln (LnLibm = platform libm = the oracle's ln), so the per-term
    * score tf·idf_micros is exact integer math and the ranking
    * (score DESC, term ASC) replays bit-for-bit in DuckDB.
    *
    * Scale shape: tf is one map-side-combined groupBy(doc, term); df
    * derives from tf by a second compact groupBy(term) — the term table
    * is vocabulary-sized (≪ corpus), so the tf↔idf equi-join BROADCASTS
    * the vocabulary rather than shuffling the postings; the final
    * per-doc top-k is a window over doc_id — rank k is tiny, and no
    * stage ever carries document text past tokenization.
    *
    * @return (id, rank, term, tf, score_micros), rank 1..topK per doc
    */
  def tfidfTopTerms(
      df: DataFrame, idCol: String, textCol: String,
      topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.count()
    val tf = df.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val idf = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      // mirrored literally in the SQL oracle: floor(1e6 * ln((N+1)/(df+1)))
      .select(col("term"), floor(lit(1000000.0) *
        graft.functions.MathNative.lnLibm(
          (lit(n) + lit(1.0)) / (col("df") + lit(1.0))))
        .cast("long").as("idf_micros"))
    tf.join(broadcast(idf), "term")
      .withColumn("score_micros", col("tf") * col("idf_micros"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("id"))
        .orderBy(col("score_micros").desc, col("term"))).cast("long"))
      .filter(col("rank") <= topK)
      .select(col("id").as(idCol), col("rank"), col("term"),
        col("tf"), col("score_micros"))
  }

  /** Temperature-scaled source mixture weights — the multilingual /
    * multi-source sampling-rate computation (alpha-smoothing with
    * α = 0.5): each source's token mass m_i gives p_i = m_i/T, its
    * sampling weight ∝ p_i^α, which up-weights small sources relative
    * to proportional sampling. α is fixed at 1/2 so the power is IEEE
    * `sqrt` (correctly rounded on every engine, unlike `pow`); the
    * sqrt quantizes to integer micros BEFORE normalization, so the
    * final ppm weights are order-free integer arithmetic and replay
    * exactly in the oracle.
    *
    * Scale shape: one map-side-combined groupBy(source) over token
    * counts (the only shuffle, carrying (source, long)); the two corpus
    * scalars (total tokens, total weight) reduce driver-side — they are
    * single numbers, the t11 pattern. Sources are few by construction
    * (domains, languages, crawls), so the weight table itself is tiny.
    *
    * @return (srcCol, n_tokens, w_micros, weight_ppm) — one row per source
    */
  def sourceMixtureWeights(df: DataFrame, srcCol: String, textCol: String): DataFrame =
    sourceMixtureWeightsFromCounts(
      df.select(col(srcCol), wordCount(col(textCol)).as("n")), srcCol)

  /** [[sourceMixtureWeights]] over PRE-COUNTED per-row token counts
    * (`srcCol`, `n` long) — lets a caller that already tokenized (p26's
    * curriculum, which needs per-doc counts anyway) derive the weights
    * without a second corpus text scan. */
  def sourceMixtureWeightsFromCounts(counted: DataFrame,
      srcCol: String): DataFrame = {
    val mass = counted
      .groupBy(col(srcCol)).agg(sum(col("n")).as("m"))
    val total = mass.agg(sum(col("m"))).head().getLong(0)
    // mirrored literally in the SQL oracle: floor(1e6 * sqrt(m/T))
    val q = mass.withColumn("w_micros",
      floor(lit(1000000.0) *
        sqrt(col("m").cast("double") / lit(total.toDouble))).cast("long"))
    val sw = q.agg(sum(col("w_micros"))).head().getLong(0)
    q.select(col(srcCol), col("m").as("n_tokens"), col("w_micros"),
      expr(s"w_micros * 1000000L div ${sw}L").as("weight_ppm"))
  }

  /** Temperature-scaled mixture RESAMPLE — the decision pass that makes
    * [[sourceMixtureWeights]] actionable: given a total token budget,
    * each source s gets target_s = budget · weight_ppm(s) tokens, and a
    * doc of s survives with probability target_s / m_s — decided by ONE
    * exact wide-decimal compare on the doc's salted md5 (the p20
    * mechanism), so the sample is deterministic, partitioning-
    * independent, and engine-replayable; expected kept tokens per
    * source equal the temperature-T=2 mixture regardless of document
    * length distribution (E[Σ_kept len] = p_s · m_s = target_s).
    * Rare sources are upweighted (sqrt flattening), dominant ones
    * downsampled — the standard LLM data-mixing step.
    *
    * Scale shape: the per-source weight table is source-cardinality
    * (broadcast); the keep decision is row-local codegen'd arithmetic —
    * zero shuffles beyond the weights aggregate itself.
    *
    * @return kept (id, source, n_toks) rows
    */
  def temperatureMixtureSample(docs: DataFrame, idCol: String,
      srcCol: String, textCol: String, targetTokens: Long,
      salt: String): DataFrame = {
    require(targetTokens > 0, s"targetTokens must be positive")
    val weights = sourceMixtureWeights(
        docs.select(col(srcCol), col(textCol)), srcCol, textCol)
      .withColumn("target_toks",
        expr(s"(${targetTokens}L * weight_ppm) div 1000000L"))
      .select(col(srcCol), col("n_tokens"), col("target_toks"))
    val h60 = conv(substring(
        md5(concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 15),
      16, 10).cast("decimal(19,0)")
    docs.join(broadcast(weights), srcCol)
      // keep iff h60 / 2^60 < target/m  ⟺  h60·m < 2^60·target, exact;
      // target at decimal(18,0) (19+18+1 = 38) so token budgets up to
      // 10^18 — comfortably past the 100 TB posture — don't overflow
      .filter(h60 * col("n_tokens").cast("decimal(18,0)") <
        expr("CAST('1152921504606846976' AS DECIMAL(19,0))") *
          col("target_toks").cast("decimal(18,0)"))
      .select(col(idCol), col(srcCol),
        wordCount(col(textCol)).as("n_toks"))
  }

  /** Deterministic curriculum interleave — the global TRAINING ORDER a
    * mixture ships as: within each source, docs order longest-first
    * (stand-in difficulty key; any integer per-doc score plugs in);
    * across sources, weighted fair queuing — doc r of source s is
    * scheduled at virtual finish time r·10⁶ div weight_ppm(s), so
    * sources appear throughout the stream proportionally to their
    * [[sourceMixtureWeights]] share instead of in blocks (the property
    * that keeps every training window on-mixture). All-integer
    * arithmetic; ties totalized by (vtime, source, r) so the order —
    * and the SQL oracle's — is unique.
    *
    * Scale shape: BOTH ranks run through
    * [[Packing.withGlobalRowNumber]]'s distributed prefix-sum scan
    * (range-partition + broadcast per-partition offsets). The per-source
    * longest-first rank is NOT a `Window.partitionBy(source)` — at
    * corpus scale that funnels a whole source (TBs for a 20-source
    * 100 TB mixture) through one window task. Instead: one global
    * prefix-sum rank over (source, n_toks desc, id) — per-source runs
    * are contiguous in that order — minus broadcast per-source start
    * offsets (one extra source-cardinality aggregate). The weight table
    * broadcasts at source cardinality, and the final position over
    * (vtime, source, r) — the only total order — is the same scan,
    * never a bare `Window.orderBy` single-partition funnel
    * (PlanAuditSpec pins the absence of both funnel shapes, the
    * p03/p06 contract).
    *
    * @return (pos, doc_id, source, r, vtime) in curriculum order
    */
  def curriculumInterleave(docs: DataFrame, idCol: String,
      srcCol: String, textCol: String): DataFrame =
    curriculumInterleaveFromCounts(
      docs.select(col(idCol), col(srcCol),
        wordCount(col(textCol)).as("n_toks")),
      idCol, srcCol)

  /** [[curriculumInterleave]] over PRE-COUNTED lengths — the form the
    * e02 ingest packet composes over the ENCODED corpus, where `n_toks`
    * is the real BPE token count of each document's materialized id
    * array rather than the whitespace proxy. Input: (id, src, n_toks). */
  def curriculumInterleaveFromCounts(counted0: DataFrame, idCol: String,
      srcCol: String): DataFrame = {
    // materialize ONCE: the counted projection feeds both the weights
    // aggregate and the rank scan (a second corpus scan otherwise)
    val counted = counted0.localCheckpoint()
    val weights = sourceMixtureWeightsFromCounts(
        counted.select(col(srcCol), col("n_toks").as("n")), srcCol)
      .select(col(srcCol), col("weight_ppm"))
    // distributed per-source rank: global scan over (src, -n_toks, id),
    // then r = gpos - (source's first gpos) + 1 — exact because the
    // global order groups each source contiguously
    val gpos = Packing.withGlobalRowNumber(
      counted.withColumn("__negtoks", -col("n_toks")),
      "__gpos", Seq(srcCol, "__negtoks", idCol))
    val starts = gpos.groupBy(col(srcCol))
      .agg(min(col("__gpos")).as("__start"))
    val ranked = gpos.join(broadcast(starts), srcCol)
      .withColumn("r", col("__gpos") - col("__start") + 1L)
      .drop("__gpos", "__negtoks", "__start")
    val vt = ranked.join(broadcast(weights), srcCol)
      .withColumn("vtime", expr("(r * 1000000L) div weight_ppm"))
    Packing.withGlobalRowNumber(vt, "pos", Seq("vtime", srcCol, "r"))
      .select(col("pos"), col(idCol), col(srcCol), col("r"), col("vtime"))
  }
}
