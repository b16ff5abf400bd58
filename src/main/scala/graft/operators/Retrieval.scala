package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MathNative

/** BM25 keyword retrieval — the lexical ranking half of a retrieval
  * pipeline (the dense half is operators/Similarity.scala). Standard
  * Robertson/Sparck-Jones BM25 with the +1 idf smoothing:
  *
  *   score(d) = Σ_t ln((N - df_t + 0.5)/(df_t + 0.5) + 1)
  *              · tf · (k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  *
  * Engine-exact scoring: every input (tf, df, dl, N, Σdl) is an exact
  * integer, every float op is IEEE-deterministic given the same
  * expression tree (mirrored token-for-token in the SQL oracle), and ln
  * runs through [[graft.functions.LnLibm]] (platform libm — Spark's
  * builtin uses StrictMath, 1 ulp off libm on ~4% of inputs). Per-term
  * scores are quantized to integer micros BEFORE the per-doc sum, so
  * the only float reduction becomes an order-free integer sum — the
  * same discipline as QuerySpec's decimal-aggregate convention.
  *
  * Scale shape: terms filter FIRST (pushed inside the scan projection),
  * so the (doc, term) shuffle carries only matching postings — |terms| ·
  * df rows, not the corpus; df and the corpus stats are tiny broadcast
  * sides; the final top-k is TakeOrderedAndProject, no global sort.
  *
  * @return (doc_id, score_micros) top `topK` by score desc, id asc
  */
object Retrieval {

  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      topK: Int): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("id"),
      TextAnalysis.tokens(col(textCol)).as("t"))
    // corpus stats: two exact integers to the driver, nothing else
    val statsRow = toks.agg(count(lit(1)), sum(size(col("t")).cast("long")))
      .head()
    val nDocs = statsRow.getLong(0)
    val avgdl = statsRow.getLong(1).toDouble / nDocs
    // postings: explode, keep query terms ONLY, then the one real shuffle
    val tf = toks
      .select(col("id"), size(col("t")).cast("long").as("dl"),
        explode(col("t")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    scoreAndRank(tf, df, nDocs, avgdl, topK, idCol)
  }

  /** The BM25 scoring tail shared by the per-query and the staged-index
    * paths: expression tree mirrored LITERALLY in the oracle SQL — same
    * association, same decimal literals (see PipelineQueries s07). */
  private def scoreAndRank(tf: DataFrame, df: DataFrame, nDocs: Long,
      avgdl: Double, topK: Int, idCol: String): DataFrame = {
    val idf = MathNative.lnLibm(
      (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val scoreMicros = floor(lit(1000000.0) * idf * (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / lit(avgdl))))
      .cast("long")
    tf.join(broadcast(df), "tok")
      .select(col("id"), scoreMicros.as("s"))
      .groupBy(col("id")).agg(sum(col("s")).as("score_micros"))
      .orderBy(col("score_micros").desc, col("id"))
      .limit(topK)
      .select(col("id").as(idCol), col("score_micros"))
  }

  // ---------------------------------------------------------------------
  // Persisted BM25 index: postings, document-frequency stats, and corpus
  // stats staged as tables at ingest — [[bm25TopK]] rebuilds all three
  // from the corpus per query, which at 100 TB is a full text scan per
  // keyword search. The staged serve path reads ONLY the query terms'
  // postings: the postings table is BUCKETED by token, so a `tok IN
  // (terms)` scan prunes whole buckets (the s19 file-pruning treatment
  // applied to the lexical index).

  /** Staged BM25 table names (postings, df-stats, corpus-stats),
    * content-keyed by sfDir. */
  def bm25StagedTables(dir: String): (String, String, String) = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    (s"bm25_postings_$tag", s"bm25_df_$tag", s"bm25_stats_$tag")
  }

  private val bm25StagedKeys =
    scala.collection.mutable.Set.empty[(String, String)]

  /** Build the inverted index ONCE per (session, sfDir): postings
    * (tok, id, dl, tf) bucketed by token, per-term document frequencies,
    * and the 1-row corpus stats (N, Σdl). One corpus scan total — the
    * df table derives from the postings, not the text. */
  def ensureBm25Staged(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String, nBuckets: Int = 16): Unit =
    bm25StagedKeys.synchronized {
      val (postT, dfT, statsT) = bm25StagedTables(dir)
      val key = (graft.SessionKey.of(spark), postT)
      if (!bm25StagedKeys(key)) {
        for (t <- Seq(postT, dfT, statsT)) {
          spark.sql(s"DROP TABLE IF EXISTS `$t`")
          val loc = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"), t)
          loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(loc, true)
        }
        val toks = docs.select(col(idCol).cast("long").as("id"),
          TextAnalysis.tokens(col(textCol)).as("t"))
        toks.agg(count(lit(1)).as("n"),
            sum(size(col("t")).cast("long")).as("tot"))
          .coalesce(1)
          .write.mode("overwrite").format("parquet").saveAsTable(statsT)
        toks
          .select(col("id"), size(col("t")).cast("long").as("dl"),
            explode(col("t")).as("tok"))
          .groupBy(col("id"), col("dl"), col("tok"))
          .agg(count(lit(1)).as("tf"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(nBuckets, "tok")
          .saveAsTable(postT)
        spark.table(postT).groupBy(col("tok"))
          .agg(count(lit(1)).as("df"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(nBuckets, "tok")
          .saveAsTable(dfT)
        bm25StagedKeys += key
      }
    }

  /** Serve a keyword query from the STAGED index: the postings scan's
    * `tok IN (terms)` prunes BUCKETS (only the terms' buckets are read
    * off disk — plan-asserted), df and stats are bounded lookups, and
    * the scoring tail is [[bm25TopK]]'s verbatim — the staged tf/df/dl
    * values are the same integers the per-query path derives, so the
    * result is identical and shares s07's oracle. */
  def bm25StagedTopK(spark: SparkSession, dir: String, docs: DataFrame,
      idCol: String, textCol: String, terms: Seq[String],
      topK: Int): DataFrame = {
    ensureBm25Staged(spark, dir, docs, idCol, textCol)
    val (postT, dfT, statsT) = bm25StagedTables(dir)
    val statsRow = spark.table(statsT).head()
    val nDocs = statsRow.getLong(0)
    val avgdl = statsRow.getLong(1).toDouble / nDocs
    val tf = spark.table(postT).filter(col("tok").isin(terms: _*))
    val df = spark.table(dfT).filter(col("tok").isin(terms: _*))
    scoreAndRank(tf, df, nDocs, avgdl, topK, idCol)
  }

  /** Positional-postings phrase search: every document containing the
    * exact token sequence `phrase`, with occurrence count and first
    * match position — the positional-inverted-index plan (Lucene's
    * PhraseQuery shape) expressed relationally. The corpus tokenizes
    * once into (doc, pos, tok) postings; an n-token phrase is n-1
    * EQUI-joins on (doc, pos - i), each side pre-filtered to one
    * token's posting list, so only the phrase's own postings ever
    * shuffle — the corpus text never moves, and a stopword-free phrase
    * keeps every join input tiny. At 100 TB the postings are the
    * materialized index (bucketed by token); this is the query-time
    * plan over them.
    *
    * @return (doc_id, n_matches, first_pos), first_pos 0-based
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val toks = docs.select(col(idCol).as("doc_id"),
      posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "tok")))
    val parts = phrase.zipWithIndex.map { case (t, i) =>
      toks.filter(col("tok") === t)
        .select(col("doc_id"), (col("pos") - i).cast("long").as("base"))
    }
    parts.reduce((a, b) => a.join(b, Seq("doc_id", "base")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"), min(col("base")).as("first_pos"))
  }
}
