package graft.operators

import org.apache.spark.sql.DataFrame
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
    // expression tree mirrored LITERALLY in the oracle SQL: same
    // association, same decimal literals — see PipelineQueries s07
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
