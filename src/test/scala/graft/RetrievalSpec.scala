package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval
import graft.sources.Tables

class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"
  val terms = Seq("vector", "stream", "merge", "window", "spark")

  test("bm25 matches a driver-side sequential reference") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val tokd = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val n = tokd.length.toLong
    val avgdl = tokd.map(_._2.size.toLong).sum.toDouble / n
    val tf = tokd.flatMap { case (id, ts) =>
      ts.filter(terms.contains).groupBy(identity).map {
        case (tok, xs) => (id, ts.size.toLong, tok, xs.size.toLong)
      }
    }
    val df = tf.groupBy(_._3).map { case (tok, xs) => tok -> xs.size.toLong }
    val perDoc = tf.groupBy(_._1).map { case (id, rows) =>
      id -> rows.map { case (_, dl, tok, f) =>
        val idf = java.lang.Math.log(
          (n - df(tok) + 0.5) / (df(tok) + 0.5) + 1.0)
        math.floor(1000000.0 * idf * (f * 2.2) /
          (f + 1.2 * (0.25 + 0.75 * dl / avgdl))).toLong
      }.sum
    }
    val want = perDoc.toSeq.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = Retrieval.bm25TopK(
        Tables.load(spark, dir, "documents").select($"doc_id", $"text"),
        "doc_id", "text", terms, topK = 20)
      .as[(Long, Long)].collect().toSeq
    assert(got == want)
  }

  test("bm25 plan: term filter precedes the shuffle, top-k avoids a global sort") {
    import spark.implicits._
    val plan = Retrieval.bm25TopK(
        Tables.load(spark, dir, "documents").select($"doc_id", $"text"),
        "doc_id", "text", terms, topK = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must not be a global Sort:\n$plan")
    // the postings filter must sit below the first aggregation exchange:
    // bottom-up print order puts the scan-side filter AFTER the exchange
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    val filterIdx = plan.lastIndexOf("Filter")
    assert(exIdx >= 0 && filterIdx > exIdx,
      s"terms filter must run before the shuffle:\n$plan")
  }

  test("phrase search: overlapping matches, repeated tokens, punctuation-" +
      "free exactness") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x a b a b a y"),   // "a b a" matches at 1 and 3 (overlap)
      (2L, "a b"),             // too short, prefix only
      (3L, "b a b a"),         // matches at 1
      (4L, "a a a a")          // no "a b a"
    ).toDF("doc_id", "text")
    val got = graft.operators.Retrieval
      .phraseSearch(docs, "doc_id", "text", Seq("a", "b", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L, 1L), (3L, 1L, 1L)))
    // repeated-token phrase on a run of the same token: "a a" overlaps
    val runs = graft.operators.Retrieval
      .phraseSearch(docs, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(runs == Set((4L, 3L, 0L)))
  }

  test("phrase-search plan: per-token filters precede every join " +
      "exchange - only the phrase's postings shuffle") {
    import spark.implicits._
    val df = graft.operators.Retrieval.phraseSearch(
      Tables.load(spark, dir, "documents").select($"doc_id", $"text"),
      "doc_id", "text", Seq("part", "filter", "scan"))
    val plan = df.queryExecution.executedPlan.toString
    // every join input carries its token filter below the exchange:
    // in bottom-up print order, each Exchange must be preceded later in
    // the text by a Filter containing the token predicate
    val exIdx = plan.indexOf("Exchange hashpartitioning")
    val filterIdx = plan.lastIndexOf("Filter")
    assert(exIdx >= 0 && filterIdx > exIdx,
      s"token filters must run before the shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(3000))
  }
}
