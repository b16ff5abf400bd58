package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Bpe
import graft.operators.TextAnalysis
import graft.sources.Tables

/** The vocabulary-scale BPE apply ([[graft.functions.BpeSegment]]):
  * greedy lowest-rank segmentation ≡ the rank-order replace-chain
  * replay on TRAINED merge tables, with plan depth constant in the
  * merge count — the property that lets a real 32k-merge tokenizer
  * apply in one pass instead of a 32k-deep expression tree. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  /** The historical semantics, replayed driver-side: boundary-wrapped
    * word, one leftmost-non-overlapping replace per merge in rank
    * order (String.replace IS leftmost non-overlapping). */
  private def chainSegment(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var rep = word.map(_.toString).mkString("|", "||", "|") // "ab" -> "|a||b|"
    merges.foreach { case (a, b) =>
      rep = rep.replace(s"|$a||$b|", s"|$a$b|")
    }
    rep.substring(1, rep.length - 1).split("\\|\\|").toSeq
  }

  private def nativeSegment(words: Seq[String],
      merges: Seq[(String, String)]): Map[String, Seq[String]] = {
    import spark.implicits._
    words.toDF("w")
      .select(col("w"), Bpe.segments(col("w"), merges).as("segs"))
      .as[(String, Seq[String])].collect().toMap
  }

  test("native greedy segmentation equals the replace-chain replay on " +
      "sequentially- and batch-trained merge tables over real text") {
    import spark.implicits._
    val real = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select($"text")
    // the synthetic documents corpus has a ~31-word vocabulary; an
    // md5-derived corpus (16-symbol alphabet, 32-char words) exercises
    // deep merge stacks and token-in-token collisions
    val hashed = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .limit(500).select(md5($"doc_id".cast("string")).as("text"))
    for ((docs, train) <- Seq[(org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame => Seq[(String, String)])](
        (real, d => TextAnalysis.bpeLearnMerges(d, "text", iters = 8)),
        (real, d => TextAnalysis.bpeLearnMergesBatched(d, "text",
          rounds = 6, batchR = 8, candK = 64)),
        (hashed, d => TextAnalysis.bpeLearnMergesBatched(d, "text",
          rounds = 8, batchR = 32, candK = 256)))) {
      val words = docs
        .select(explode(split(trim($"text"), "\\s+")).as("w"))
        .filter(length($"w") >= 1 && !$"w".contains("|"))
        .distinct().as[String].collect().toSeq
      assert(words.size > 20, s"corpus too small: ${words.size} words")
      val merges = train(docs)
      assert(merges.size >= 8)
      val native = nativeSegment(words, merges)
      words.foreach { w =>
        assert(native(w) == chainSegment(w, merges),
          s"word '$w' under ${merges.size} merges: " +
            s"native ${native(w)} vs chain ${chainSegment(w, merges)}")
      }
      // and every segmentation is lossless
      words.foreach(w => assert(native(w).mkString == w))
    }
  }

  test("plan shape is CONSTANT in the merge count: 8 vs 4096 merges " +
      "produce the identical analyzed plan modulo the count label") {
    import spark.implicits._
    // consistent-by-construction prefix-chain table (each merge's left
    // token is built by the immediately preceding lower-ranked merge)
    def prefixChain(ws: Seq[String]): Seq[(String, String)] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
      ws.foreach { w =>
        for (i <- 1 until w.length) seen += ((w.substring(0, i), w.substring(i, i + 1)))
      }
      seen.toSeq
    }
    val rng = new scala.util.Random(13)
    def word(len: Int) = (0 until len).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val m8 = prefixChain(Seq(word(5), word(5))).take(8)
    val big = prefixChain((0 until 300).map(_ => word(16)))
    assert(big.size >= 4096, s"only ${big.size}")
    val m4096 = big.take(4096)
    val df = Seq("abc").toDF("w")
    val p8 = df.select(Bpe.segments(col("w"), m8)).queryExecution.analyzed
    val p4096 = df.select(Bpe.segments(col("w"), m4096)).queryExecution.analyzed
    def norm(s: String) = s.replaceAll("#\\d+", "#_")
    assert(norm(p8.treeString).replace("8 merges", "4096 merges")
      == norm(p4096.treeString),
      "plan must not grow with the merge table")
  }

  test("broadcast memo hits on merge-table CONTENT, never on identity " +
      "hashes: equal tables share one broadcast, different tables never do") {
    def tableOf(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graft.ColumnBridge.expression(c) match {
        case graft.functions.BpeSegment(_, b) => b
        case other => fail(s"unexpected expression $other")
      }
    val m1 = Seq(("a", "b"), ("ab", "c"))
    val m1copy = Seq(("a", "b"), ("ab", "c")) // distinct instance, equal content
    val m2 = Seq(("a", "b"), ("b", "c"))
    val b1 = tableOf(Bpe.segments(col("w"), m1))
    val b1again = tableOf(Bpe.segments(col("w"), m1))
    val b1struct = tableOf(Bpe.segments(col("w"), m1copy))
    val b2 = tableOf(Bpe.segments(col("w"), m2))
    assert(b1.id == b1again.id, "same instance must hit the memo")
    assert(b1.id == b1struct.id,
      "structurally-equal table must hit the memo (content key)")
    assert(b1.id != b2.id, "different tables must never share a broadcast")
    // and a hit always serves the RIGHT table
    assert(b1struct.value.merges == m1)
    assert(b2.value.merges == m2)
  }

  test("a 32k-merge tokenizer applies in one codegen'd pass (no " +
      "fallback) and round-trips every word") {
    import spark.implicits._
    // 32k consistent merges from prefix chains over synthetic words
    val rng = new scala.util.Random(41)
    def word(len: Int) = (0 until len).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val seen = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    val sources = scala.collection.mutable.ArrayBuffer.empty[String]
    while (seen.size < 33000) {
      val w = word(12 + rng.nextInt(8))
      sources += w
      for (i <- 1 until w.length) seen += ((w.substring(0, i), w.substring(i, i + 1)))
    }
    val merges = seen.toSeq.take(33000)
    assert(merges.size >= 32768)
    val sample = sources.take(400).toSeq
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val native = nativeSegment(sample, merges)
      sample.foreach { w =>
        assert(native(w).mkString == w, s"lossy segmentation of '$w'")
      }
      // spot-check exact equivalence vs the 33k-deep chain replay
      sample.take(40).foreach { w =>
        assert(native(w) == chainSegment(w, merges), s"word '$w'")
      }
      // the chain formulation at this scale would be a ~33k-deep
      // expression tree; the native plan is the same 4 nodes as ever
      val plan = Seq("x").toDF("w")
        .select(Bpe.segments(col("w"), merges)).queryExecution.analyzed
      assert(plan.treeString.length < 2000, "plan leaked the merge table")
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
    }
  }

  test("t25's trainer actually reaches a >=32768-merge vocabulary on " +
      "the derived corpus, and the table is consistent (every token " +
      "formed by lower-ranked merges)") {
    import spark.implicits._
    val corpus = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select($"doc_id", expr("concat_ws(' ', transform(" +
        "sequence(0L, 39L), i -> md5(cast(doc_id * 40 + i as string))))")
        .as("text"))
    val merges = TextAnalysis.ensureBpeTargetTrained(spark,
      "/root/testdata/sf0.01", corpus.filter($"doc_id" < 500)
        .select($"text"), "text", target = 33000)
    assert(merges.size >= 32768, s"only ${merges.size} merges learned")
    // consistency: every non-character token referenced by a merge was
    // produced by a LOWER-ranked merge — the property that makes the
    // greedy apply identical to the rank-order replay
    val formedAt = scala.collection.mutable.Map.empty[String, Int]
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      for (t <- Seq(a, b) if t.length > 1)
        assert(formedAt.getOrElse(t, Int.MaxValue) < r,
          s"rank $r uses token '$t' not yet formed")
      formedAt.getOrElseUpdate(a + b, r)
    }
    // and the greedy apply still equals the 33k-stage rank-order chain
    // replay on the TIE-SWEPT table (the equivalence the tie-sweep
    // Scaladoc argues from consistency)
    val sample = corpus.filter($"doc_id" < 20)
      .select(explode(split(trim($"text"), "\\s+")).as("w"))
      .distinct().as[String].collect().toSeq.sorted.take(60)
    assert(sample.size >= 40)
    val native = nativeSegment(sample, merges)
    sample.foreach { w =>
      assert(native(w) == chainSegment(w, merges), s"word '$w'")
    }
  }

  test("the full encode path (t22 shape) under a 32k-merge tokenizer " +
      "stays constant-depth end to end") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def word(len: Int) = (0 until len).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val seen = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    while (seen.size < 32768) {
      val w = word(14)
      for (i <- 1 until w.length) seen += ((w.substring(0, i), w.substring(i, i + 1)))
    }
    val merges = seen.toSeq
    val docs = Seq((1L, "abc def ghij"), (2L, "def abc"))
      .toDF("doc_id", "text")
    val ids = TextAnalysis.bpeEncodeIds(docs, "doc_id", "text", merges)
    val plan = ids.queryExecution.analyzed
    assert(plan.treeString.length < 20000,
      s"encode plan grew with the vocabulary: ${plan.treeString.length}")
    val out = ids.as[(Long, Seq[Long])].collect().toMap
    assert(out.keySet == Set(1L, 2L))
    // ids are consistent across docs: same word -> same id subsequence
    assert(out(1L).nonEmpty && out(2L).nonEmpty)
  }
  test("serving an encode from the staged segmentation map fails LOUDLY " +
      "when the corpus has grown past it (no silent token drops)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("bpe-staleserve").toString
    val base = Seq((1L, "s", "ab ab cd"), (2L, "s", "cd ab"))
      .toDF("doc_id", "source", "text")
    val merges = TextAnalysis.bpeLearnMerges(base.select($"text"), "text", 1)
    TextAnalysis.ensureWordSegsStaged(spark, dir, base, "text", merges)
    // same corpus serves fine
    val ok = TextAnalysis.bpeEncodeFromStagedSegs(spark, dir,
      base, "doc_id", "text").collect()
    assert(ok.length == 2)
    // a grown corpus with an unseen word must not silently undercount
    val grown = base.unionByName(
      Seq((3L, "s", "zq ab")).toDF("doc_id", "source", "text"))
    val ex = intercept[Exception] {
      TextAnalysis.bpeEncodeFromStagedSegs(spark, dir,
        grown, "doc_id", "text").collect()
    }
    assert(ex.getMessage.contains("missing from the staged segmentation") ||
      String.valueOf(ex.getCause)
        .contains("missing from the staged segmentation"),
      ex.getMessage)
    // the diagnostic must NAME the offending word (a mis-escaped quote
    // in the raise_error concat once swallowed the column reference
    // into the literal, leaving a constant message)
    assert(ex.getMessage.contains("'zq'") ||
      String.valueOf(ex.getCause).contains("'zq'"),
      s"offending word not named: ${ex.getMessage}")
  }

}
