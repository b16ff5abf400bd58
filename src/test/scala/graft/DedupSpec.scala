package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.sources.Tables

/** Planted-duplicate recall tests for the hash-based operators that ship
  * without a DuckDB oracle (xxhash64 signatures are Spark-native).
  */
class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  def docs = Tables.load(spark, dir, "documents")
    .select(col("doc_id"), col("text"))

  test("exact dedup groups planted exact copies") {
    import spark.implicits._
    val planted = docs.filter($"doc_id" < 25)
      .withColumn("doc_id", $"doc_id" + 100000L)
    val out = Dedup.exact(docs.unionByName(planted), "doc_id", "text")
    val dupGroups = out.filter($"n_copies" === 2).count()
    assert(dupGroups == 25, s"expected 25 dup groups, got $dupGroups")
    assert(out.filter($"n_copies" === 2).agg(max($"keep_id")).head().getLong(0) < 25)
  }

  test("minhash LSH finds planted near-dups with high recall") {
    import spark.implicits._
    val withDups = Dedup.withPlantedDups(docs, "doc_id", "text",
      nPlant = 25, idOffset = 100000L, dropWords = 5)
    val pairs = Dedup.minhashLsh(withDups, "doc_id", "text",
      numPerm = 64, bands = 16, threshold = 0.5)
    val planted = pairs
      .filter($"id_b" === $"id_a" + 100000L).count()
    assert(planted >= 20, s"recall too low: $planted/25 planted pairs found")
  }

  test("SigAgree equals the interpreted zip_with agreement count") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      val a = Array.fill(64)(rnd.nextLong() % 4)
      val b = Array.fill(64)(rnd.nextLong() % 4)
      (i, a.toSeq, b.toSeq)
    }.toDF("i", "a", "b")
    val mism = rows.select(
        graft.functions.MinHash.sigAgree($"a", $"b").as("fast"),
        size(filter(zip_with($"a", $"b", (x, y) => x === y),
          (m: org.apache.spark.sql.Column) => m)).as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(mism == 0)
  }

  test("simhash finds planted near-dups") {
    import spark.implicits._
    val withDups = Dedup.withPlantedDups(docs, "doc_id", "text",
      nPlant = 25, idOffset = 100000L, dropWords = 2)
    val pairs = Dedup.simhashPairs(withDups, "doc_id", "text", maxHamming = 3)
    val planted = pairs.filter($"id_b" === $"id_a" + 100000L).count()
    assert(planted >= 10, s"recall too low: $planted/25 planted pairs found")
  }

  test("simhash: 10k identical-signature docs produce a linear star, " +
      "not a quadratic clique") {
    import spark.implicits._
    // the corpus-scale hazard: every empty doc hashes to signature 0, so
    // all four 16-bit chunk buckets degenerate into one — uncapped, that
    // was ~5·10^7 candidate pairs; collapsed, the group emits k-1 star
    // pairs around the min-id representative and ONE row enters the index
    val empties = spark.range(10000)
      .select($"id".as("doc_id"), lit("").as("text"))
    val pairs = Dedup.simhashPairs(empties, "doc_id", "text", maxHamming = 3)
    assert(pairs.count() == 9999)
    assert(pairs.filter($"id_a" === 0 && $"hamming" === 0).count() == 9999)
    // connectivity: keep-one dedup still sees every doc
    assert(pairs.select(explode(array($"id_a", $"id_b"))).distinct().count()
      == 10000)
  }

  test("simhash: identical-signature collapse composes with normal docs") {
    import spark.implicits._
    val mixed = docs.limit(200).unionByName(
      spark.range(5000).select(($"id" + 500000L).as("doc_id"),
        lit("boilerplate header").as("text")))
    val pairs = Dedup.simhashPairs(mixed, "doc_id", "text", maxHamming = 3)
    // the 5k-doc boilerplate group stays linear…
    val boiler = pairs.filter($"id_a" >= 500000L && $"id_b" > 500000L)
    assert(boiler.count() == 4999)
    // …and never swamps the output with a quadratic block
    assert(pairs.count() < 20000, s"quadratic blow-up: ${pairs.count()} pairs")
  }

  test("embedding near-dup: a degenerate LSH bucket is capped with " +
      "connectivity preserved") {
    import spark.implicits._
    // 3k near-identical embeddings land in ONE 12-bit bucket (identical
    // hyperplane signs) — the uncapped join did n²/2 ≈ 4.5M cosines; the
    // posting-list cap bounds it at cap·n while every member still links
    // into the bucket prefix, so keep-one dedup collapses the whole group
    val n = 3000
    val cap = 64
    val vecs = spark.range(n).select($"id".as("vec_id"),
      array((0 until 8).map(d =>
        lit(1.0f) + ($"id" % 97).cast("float") * lit(1e-7f)): _*).as("embedding"))
    val pairs = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
      threshold = 0.9, lshBits = 12, bucketCap = cap)
    val cnt = pairs.count()
    assert(cnt <= cap.toLong * n, s"cap did not bound the bucket: $cnt pairs")
    assert(cnt >= n - 1, s"bucket lost connectivity: $cnt pairs")
    assert(pairs.select(explode(array($"id_a", $"id_b"))).distinct().count()
      == n, "a bucket member fell out of the pair graph")
  }

  test("embedding near-dup finds planted exact copies") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val planted = embs.filter($"vec_id" < 25)
      .withColumn("vec_id", $"vec_id" + 100000L)
    val pairs = Dedup.embeddingNearDups(embs.unionByName(planted),
      "vec_id", "embedding", threshold = 0.99, lshBits = 12)
    // identical vectors always share the LSH bucket → all 25 found
    val found = pairs.filter($"id_b" === $"id_a" + 100000L).count()
    assert(found == 25, s"expected 25 planted pairs, got $found")
  }

  test("semantic dedup drops exactly the planted copies, witnessed by " +
      "their originals") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val planted = embs.filter($"vec_id" < 25)
      .withColumn("vec_id", $"vec_id" + 100000L)
    val dropped = Dedup.semanticDedup(embs.unionByName(planted),
      "vec_id", "embedding", threshold = 0.99, nlist = 16)
    val rows = dropped.collect()
    // identical quantized vectors share the cluster → every planted copy
    // is dropped, witnessed by its original, at cos ≈ 1 (S/(√S·√S)
    // differs from 1.0 only in the last ulp); nothing organic crosses
    // 0.99
    assert(rows.length == 25, s"expected 25 drops, got ${rows.length}")
    assert(rows.forall(r => r.getLong(0) == r.getLong(1) + 100000L))
    assert(rows.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-12))
  }

  test("semantic dedup witness is always a lower id in the same cluster") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val dropped = Dedup.semanticDedup(embs, "vec_id", "embedding",
      threshold = 0.3, nlist = 8)
    val bad = dropped.filter($"kept_by" >= $"vec_id").count()
    assert(bad == 0)
    // at a loose threshold something organic must drop (sanity that the
    // operator isn't vacuously empty)
    assert(dropped.count() > 0)
  }

  test("dup clusters: chained pairs collapse transitively to the min id") {
    import spark.implicits._
    // a~b, b~c, c~d plus an isolated e: one 4-node chain, one singleton
    val nodes = Seq(10L, 11L, 12L, 13L, 99L).toDF("doc_id")
    val pairs = Seq((10L, 11L), (11L, 12L), (12L, 13L)).toDF("id_a", "id_b")
    val cc = Dedup.dupClusters(nodes, pairs, "doc_id")
      .orderBy($"doc_id").collect()
    assert(cc.map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq ==
      Seq((10L, 10L, true), (11L, 10L, false), (12L, 10L, false),
        (13L, 10L, false), (99L, 99L, true)))
  }

  test("dup clusters are consistent with the pair graph on the planted " +
      "corpus: pairs share a cluster, keepers are the cluster minima") {
    import spark.implicits._
    val withDups = Dedup.withPlantedDups(docs, "doc_id", "text",
      nPlant = 25, idOffset = 100000L, dropWords = 2)
    val pairs = Dedup.simhashPairs(withDups, "doc_id", "text", maxHamming = 3)
    val cc = Dedup.dupClusters(withDups, pairs, "doc_id")
    // every pair's endpoints landed in the same cluster
    val split = pairs
      .join(cc.select($"doc_id".as("id_a"), $"cluster".as("ca")), "id_a")
      .join(cc.select($"doc_id".as("id_b"), $"cluster".as("cb")), "id_b")
      .filter($"ca" =!= $"cb").count()
    assert(split == 0, s"$split pairs split across clusters")
    // keepers are exactly the per-cluster minima, one per cluster
    val byCluster = cc.groupBy($"cluster")
      .agg(min($"doc_id").as("lo"), sum(when($"keep", 1).otherwise(0)).as("k"))
    assert(byCluster.filter($"cluster" =!= $"lo" || $"k" =!= 1).count() == 0)
  }

  test("winnowing fingerprints survive a trailing edit: a local " +
      "perturbation changes only the windows that overlap it") {
    import spark.implicits._
    val base = docs.filter($"doc_id" < 25)
      .select($"doc_id", TextAnalysis.winnowFingerprints($"text").as("fp"))
    val toks = TextAnalysis.tokens($"text")
    val cut = docs.filter($"doc_id" < 25)
      .select($"doc_id", TextAnalysis.winnowFingerprints(
        concat_ws(" ", slice(toks, lit(1),
          greatest(size(toks) - 2, lit(1))))).as("fp2"))
    val ov = base.join(cut, "doc_id")
      .select((size(array_intersect($"fp", $"fp2")).cast("double") /
        size($"fp")).as("ov"))
      .agg(avg($"ov")).head().getDouble(0)
    assert(ov >= 0.8, s"avg fingerprint overlap $ov too low for a 2-word cut")
  }

  test("substring dedup recovers a planted cross-document span exactly") {
    import spark.implicits._
    // two docs share a 30-token boilerplate block at different offsets,
    // surrounded by globally-unique context; a third doc is all-unique.
    val boiler = (0 until 30).map(i => s"boiler$i").mkString(" ")
    val d1 = ((0 until 20).map(i => s"aa$i") :+ boiler).mkString(" ") +
      " " + (0 until 10).map(i => s"cc$i").mkString(" ")
    val d2 = ((0 until 15).map(i => s"dd$i") :+ boiler).mkString(" ") +
      " " + (0 until 5).map(i => s"ee$i").mkString(" ")
    val d3 = (0 until 40).map(i => s"ff$i").mkString(" ")
    val df = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(df, "doc_id", "text",
      k = 8, minTokens = 15)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // k-grams fully inside the boilerplate are the only duplicated ones:
    // 30 - 8 + 1 = 23 consecutive positions -> span_tokens = 22 + 8 = 30,
    // starting exactly where the boilerplate starts (0-based token offset)
    assert(spans.toSeq == Seq((1L, 20L, 30L), (2L, 15L, 30L)),
      s"got ${spans.toSeq}")
  }

  test("substring dedup sees within-document repetition too") {
    import spark.implicits._
    val block = (0 until 20).map(i => s"rep$i").mkString(" ")
    val text = ((0 until 10).map(i => s"gg$i") :+ block).mkString(" ") +
      " " + (0 until 10).map(i => s"hh$i").mkString(" ") + " " + block
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val spans = Dedup.substringDupSpans(df, "doc_id", "text",
      k = 8, minTokens = 15)
      .orderBy($"span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the 20-token block appears at positions 10 and 40: 13 duplicated
    // gram positions each -> two spans of 12 + 8 = 20 tokens
    assert(spans.toSeq == Seq((7L, 10L, 20L), (7L, 40L, 20L)),
      s"got ${spans.toSeq}")
  }

  test("bloom decontamination equals the broadcast path exactly") {
    import spark.implicits._
    val evalDocs = docs.filter($"doc_id" < 20)
    val train = docs.filter($"doc_id" >= 20).unionByName(
      Dedup.withPlantedDups(evalDocs, "doc_id", "text",
        nPlant = 20, idOffset = 100000L, dropWords = 5)
        .filter($"doc_id" >= 100000L))
    val exact = Dedup.contaminatedDocs(train, evalDocs, "doc_id", "text", n = 8)
      .as[Long].collect().toSet
    val bloom = Dedup.contaminatedDocsBloom(train, evalDocs, "doc_id", "text",
        n = 8)
      .as[Long].collect().toSet
    assert(exact.nonEmpty, "planted contamination must be found")
    assert(bloom == exact,
      "bloom pre-filter + exact verify must be bit-identical to broadcast")
    // even a sloppy filter (high fpp) stays exact after the verify join
    val sloppy = Dedup.contaminatedDocsBloom(train, evalDocs, "doc_id", "text",
        n = 8, fpp = 0.5)
      .as[Long].collect().toSet
    assert(sloppy == exact)
  }

  test("substring dedup spans match a brute-force reference on random " +
      "small-vocabulary corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "d", "e")
    val k = 4
    val minT = 6
    (0 until 3).foreach { trial =>
      val docs = (0 until 12).map { i =>
        val len = 1 + rnd.nextInt(30)
        (i.toLong, Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val got = Dedup.substringDupSpans(docs.toDF("doc_id", "text"),
          "doc_id", "text", k, minT)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // brute force over gram STRINGS (equivalent to the 64-bit md5-derived
      // hashes absent a ~2^-64 collision): global frequency, dup positions,
      // consecutive-run islands, minTokens filter
      val grams: Map[Long, Vector[String]] = docs.map { case (id, text) =>
        val t = text.trim.split("\\s+").toVector
        val ng = math.max(t.size - k + 1, 1)
        id -> (0 until ng).map(i => t.slice(i, i + k).mkString(" ")).toVector
      }.toMap
      val freq = grams.values.flatten.toSeq.groupBy(identity)
        .view.mapValues(_.size).toMap
      val expect = grams.flatMap { case (id, gs) =>
        val dup = gs.zipWithIndex.collect {
          case (g, p) if freq(g) > 1 => p
        }
        val runs = dup.foldLeft(List.empty[(Int, Int)]) {
          case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
          case (acc, p) => (p, p) :: acc
        }
        runs.collect {
          case (s, e) if e - s + k >= minT => (id, s.toLong, (e - s + k).toLong)
        }
      }.toSet
      assert(got == expect, s"trial $trial: got ${got.size}, " +
        s"expected ${expect.size} spans")
    }
  }

  test("substring dedup apply keeps the first occurrence and cuts the " +
      "interior of later ones") {
    import spark.implicits._
    val boiler = (0 until 30).map(i => s"boiler$i")
    val d1 = ((0 until 20).map(i => s"aa$i") ++ boiler ++
      (0 until 10).map(i => s"cc$i")).mkString(" ")
    val d2 = ((0 until 15).map(i => s"dd$i") ++ boiler ++
      (0 until 5).map(i => s"ee$i")).mkString(" ")
    val d3 = (0 until 40).map(i => s"ff$i").mkString(" ")
    val df = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val out = Dedup.substringDedupApply(df, "doc_id", "text", k = 8)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1 owns the boilerplate (first occurrence) — fully preserved;
    // doc 3 is all-unique — fully preserved
    assert(out(0) == ((1L, 60L, 60L, d1)))
    assert(out(2) == ((3L, 40L, 40L, d3)))
    // doc 2 loses the boilerplate INTERIOR: unique straddling grams keep
    // k-1 = 7 boundary tokens on each side, so boiler7..boiler22 drop
    val expect2 = ((0 until 15).map(i => s"dd$i") ++
      (0 until 7).map(i => s"boiler$i") ++
      (23 until 30).map(i => s"boiler$i") ++
      (0 until 5).map(i => s"ee$i")).mkString(" ")
    assert(out(1) == ((2L, 50L, 34L, expect2)), out(1).toString)
  }

  test("line dedup removes repeated segments across AND within docs, " +
      "first occurrence wins") {
    import spark.implicits._
    // span = 3; seg0 of doc 1 = "a b c" repeats as doc 1 seg2, doc 2
    // seg0; doc 3 is all-unique; doc 4 duplicates doc 3 entirely
    val d3 = "p q r s t u"
    val df = Seq(
      (1L, "a b c d e f a b c"),
      (2L, "a b c x y z"),
      (3L, d3),
      (4L, d3)).toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, "doc_id", "text", span = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out(0) == ((1L, 3L, 2L, "a b c d e f")))   // in-doc repeat cut
    assert(out(1) == ((2L, 2L, 1L, "x y z")))          // cross-doc cut
    assert(out(2) == ((3L, 2L, 2L, d3)))               // first owner keeps
    assert(out(3) == ((4L, 2L, 0L, "")))               // full dup emptied
  }

  test("line dedup matches a driver-side sequential reference on the " +
      "organic corpus") {
    import spark.implicits._
    val out = Dedup.lineDedup(docs, "doc_id", "text", span = 10)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    val rows = docs.orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val seen = scala.collection.mutable.Set.empty[String]
    val ref = rows.map { case (id, t) =>
      val tk = t.trim.split("\\s+")
      val segs = tk.grouped(10).map(_.mkString(" ")).toSeq
      val kept = segs.filter(s => seen.add(s))
      (id, segs.length.toLong, kept.length.toLong, kept.mkString(" "))
    }
    assert(out.toSeq == ref.toSeq)
  }

  test("fuzzy verify finds planted near-dups and bounds similarity") {
    import spark.implicits._
    val base = docs.filter($"doc_id" < 50)
    val corpus = Dedup.withPlantedDups(base, "doc_id", "text",
      nPlant = 25, idOffset = 100000L, dropWords = 5)
    val pairs = Dedup.fuzzyVerifyPairs(corpus, "doc_id", "text",
        candThreshold = 0.5, minSimPpm = 600000L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // planted copy = original minus its last 5 words: high similarity,
    // pair (id, id+100000) must surface for most planted docs
    val planted = pairs.count { case (a, b, _, _) => b == a + 100000L }
    assert(planted >= 20, s"planted recall too low: $planted/25")
    // ppm similarity is a true ratio: within [600000, 1000000] after the
    // filter, and lev is consistent with it
    pairs.foreach { case (a, b, lev, ppm) =>
      assert(ppm >= 600000L && ppm <= 1000000L, s"($a,$b) ppm=$ppm")
      assert(lev >= 0L, s"($a,$b) lev=$lev")
    }
  }

  test("contamination score: planted eval copies score near 1e6, clean " +
      "docs score 0 hits against a disjoint eval set") {
    import spark.implicits._
    val evalDocs = docs.filter($"doc_id" < 20)
    val planted = Dedup.withPlantedDups(evalDocs, "doc_id", "text",
      nPlant = 20, idOffset = 100000L, dropWords = 5)
      .filter($"doc_id" >= 100000L)
    val train = docs.filter($"doc_id" >= 20).unionByName(planted)
    val out = Dedup.contaminationScore(train, evalDocs, "doc_id", "text", n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byId = out.map(x => x._1 -> x).toMap
    // planted docs are eval prefixes: every one of their grams is an
    // eval gram, so frac_ppm = 1e6 exactly
    (100000L until 100020L).foreach { id =>
      val (_, ng, hit, ppm) = byId(id)
      assert(hit == ng && ppm == 1000000L, s"planted $id: $hit/$ng ppm=$ppm")
    }
    // fractions are well-formed everywhere
    out.foreach { case (id, ng, hit, ppm) =>
      assert(ng >= 1 && hit >= 0 && hit <= ng, s"$id: $hit/$ng")
      assert(ppm == hit * 1000000L / ng, s"$id: ppm $ppm != $hit/$ng")
    }
  }

  test("ngram jaccard is symmetric-free and thresholded") {
    import spark.implicits._
    val pairs = Dedup.ngramJaccardPairs(docs.filter($"doc_id" < 50),
      "doc_id", "text", threshold = 0.5)
    assert(pairs.filter($"id_a" >= $"id_b").count() == 0)
    assert(pairs.filter($"jaccard" < 0.5 || $"jaccard" > 1.0).count() == 0)
  }

  test("ngram jaccard prefix filter is lossless vs naive all-token join") {
    import spark.implicits._
    val in = docs.filter($"doc_id" < 50)
    val got = Dedup.ngramJaccardPairs(in, "doc_id", "text", threshold = 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    // naive reference: every pair sharing >= 1 token, exact jaccard
    val toks = in.select($"doc_id".as("id"),
      array_distinct(split(trim($"text"), "\\s+")).as("tk"))
    val inv = toks.select($"id", explode($"tk").as("t"))
    val naive = inv.as("x").join(inv.as("y"), Seq("t"))
      .filter($"x.id" < $"y.id")
      .select($"x.id".as("id_a"), $"y.id".as("id_b")).distinct()
      .join(toks.select($"id".as("id_a"), $"tk".as("tk_a")), "id_a")
      .join(toks.select($"id".as("id_b"), $"tk".as("tk_b")), "id_b")
      .withColumn("sh", size(array_intersect($"tk_a", $"tk_b")).cast("double"))
      .filter($"sh" / (size($"tk_a") + size($"tk_b") - $"sh") >= 0.5)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == naive, s"prefix filter lost ${(naive -- got).size} pairs, " +
      s"invented ${(got -- naive).size}")
  }

  test("ngram jaccard survives a planted hot token") {
    import spark.implicits._
    // every doc gets the same hot token appended: the naive inverted-index
    // self-join would go quadratic on its posting list; the df-ordered
    // prefix keeps it out of the index and results stay exact
    val hot = docs.filter($"doc_id" < 50)
      .withColumn("text", concat($"text", lit(" zzhotzz zzhotzz")))
    val pairs = Dedup.ngramJaccardPairs(hot, "doc_id", "text", threshold = 0.5)
    assert(pairs.filter($"id_a" >= $"id_b").count() == 0)
    assert(pairs.filter($"jaccard" < 0.5 || $"jaccard" > 1.0).count() == 0)
  }

  test("batch top-k agrees with per-query brute force") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val corpus = embs.filter($"vec_id" >= 5)
    val queries = embs.filter($"vec_id" < 3)
    val batch = Similarity.batchTopK(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", 10)
    queries.select($"vec_id", $"embedding").collect().foreach { r =>
      val qid = r.getLong(0)
      val q = r.getSeq[Float](1)
      val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
        .select($"vec_id").collect().map(_.getLong(0)).toSeq
      val got = batch.filter($"q_id" === qid).orderBy($"rank")
        .select($"vec_id").collect().map(_.getLong(0)).toSeq
      assert(got == brute, s"query $qid: $got != $brute")
    }
  }

  test("hard negatives: label always differs, ranking = filtered brute force") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val corpus = embs.filter($"vec_id" >= 5)
    val probes = embs.filter($"vec_id" < 3)
    val negs = Similarity.hardNegatives(corpus, "vec_id", "embedding",
      "label", probes, "vec_id", "embedding", "label", k = 8)
    val labels = corpus.select($"vec_id", $"label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    probes.select($"vec_id", $"embedding", $"label").collect().foreach { r =>
      val (qid, q, ql) = (r.getLong(0), r.getSeq[Float](1), r.getInt(2))
      val got = negs.filter($"q_id" === qid).orderBy($"rank")
        .select($"vec_id").collect().map(_.getLong(0)).toSeq
      assert(got.forall(labels(_) != ql), s"probe $qid got a same-label row")
      val brute = Similarity.bruteForceTopK(
          corpus.filter($"label" =!= ql), "vec_id", "embedding", q, 8)
        .select($"vec_id").collect().map(_.getLong(0)).toSeq
      assert(got == brute, s"probe $qid: $got != $brute")
    }
  }

  test("int8-quantized ANN keeps high recall vs the float baseline") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0)
    val corpus = embs.filter($"vec_id" =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 20)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val quant = Similarity.quantizedTopK(corpus, "vec_id", "embedding", q, 20)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    val hit = (exact & quant).size
    assert(hit >= 16, s"recall@20 too low for int8 quantization: $hit/20")
  }

  test("LSH ANN recall vs brute force") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val exact = Similarity.bruteForceTopK(embs.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, 20).select("vec_id").as[Long].collect().toSet
    val approx = Similarity.lshTopK(embs.filter($"vec_id" =!= 0),
      "vec_id", "embedding", q, 20, bits = 12, probes = 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"LSH recall $recall too low")
    // every approx hit must be a genuine vector id
    assert(approx.forall(_ > 0))
  }

  test("IVF ANN recall vs brute force") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val corpus = embs.filter($"vec_id" =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 20)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.ivfTopK(corpus, "vec_id", "embedding", q,
        k = 20, nlist = 16, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"IVF recall $recall too low")
    assert(approx.forall(_ > 0))
    // probing ALL lists must be exhaustive: IVF with nprobe = nlist is exact
    val full = Similarity.ivfTopK(corpus, "vec_id", "embedding", q,
        k = 20, nlist = 16, nprobe = 16)
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact, "nprobe = nlist IVF must equal brute force")
  }

  test("seeded IVF recall vs brute force; full probe is exhaustive") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val corpus = embs.filter($"vec_id" =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 20)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.ivfSeededTopK(corpus, "vec_id", "embedding", q,
        k = 20, nlist = 16, nprobe = 4)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"seeded IVF recall $recall too low")
    assert(approx.forall(_ > 0))
    // probing every list degenerates to exact brute force
    val full = Similarity.ivfSeededTopK(corpus, "vec_id", "embedding", q,
        k = 20, nlist = 16, nprobe = 16)
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact, "nprobe = nlist seeded IVF must equal brute force")
  }

  test("MMR: lambda=1 degenerates to brute-force order; picks are " +
      "distinct pool members led by the top-1") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val corpus = embs.filter($"vec_id" =!= 0)
    val brute = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 10)
      .select("vec_id").as[Long].collect().toSeq
    // no redundancy penalty => pure relevance order
    val pure = Similarity.mmrTopK(corpus, "vec_id", "embedding", q,
        k = 10, lambda = 1.0, poolSize = 30)
      .orderBy($"rank").select("vec_id").as[Long].collect().toSeq
    assert(pure == brute, s"lambda=1 MMR $pure != brute $brute")
    // diversified: still distinct, still starts at the top-1 (an empty
    // picked set leaves the first step pure relevance)
    val div = Similarity.mmrTopK(corpus, "vec_id", "embedding", q,
        k = 10, lambda = 0.5, poolSize = 30)
      .orderBy($"rank").select("vec_id").as[Long].collect().toSeq
    assert(div.head == brute.head)
    assert(div.distinct.size == 10)
    val pool = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 30)
      .select("vec_id").as[Long].collect().toSet
    assert(div.forall(pool.contains))
  }

  test("PQ ANN recall vs brute force; exhaustive shortlist is exact") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val corpus = embs.filter($"vec_id" =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 20)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.pqTopK(corpus, "vec_id", "embedding", q,
        k = 20, m = 8, ksub = 16, shortlist = 100)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"PQ recall $recall too low")
    assert(approx.forall(_ > 0))
    // a shortlist covering the whole corpus degenerates to brute force:
    // the refine stage then ranks every vector by exact cosine
    val n = corpus.count().toInt
    val full = Similarity.pqTopK(corpus, "vec_id", "embedding", q,
        k = 20, m = 8, ksub = 16, shortlist = n)
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact, "shortlist = corpus PQ must equal brute force")
  }

  test("IVF×PQ composite: recall vs brute force; exhaustive settings are exact") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    val corpus = embs.filter($"vec_id" =!= 0)
    val exact = Similarity.bruteForceTopK(corpus, "vec_id", "embedding", q, 20)
      .select("vec_id").as[Long].collect().toSet
    val approx = Similarity.ivfPqTopK(corpus, "vec_id", "embedding", q,
        k = 20, nlist = 16, nprobe = 4, m = 8, ksub = 16, shortlist = 50)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF×PQ recall $recall too low")
    // the composite prunes twice, so it can never beat its PQ half run
    // with the same shortlist over the FULL corpus
    val pqOnly = Similarity.pqTopK(corpus, "vec_id", "embedding", q,
        k = 20, m = 8, ksub = 16, shortlist = 50)
      .select("vec_id").as[Long].collect().toSet
    assert((exact intersect approx).size <= (exact intersect pqOnly).size + 2)
    // probing every list with an exhaustive shortlist degenerates to
    // brute force: both approximation layers turned off
    val n = corpus.count().toInt
    val full = Similarity.ivfPqTopK(corpus, "vec_id", "embedding", q,
        k = 20, nlist = 16, nprobe = 16, m = 8, ksub = 16, shortlist = n)
      .select("vec_id").as[Long].collect().toSet
    assert(full == exact, "nprobe=nlist + shortlist=corpus must equal brute")
  }

  test("pqBatchTopK matches the per-probe pqTopK loop bit-for-bit") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val corpus = embs.filter($"vec_id" >= 5)
    val probes = embs.filter($"vec_id" < 5)
    val batch = Similarity.pqBatchTopK(corpus, "vec_id", "embedding",
        probes, "vec_id", "embedding", k = 10, m = 8, ksub = 16,
        shortlist = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val looped = probes.select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
      .flatMap { case (qid, qv) =>
        Similarity.pqTopK(corpus, "vec_id", "embedding", qv,
            k = 10, m = 8, ksub = 16, shortlist = 30)
          .collect().zipWithIndex.map { case (r, i) =>
            (qid, i + 1L, r.getLong(0), r.getDouble(1)) }
      }.toSet
    assert(batch == looped,
      s"batch - looped: ${batch -- looped}\nlooped - batch: ${looped -- batch}")
  }

  test("PQ codebooks are staged once per session key (no per-probe re-derive)") {
    import spark.implicits._
    val corpus = Tables.load(spark, dir, "embeddings").filter($"vec_id" =!= 0)
    val c1 = Similarity.pqCodebooks(corpus, "vec_id", "embedding", 8, 16,
      Some("pq-staging-test"))
    val c2 = Similarity.pqCodebooks(corpus, "vec_id", "embedding", 8, 16,
      Some("pq-staging-test"))
    assert(c1 eq c2, "same (session, key, m, ksub) must reuse the codebook")
  }

  test("evalRetrieval surfaces probes with ZERO retrieved rows as recall 0") {
    import spark.implicits._
    // probe 2 has gold rows but the searcher returned nothing for it —
    // the metric row must still appear (recall_ppm = 0, mrr_ppm = 0)
    val retrieved = Seq((1L, 1L, 10L), (1L, 2L, 11L))
      .toDF("q_id", "rank", "vec_id")
    val truth = Seq((1L, 1L, 10L), (2L, 1L, 20L), (2L, 2L, 21L))
      .toDF("q_id", "rank", "vec_id")
    val out = Similarity.evalRetrieval(retrieved, truth, k = 2)
      .orderBy($"q_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 1L, 500000L, 1000000L),
      (2L, 0L, 0L, 0L)), out.toSeq.toString)
  }

  test("IVF index is staged once per session key (no per-query retrain)") {
    import spark.implicits._
    val corpus = Tables.load(spark, dir, "embeddings").filter($"vec_id" =!= 0)
    val i1 = Similarity.ivfIndex(corpus, "embedding", "staging-test", 8)
    val i2 = Similarity.ivfIndex(corpus, "embedding", "staging-test", 8)
    assert(i1 eq i2, "same (session, key, nlist) must reuse the staged index")
    val q = Tables.load(spark, dir, "embeddings")
      .filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0)
    // probes against the staged index still return k rows
    assert(Similarity.ivfProbe(i1, "vec_id", "embedding", q, 10, 8).count() == 10)
  }

  test("range search finds every planted copy, verifies exactly, and " +
      "never exceeds brute-force radius results") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val probes = embs.filter($"vec_id" % 25 === 0)
      .select(($"vec_id" + 200000L).as("q_id"), $"embedding".as("qe"))
    val nProbes = probes.count()
    val got = Similarity.rangeSearch(embs, probes, "vec_id", "embedding",
        "q_id", "qe", tau = 0.45, bits = 12)
      .select($"q_id", $"doc_id", $"cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // every probe is a planted copy → its source shares the bucket
    // exactly and scores cos = 1
    val selfHits = got.filter { case (q, d, c) => q - 200000L == d }
    assert(selfHits.length == nProbes, s"${selfHits.length} != $nProbes")
    assert(selfHits.forall(_._3 >= 1.0 - 1e-12))
    // precision 1: every returned pair really is within the radius
    assert(got.forall(_._3 >= 0.45))
    // soundness vs brute force: the multi-probe candidates are a SUBSET
    // of the true radius result (LSH trades recall, never precision)
    val brute = probes.as("p").crossJoin(embs.as("c"))
      .select($"q_id", $"vec_id".as("doc_id"),
        graft.functions.VectorFunctions.cosine($"qe", $"embedding").as("cos"))
      .filter($"cos" >= 0.45)
      .select($"q_id", $"doc_id").as[(Long, Long)].collect().toSet
    assert(got.map(t => (t._1, t._2)).toSet.subsetOf(brute))
  }

  test("containment catches a short doc embedded in a long one where " +
      "symmetric Jaccard cannot") {
    import spark.implicits._
    val words = (1 to 100).map(i => s"w$i")
    val long = (1L, words.mkString(" "))
    val short = (2L, words.slice(10, 30).mkString(" "))   // strict slice
    val other = (3L, (200 to 260).map(i => s"v$i").mkString(" "))
    val docs = Seq(long, short, other).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", n = 8,
        thresholdPpm = 900000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the short doc is fully contained: every one of its 8-grams is in
    // the long doc
    assert(cont.exists { case (a, b, ppm) => a == 2L && b == 1L &&
      ppm == 1000000L }, cont.mkString(","))
    // the reverse direction is far below threshold, as is everything
    // involving the unrelated doc
    assert(cont.count(t => t._1 == 1L) == 0)
    assert(!cont.exists(t => t._1 == 3L || t._2 == 3L))
    // symmetric Jaccard on the same pair: 13 shared grams of 93+13-13
    // => ~0.14, invisible at any useful threshold
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      threshold = 0.5)
    assert(jac.count() == 0,
      "symmetric Jaccard should NOT see the embedded doc")
  }

  test("MIPS: augmented-cosine order equals dot order exactly; LSH " +
      "variant keeps recall and never invents scores") {
    import spark.implicits._
    val embs = Tables.load(spark, dir, "embeddings")
    val q = embs.filter($"vec_id" === 0)
      .select($"embedding").head().getSeq[Float](0)
    val corpus = embs.filter($"vec_id" =!= 0)
    val brute = Similarity.mipsTopK(corpus, "vec_id", "embedding", q, 20)
      .select($"vec_id").as[Long].collect().toSeq
    // exactness of the Shrivastava-Li transform: with EVERY bucket
    // probed (bits small enough), the augmented path must return the
    // exact brute-force ranking
    val allProbes = Similarity.mipsLshTopK(corpus, "vec_id", "embedding",
        q, 20, bits = 2, probes = 2)
      .select($"vec_id").as[Long].collect().toSeq
    assert(allProbes == brute,
      s"full-probe augmented ranking diverged: $allProbes vs $brute")
    // the real LSH trade: recall against brute force
    val lsh = Similarity.mipsLshTopK(corpus, "vec_id", "embedding",
        q, 20, bits = 12, probes = 4)
      .select($"vec_id").as[Long].collect().toSet
    val recall = (brute.toSet intersect lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"MIPS LSH recall $recall too low")
    assert(lsh.subsetOf(corpus.select($"vec_id").as[Long].collect().toSet))
    // MIPS vs cosine: inflate some norms (x3 for vec_id % 7 == 1) -
    // dot ranking must move where cosine's cannot (scale-invariant)
    val inflated = corpus.withColumn("embedding",
      org.apache.spark.sql.functions.when($"vec_id" % 7 === 1,
        org.apache.spark.sql.functions.transform($"embedding",
          e => e * org.apache.spark.sql.functions.lit(3.0f)))
        .otherwise($"embedding"))
    val mipsInf = Similarity.mipsTopK(inflated, "vec_id", "embedding",
      q, 20).select($"vec_id").as[Long].collect().toSeq
    val cosInf = Similarity.bruteForceTopK(inflated, "vec_id", "embedding",
      q, 20).select($"vec_id").as[Long].collect().toSeq
    assert(mipsInf != cosInf, "norm inflation must separate MIPS from cosine")
    val cosOrig = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
      q, 20).select($"vec_id").as[Long].collect().toSeq
    assert(cosInf == cosOrig,
      "cosine must be blind to the inflation (scale-invariant)")
  }

  test("containment prefix filter is LOSSLESS: equals brute force on " +
      "randomized small-vocab corpora") {
    import spark.implicits._
    // small vocabulary + short docs force heavy gram sharing, the
    // regime where a buggy prefix bound would actually drop pairs
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 12).map(i => s"v$i")
    for (trial <- 1 to 3) {
      val docs = (1L to 40L).map { id =>
        val n = 6 + rnd.nextInt(10)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.containmentPairs(df, "doc_id", "text", n = 3,
          thresholdPpm = 600000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      // driver-side brute force with the same gram definition
      def grams(t: String): Set[String] = {
        val toks = t.trim.split("\\s+").toSeq
        val k = math.max(toks.length - 3, 0) + 1
        (0 until k).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
      }
      val gs = docs.map { case (id, t) => id -> grams(t) }.toMap
      val want = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a != b
        shared = (gs(a) intersect gs(b)).size.toLong
        ppm = shared * 1000000L / gs(a).size
        if ppm >= 600000L
      } yield (a, b, ppm)).toSet
      assert(got == want,
        s"trial $trial: missing ${want -- got}; extra ${got -- want}")
    }
  }
}
