package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing
import graft.sources.Tables

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("sequence chunks equal a driver-side sequential scan") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    val w = 512
    val got = Packing.sequenceChunks(docs, "doc_id", "text", w)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // sequential reference: same tokenizer, one pass in doc-id order
    val counts = docs
      .select($"doc_id", size(graft.operators.TextAnalysis.tokens($"text"))
        .cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val expect = counts.map { case (id, n) =>
      val start = acc
      acc += n
      (id, n, start, start / w, math.max(acc - 1, start) / w)
    }
    assert(got.toSeq == expect.toSeq)
    // the layout is gap-free: consecutive docs abut exactly
    got.sliding(2).foreach {
      case Array((_, n, s, _, _), (_, _, s2, _, _)) => assert(s2 == s + n)
      case _ => ()
    }
  }

  test("multi-partition layout stays consistent (offsets keyed correctly)") {
    import spark.implicits._
    // PIN 8 range partitions (REPARTITION_BY_NUM is exempt from AQE
    // coalescing, which otherwise folds this small corpus into ONE
    // partition and lets an all-zero offset bug pass unnoticed): with
    // real partitions, a wrong per-partition offset misplaces whole
    // blocks of 625 docs
    val docs = spark.range(0, 5000)
      .select(col("id").as("doc_id"),
        concat_ws(" ", lit("w"), col("id").cast("string"),
          lit("x y z")).as("text"))
      .repartition(13)
    val out = Packing.sequenceChunks(docs, "doc_id", "text", 128,
      numPartitions = Some(8))
    val rows = out.orderBy($"doc_id").collect()
    assert(rows.length == 5000)
    // every doc is 5 tokens; doc i starts exactly at 5i
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) == 5L, s"doc $i token count")
      assert(r.getLong(2) == 5L * i, s"doc $i offset: ${r.getLong(2)}")
    }
  }

  test("deterministic shuffle is a permutation matching a driver-side sort") {
    import spark.implicits._
    val docs = spark.range(0, 4000).select(col("id").as("doc_id"))
      .repartition(11)
    val out = Packing.deterministicShuffle(docs, "doc_id", "s1", 8,
        numPartitions = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 4000)
    // pos is a permutation of 0..n-1
    assert(out.map(_._2).sorted.toSeq == (0L until 4000L))
    // and matches the sequential reference order
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long) = md.digest(s"s1:$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = (0L until 4000L).sortBy(id => (key(id), id)).zipWithIndex
      .map { case (id, pos) => id -> pos.toLong }.toMap
    out.foreach { case (id, pos, shard) =>
      assert(pos == want(id), s"doc $id pos $pos != ${want(id)}")
      assert(shard == pos % 8)
    }
    // same seed reproduces; a different seed permutes differently
    val again = Packing.deterministicShuffle(docs, "doc_id", "s1", 8,
        numPartitions = Some(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.forall { case (id, pos, _) => again(id) == pos })
  }
}
