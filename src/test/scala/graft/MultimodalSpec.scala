package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MediaCodec, MediaCodecColumns, Multimodal}
import graft.sources.Tables

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("expression decode equals the batched mapPartitions decode") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(
      Tables.load(spark, dir, "documents").limit(50))
    val viaExpr = media
      .select($"media_id", Multimodal.byteHistogram($"payload").as("features"))
      .as[(Long, Array[Double])].collect().toMap
    val viaIter = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f.features).toMap
    assert(viaExpr.keySet == viaIter.keySet)
    viaExpr.foreach { case (id, f) =>
      assert(f.toSeq == viaIter(id).toSeq, s"media_id=$id")
    }
    // histogram is a normalized distribution
    viaExpr.values.foreach(f => assert(math.abs(f.sum - 1.0) < 1e-9))
  }

  test("frame sampling keeps every stride-th chunk and reassembles") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(
      Tables.load(spark, dir, "documents").limit(20))
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
      .as[(Long, String, Int, Array[Byte])].collect()
    assert(frames.nonEmpty)
    // only even frame indices survive stride 2
    assert(frames.forall(_._3 % 2 == 0))
    // each sampled frame is the exact payload slice it claims to be
    val payloads = media.select($"media_id", $"payload")
      .as[(Long, Array[Byte])].collect().toMap
    frames.foreach { case (id, _, idx, bytes) =>
      val expect = payloads(id).slice(idx * 64, idx * 64 + 64)
      assert(bytes.toSeq == expect.toSeq, s"media $id frame $idx")
    }
    // stride 1 covers the whole payload exactly
    val full = Multimodal.sampleFrames(media, frameBytes = 64, stride = 1)
      .as[(Long, String, Int, Array[Byte])].collect()
      .groupBy(_._1).map { case (id, fs) =>
        id -> fs.sortBy(_._3).flatMap(_._4).toSeq
      }
    full.foreach { case (id, got) =>
      assert(got == payloads(id).toSeq, s"media $id reassembly")
    }
  }

  test("PPM round-trip: encoded payload decodes to the exact pixel sums") {
    val ids = Seq(0L, 2L, 4L, 100L, 998L)
    ids.foreach { id =>
      val payload = MediaCodec.ppmPayload(id)
      // header is genuine ASCII P6
      assert(new String(payload.take(2), "US-ASCII") == "P6")
      val st = MediaCodec.ppmStats(payload)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      val w = MediaCodec.ppmWidth(id)
      assert(st(0) == w && st(1) == 8, s"id=$id dims")
      // brute-force recompute of the channel sums from the raw bytes
      val px = payload.drop(payload.length - w * 8 * 3)
      val sums = new Array[Long](3)
      px.zipWithIndex.foreach { case (b, p) => sums(p % 3) += (b & 0xFF) }
      assert(st.drop(2).toSeq == sums.toSeq, s"id=$id sums")
    }
  }

  test("PPM decoder rejects malformed payloads with null, not garbage") {
    // wrong magic / truncated pixels / bad maxval all poison to null
    assert(MediaCodec.ppmStats("P5\n4 4\n255\n".getBytes ++
      Array.fill[Byte](48)(1)) == null)
    assert(MediaCodec.ppmStats(MediaCodec.ppmPayload(2L).dropRight(1)) == null)
    assert(MediaCodec.ppmStats("P6\n2 2\n127\n".getBytes ++
      Array.fill[Byte](12)(1)) == null)
    assert(MediaCodec.ppmStats(Array[Byte](1, 2, 3)) == null)
  }

  test("NN resize: identity at source dims, known thumbnail, malformed → null") {
    val ids = Seq(0L, 2L, 100L)
    ids.foreach { id =>
      val payload = MediaCodec.ppmPayload(id)
      val w = MediaCodec.ppmWidth(id)
      // resize to the source dims reproduces the pixel block exactly
      val same = MediaCodec.ppmResize(payload, w, 8)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      val px = payload.drop(payload.length - w * 8 * 3).map(b => (b & 0xFF).toLong)
      assert(same.toSeq == px.toSeq, s"id=$id identity resize")
      // 4x4 thumbnail picks the standard NN source offsets
      val thumb = MediaCodec.ppmResize(payload, 4, 4)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
      assert(thumb.length == 48)
      for (t <- 0 until 16) {
        val sy = (t / 4) * 8 / 4
        val sx = (t % 4) * w / 4
        val s = (sy * w + sx) * 3
        assert(thumb(t * 3) == px(s) && thumb(t * 3 + 1) == px(s + 1) &&
          thumb(t * 3 + 2) == px(s + 2), s"id=$id px=$t")
      }
    }
    assert(MediaCodec.ppmResize("P5\n4 4\n255\n".getBytes ++
      Array.fill[Byte](48)(1), 2, 2) == null)
    assert(MediaCodec.ppmResize(MediaCodec.ppmPayload(2L).dropRight(1), 2, 2) == null)
  }

  test("perceptual aHash: known half-black/half-white image, stability under decode") {
    // 8x8 P6, pixels 0-31 black (gray 0), 32-63 white (gray 255):
    // mean = (32*255)/64 = 127, so exactly the white half sets its bits
    val header = "P6\n8 8\n255\n".getBytes("US-ASCII")
    val px = Array.tabulate(64 * 3)(i => if (i < 32 * 3) 0.toByte else 0xFF.toByte)
    val payload = header ++ px
    val h = MediaCodec.ppmAHash(payload)
    assert(h == java.lang.Long.valueOf(0xFFFFFFFF00000000L),
      f"got ${h.asInstanceOf[java.lang.Long].longValue()}%016x")
    // malformed inputs null out, never throw
    assert(MediaCodec.ppmAHash("P6 junk".getBytes("US-ASCII")) == null)
    assert(MediaCodec.ppmAHash(header ++ px.take(10)) == null)
    // expression path agrees with the direct call on fixture payloads
    import spark.implicits._
    val media = Multimodal.mediaCorpus(
      Tables.load(spark, dir, "documents").limit(40))
      .filter($"format" === "ppm")
    val viaExpr = media
      .select($"media_id", MediaCodecColumns.ppmAHash($"payload").as("h"))
      .as[(Long, Long)].collect().toMap
    val direct = media.select($"media_id", $"payload")
      .as[(Long, Array[Byte])].collect()
      .map { case (id, p) =>
        id -> MediaCodec.ppmAHash(p).asInstanceOf[java.lang.Long].longValue() }
      .toMap
    assert(viaExpr == direct)
  }

  test("WAV decimation: factor-1 is identity vs full-signal stats, " +
      "known stride, malformed → null") {
    val id = 9L
    val payload = MediaCodec.wavPayload(id)
    val n = MediaCodec.wavSamples(id)
    // brute-force samples from the canonical layout
    val samples = (0 until n).map { i =>
      ((payload(44 + 2 * i) & 0xFF) | (payload(45 + 2 * i) << 8)).toShort.toLong
    }
    def stats(factor: Int) = MediaCodec.wavDecimateStats(payload, factor)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    val full = stats(1)
    assert(full(0) == n && full(1) == samples.map(s => s * s).sum &&
      full(2) == samples.map(math.abs).max)
    val dec = stats(4)
    val kept = samples.grouped(4).map(_.head).toSeq
    assert(dec(0) == kept.length && dec(1) == kept.map(s => s * s).sum &&
      dec(2) == kept.map(math.abs).max)
    assert(MediaCodec.wavDecimateStats(payload.dropRight(1), 4) == null)
    assert(MediaCodec.wavDecimateStats("RIFFjunk".getBytes, 4) == null)
  }

  test("WAV demux walks the chunk list like a real parser") {
    val id = 7L
    val canonical = MediaCodec.wavPayload(id)
    val direct = MediaCodec.wavFrameEnergies(canonical, 64, 2)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    // brute-force recompute from the canonical 44-byte layout
    val n = MediaCodec.wavSamples(id)
    val samples = (0 until n).map { i =>
      val lo = canonical(44 + 2 * i) & 0xFF
      val hi = canonical(45 + 2 * i).toInt
      (lo | (hi << 8)).toShort.toLong
    }
    val expect = samples.grouped(64).zipWithIndex
      .filter(_._2 % 2 == 0).map(_._1.map(s => s * s).sum).toSeq
    assert(direct.toSeq == expect)
    // an extra LIST chunk between fmt and data must not break the demux
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val withChunk = canonical.take(36) ++ extra ++ canonical.drop(36)
    // patch the RIFF size field (bytes 4..7, LE) for the inserted 12 bytes
    val riffSize = (canonical.length - 8) + extra.length
    (0 until 4).foreach(i =>
      withChunk(4 + i) = ((riffSize >> (8 * i)) & 0xFF).toByte)
    val viaChunk = MediaCodec.wavFrameEnergies(withChunk, 64, 2)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
    assert(viaChunk.toSeq == expect, "demux must skip unknown chunks")
  }

  test("WAV decoder rejects malformed payloads with null") {
    val good = MediaCodec.wavPayload(3L)
    assert(MediaCodec.wavFrameEnergies("nope".getBytes, 64, 2) == null)
    assert(MediaCodec.wavFrameEnergies(good.dropRight(3), 64, 2) == null)
    // stereo fmt must be rejected (decoder only speaks PCM16 mono)
    val stereo = good.clone(); stereo(22) = 2
    assert(MediaCodec.wavFrameEnergies(stereo, 64, 2) == null)
  }

  test("WAV walkers poison adversarial chunk sizes and framing to null") {
    val good = MediaCodec.wavPayload(3L)
    // chunk size near Int.MaxValue: int arithmetic would overflow the
    // bound check negative and walk out of the array — must be null
    val hostile = good.clone()
    hostile(16) = 0xF0.toByte; hostile(17) = 0xFF.toByte
    hostile(18) = 0xFF.toByte; hostile(19) = 0x7F.toByte
    assert(MediaCodec.wavFrameEnergies(hostile, 64, 2) == null)
    assert(MediaCodec.wavFrameZcrPeak(hostile, 64) == null)
    assert(MediaCodec.wavDecimateStats(hostile, 4) == null)
    // non-positive framing: null (the factor<=0 contract), not a
    // division-by-zero task failure
    assert(MediaCodec.wavFrameZcrPeak(good, 0) == null)
    assert(MediaCodec.wavFrameEnergies(good, 0, 2) == null)
    assert(MediaCodec.wavFrameEnergies(good, 64, 0) == null)
    assert(MediaCodec.wavFrameEnergies(good, -1, -1) == null)
  }

  test("media corpus carries real decodable payloads for both formats") {
    import spark.implicits._
    val media = Multimodal.mediaCorpus(
      Tables.load(spark, dir, "documents").limit(40))
    val decoded = media.select($"media_id", $"format",
        when($"format" === "ppm",
          MediaCodecColumns.ppmStats($"payload").isNotNull)
          .otherwise(MediaCodecColumns.wavFrameEnergies($"payload", 64, 2)
            .isNotNull).as("ok"))
      .collect()
    assert(decoded.nonEmpty)
    assert(decoded.forall(_.getBoolean(2)), "every payload must decode")
    // formats split by parity
    decoded.foreach { r =>
      val expected = if (r.getLong(0) % 2 == 0) "ppm" else "wav"
      assert(r.getString(1) == expected)
    }
  }

  test("feature summary stays inside whole-stage codegen") {
    val df = Multimodal.featureSummary(spark,
      Tables.load(spark, dir, "documents"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("DeserializeToObject"),
      "expression path must not introduce an encoder boundary")
    assert(df.count() == 3) // png / jpeg / wav
  }

  test("scene cuts recover exactly the planted shot boundaries") {
    import spark.implicits._
    val media = Multimodal.mediaCorpus(
      Tables.load(spark, "/root/testdata/sf0.001", "documents")
        .filter($"doc_id" < 120))
    // hold each image for 3 frames: cuts must appear exactly where the
    // underlying image changes (frame_idx % 3 == 0), nowhere else
    val frames = media.filter($"format" === "ppm")
      .select($"media_id", MediaCodecColumns.ppmAHash($"payload").as("h"))
      .select($"media_id", $"h", explode(array(lit(0), lit(1), lit(2))).as("r"))
      .select(($"media_id" % 4).as("video_id"),
        ($"media_id" * 3 + $"r").cast("long").as("frame_idx"), $"h")
    val got = Multimodal.sceneCuts(frames, "video_id", "frame_idx", "h",
        threshold = 16)
      .filter($"hamming".isNotNull)
      .select($"video_id", $"frame_idx", $"hamming", $"is_cut")
      .collect()
    assert(got.nonEmpty)
    got.foreach { row =>
      val (idx, hamming, isCut) =
        (row.getLong(1), row.getLong(2), row.getBoolean(3))
      if (idx % 3 == 0) assert(isCut && hamming >= 16,
        s"scene boundary at $idx must be a cut (hamming $hamming)")
      else assert(!isCut && hamming == 0,
        s"within-scene frame $idx must be identical (hamming $hamming)")
    }
  }

  test("m08 image near-dup: every exact copy stars at hamming 0, most " +
      "one-pixel edits pair within the hamming ball") {
    import spark.implicits._
    val pairs = SparkEntry.queries("m08_image_neardup")(spark, dir)
      .as[(Long, Long, Long)].collect()
    val copyPairs = pairs.filter(p => p._2 == p._1 + 100000L)
    val editPairs = pairs.filter(p => p._2 == p._1 + 200000L)
    // sf0.001 ppm media: even doc_ids < 60 → 30 planted of each kind
    assert(copyPairs.length == 30, s"copies found: ${copyPairs.length}")
    assert(copyPairs.forall(_._3 == 0L))
    // the whitened pixel flips bit 0 plus any mean-borderline bits (or
    // nothing, when pixel 0 was already bright and no bit is borderline —
    // those edits surface as hamming-0 stars); most images stay within
    // hamming 3 of their original, and some genuinely drift >= 1 so the
    // chunk-blocked ball (not just the star collapse) is exercised
    assert(editPairs.length >= 20,
      s"only ${editPairs.length}/30 edited images paired")
    assert(editPairs.forall(_._3 <= 3L))
    assert(editPairs.count(_._3 >= 1L) >= 10,
      s"only ${editPairs.count(_._3 >= 1L)} edits drifted >= 1 bit")
  }
}
