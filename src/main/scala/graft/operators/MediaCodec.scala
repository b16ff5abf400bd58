package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** REAL multimodal decode on codec-free formats — PPM (P6 binary image)
  * and WAV (RIFF PCM16 mono audio) have fixed-layout headers plus raw
  * samples, so a pure-JVM encoder/decoder needs no codec library and the
  * m01/m02 operators decode actual binary media instead of a stub.
  *
  * Determinism contract (what makes the full SQL oracle possible): the
  * FIXTURE payloads' pixel/sample bytes derive from md5("<id>_<block>")
  * — the md5-oracle trick applied to binary columns — so DuckDB rebuilds
  * the exact byte stream relationally and replays every decoder
  * reduction (per-channel integer sums, per-frame integer energies)
  * without ever parsing a binary blob. The JVM side decodes ONLY the
  * payload bytes: headers are parsed (magic, dimensions, chunk walk),
  * sample data is sliced from the parsed offsets, and any malformed
  * payload poisons to null. Real media dropped into the same column
  * decodes through the same path — only the oracle depends on the
  * fixture derivation.
  *
  * Scale posture: payloads stay columnar binary; both decoders are
  * single-pass codegen'd unary expressions (scan → decode → agg in one
  * WholeStageCodegen span, zero shuffle, zero serialization boundaries).
  */
object MediaCodec {

  // -- deterministic byte-stream derivation (fixture side + oracle) ------

  /** n pseudo-random bytes: md5("<id>_0") ++ md5("<id>_1") ++ …, truncated.
    * DuckDB replays each byte as ('0x' || substr(md5(id || '_' || b),
    * 2j+1, 2))::UBIGINT. */
  def derivedBytes(id: Long, n: Int): Array[Byte] = {
    val md = MessageDigest.getInstance("MD5")
    val out = new Array[Byte](n)
    var b = 0
    var off = 0
    while (off < n) {
      md.reset()
      val block = md.digest(s"${id}_$b".getBytes(StandardCharsets.UTF_8))
      val len = math.min(16, n - off)
      System.arraycopy(block, 0, out, off, len)
      off += len
      b += 1
    }
    out
  }

  // -- PPM (P6): "P6\n<w> <h>\n255\n" + w*h*3 RGB bytes ------------------

  def ppmWidth(id: Long): Int = 8 + (id % 8).toInt
  val PpmHeight = 8

  /** Encode a deterministic w×8 P6 image for media id. */
  def ppmPayload(id: Long): Array[Byte] = {
    val w = ppmWidth(id)
    val header = s"P6\n$w $PpmHeight\n255\n".getBytes(StandardCharsets.US_ASCII)
    val px = derivedBytes(id, w * PpmHeight * 3)
    val out = new Array[Byte](header.length + px.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(px, 0, out, header.length, px.length)
    out
  }

  /** Decode a P6 payload → [w, h, sum_r, sum_g, sum_b]; null when the
    * magic is wrong, the header is malformed, maxval != 255, or the pixel
    * data is truncated (poisoning, the `cosine` contract). */
  def ppmStats(payload: Array[Byte]): Any = {
    // header scan: "P6" then three whitespace-delimited ASCII ints and
    // exactly one whitespace byte before the binary pixel block
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return null
    var i = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      while (i < payload.length && Character.isWhitespace(payload(i))) i += 1
      if (i >= payload.length || payload(i) < '0' || payload(i) > '9') return null
      var x = 0
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        x = x * 10 + (payload(i) - '0')
        i += 1
      }
      vals(v) = x
      v += 1
    }
    if (i >= payload.length || !Character.isWhitespace(payload(i))) return null
    i += 1 // single whitespace terminates the header
    val w = vals(0); val h = vals(1)
    if (vals(2) != 255 || w <= 0 || h <= 0) return null
    val n = w * h * 3
    if (payload.length - i < n) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    var p = 0
    while (p < n) {
      val b = payload(i + p) & 0xFF
      (p % 3) match {
        case 0 => sr += b
        case 1 => sg += b
        case _ => sb += b
      }
      p += 1
    }
    new GenericArrayData(Array(w.toLong, h.toLong, sr, sg, sb))
  }

  /** Perceptual average-hash over a P6 payload: per-pixel integer
    * grayscale (r+g+b) div 3, image mean by integer division, bit j set
    * iff pixel j's gray >= mean (row-major, first 64 pixels — every
    * fixture image has >= 8x8). All-integer, so an engine replaying the
    * same bytes derives the identical 64-bit hash. Null on malformed
    * input or images smaller than 64 pixels. */
  def ppmAHash(payload: Array[Byte]): Any = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return null
    var i = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      while (i < payload.length && Character.isWhitespace(payload(i))) i += 1
      if (i >= payload.length || payload(i) < '0' || payload(i) > '9') return null
      var x = 0
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        x = x * 10 + (payload(i) - '0')
        i += 1
      }
      vals(v) = x
      v += 1
    }
    if (i >= payload.length || !Character.isWhitespace(payload(i))) return null
    i += 1
    val w = vals(0); val h = vals(1)
    if (vals(2) != 255 || w <= 0 || h <= 0) return null
    val n = w * h
    if (n < 64 || payload.length - i < n * 3) return null
    val gray = new Array[Int](n)
    var sum = 0L
    var p = 0
    while (p < n) {
      val r = payload(i + p * 3) & 0xFF
      val g = payload(i + p * 3 + 1) & 0xFF
      val b = payload(i + p * 3 + 2) & 0xFF
      gray(p) = (r + g + b) / 3
      sum += gray(p)
      p += 1
    }
    val mean = sum / n
    var hash = 0L
    var j = 0
    while (j < 64) {
      if (gray(j) >= mean) hash |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** Nearest-neighbor resize of a P6 payload to tw×th: target pixel
    * (ty, tx) samples source pixel (ty*h div th, tx*w div tw) — the
    * standard integer NN mapping, so an engine replaying the same byte
    * stream picks the identical source offsets. Returns the resized
    * image as a flat [r0, g0, b0, r1, …] long array (row-major); null on
    * malformed input (same poisoning contract as [[ppmStats]]). Resizing
    * to the source dimensions is the identity on the pixel block (the
    * spec pins that). */
  def ppmResize(payload: Array[Byte], tw: Int, th: Int): Any = {
    if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return null
    var i = 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      while (i < payload.length && Character.isWhitespace(payload(i))) i += 1
      if (i >= payload.length || payload(i) < '0' || payload(i) > '9') return null
      var x = 0
      while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
        x = x * 10 + (payload(i) - '0')
        i += 1
      }
      vals(v) = x
      v += 1
    }
    if (i >= payload.length || !Character.isWhitespace(payload(i))) return null
    i += 1
    val w = vals(0); val h = vals(1)
    if (vals(2) != 255 || w <= 0 || h <= 0 || tw <= 0 || th <= 0) return null
    if (payload.length - i < w * h * 3) return null
    val out = new Array[Long](tw * th * 3)
    var t = 0
    while (t < tw * th) {
      val sy = (t / tw) * h / th
      val sx = (t % tw) * w / tw
      val src = i + (sy * w + sx) * 3
      out(t * 3) = payload(src) & 0xFF
      out(t * 3 + 1) = payload(src + 1) & 0xFF
      out(t * 3 + 2) = payload(src + 2) & 0xFF
      t += 1
    }
    new GenericArrayData(out)
  }

  // -- WAV (RIFF PCM16 mono): 44-byte canonical header + LE samples ------

  def wavSamples(id: Long): Int = 256 + (id % 256).toInt
  val WavSampleRate = 8000

  private def putLeInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v & 0xFF).toByte
    a(off + 1) = ((v >> 8) & 0xFF).toByte
    a(off + 2) = ((v >> 16) & 0xFF).toByte
    a(off + 3) = ((v >> 24) & 0xFF).toByte
  }
  private def putLeShort(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v & 0xFF).toByte
    a(off + 1) = ((v >> 8) & 0xFF).toByte
  }
  private def putTag(a: Array[Byte], off: Int, s: String): Unit = {
    val t = s.getBytes(StandardCharsets.US_ASCII)
    System.arraycopy(t, 0, a, off, 4)
  }

  /** Encode a deterministic PCM16 mono WAV for media id. */
  def wavPayload(id: Long): Array[Byte] = {
    val n = wavSamples(id)
    val dataSize = n * 2
    val out = new Array[Byte](44 + dataSize)
    putTag(out, 0, "RIFF"); putLeInt(out, 4, 36 + dataSize)
    putTag(out, 8, "WAVE")
    putTag(out, 12, "fmt "); putLeInt(out, 16, 16)
    putLeShort(out, 20, 1)             // PCM
    putLeShort(out, 22, 1)             // mono
    putLeInt(out, 24, WavSampleRate)
    putLeInt(out, 28, WavSampleRate * 2)
    putLeShort(out, 32, 2)             // block align
    putLeShort(out, 34, 16)            // bits per sample
    putTag(out, 36, "data"); putLeInt(out, 40, dataSize)
    System.arraycopy(derivedBytes(id, dataSize), 0, out, 44, dataSize)
    out
  }

  private def leInt(a: Array[Byte], off: Int): Int =
    (a(off) & 0xFF) | ((a(off + 1) & 0xFF) << 8) |
      ((a(off + 2) & 0xFF) << 16) | ((a(off + 3) & 0xFF) << 24)
  private def leShort(a: Array[Byte], off: Int): Int =
    (a(off) & 0xFF) | ((a(off + 1) & 0xFF) << 8)
  private def tagAt(a: Array[Byte], off: Int, s: String): Boolean =
    a(off) == s.charAt(0) && a(off + 1) == s.charAt(1) &&
      a(off + 2) == s.charAt(2) && a(off + 3) == s.charAt(3)

  /** Per-frame zero-crossing count and peak amplitude of a PCM16 mono
    * WAV — the two classic integer audio features (speech/music and
    * clipping triage). Per frame f of `frameLen` samples: zcr = #{i in
    * frame, i > frame start : sign(s[i-1]) != sign(s[i])} (sign = `< 0`,
    * so zero is nonnegative — no float epsilon), peak = max |s_i| (32768
    * fits in Long). Same RIFF chunk walk as [[wavFrameEnergies]]; null
    * on malformed input. Returns [zcr_0, peak_0, zcr_1, peak_1, …]
    * interleaved (a flat long array keeps the expression's dataType
    * primitive — the query side un-interleaves with one posexplode). */
  def wavFrameZcrPeak(payload: Array[Byte], frameLen: Int): Any = {
    // non-positive framing poisons to null (the wavDecimateStats factor
    // contract), never a division-by-zero task failure
    if (frameLen <= 0) return null
    if (payload.length < 12 || !tagAt(payload, 0, "RIFF") ||
        !tagAt(payload, 8, "WAVE")) return null
    var off = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= payload.length && dataOff < 0) {
      val size = leInt(payload, off + 4)
      if (size < 0 || off.toLong + 8 + size > payload.length) return null
      if (tagAt(payload, off, "fmt ")) {
        fmtOk = size >= 16 && leShort(payload, off + 8) == 1 &&
          leShort(payload, off + 10) == 1 && leShort(payload, off + 22) == 16
        if (!fmtOk) return null
      } else if (tagAt(payload, off, "data")) {
        dataOff = off + 8
        dataLen = size
      }
      off += 8 + size + (size & 1)
    }
    if (!fmtOk || dataOff < 0 || dataLen % 2 != 0) return null
    val n = dataLen / 2
    val nFrames = (n + frameLen - 1) / frameLen
    val out = new Array[Long](nFrames * 2)
    var f = 0
    while (f < nFrames) {
      var zcr = 0L
      var peak = 0L
      var i = f * frameLen
      val end = math.min(i + frameLen, n)
      var prevNeg = false
      var first = true
      while (i < end) {
        val s = (leShort(payload, dataOff + 2 * i) << 16) >> 16
        val neg = s < 0
        if (!first && neg != prevNeg) zcr += 1
        prevNeg = neg
        first = false
        val a = math.abs(s.toLong)
        if (a > peak) peak = a
        i += 1
      }
      out(f * 2) = zcr
      out(f * 2 + 1) = peak
      f += 1
    }
    new GenericArrayData(out)
  }

  /** Decimation resample of a PCM16 mono WAV: keep every `factor`-th
    * sample (the integer-rate downsample every audio pipeline runs
    * before feature extraction; no interpolation filter, so every kept
    * sample is a SOURCE sample and the result replays exactly).
    * Returns [n_kept, energy, peak] over the decimated signal — exact
    * in Long. Same RIFF chunk walk as [[wavFrameEnergies]]; null on
    * malformed input. */
  def wavDecimateStats(payload: Array[Byte], factor: Int): Any = {
    if (payload.length < 12 || !tagAt(payload, 0, "RIFF") ||
        !tagAt(payload, 8, "WAVE")) return null
    var off = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= payload.length && dataOff < 0) {
      val size = leInt(payload, off + 4)
      if (size < 0 || off.toLong + 8 + size > payload.length) return null
      if (tagAt(payload, off, "fmt ")) {
        fmtOk = size >= 16 && leShort(payload, off + 8) == 1 &&
          leShort(payload, off + 10) == 1 && leShort(payload, off + 22) == 16
        if (!fmtOk) return null
      } else if (tagAt(payload, off, "data")) {
        dataOff = off + 8
        dataLen = size
      }
      off += 8 + size + (size & 1)
    }
    if (!fmtOk || dataOff < 0 || dataLen % 2 != 0 || factor <= 0) return null
    val n = dataLen / 2
    var kept = 0L
    var energy = 0L
    var peak = 0L
    var i = 0
    while (i < n) {
      val s = (leShort(payload, dataOff + 2 * i) << 16) >> 16
      kept += 1
      energy += s.toLong * s
      val a = math.abs(s.toLong)
      if (a > peak) peak = a
      i += factor
    }
    new GenericArrayData(Array(kept, energy, peak))
  }

  /** Per-frame integer energies of a PCM16 mono WAV, keeping every
    * `stride`-th frame of `frameLen` samples (the trailing partial frame
    * counts): energy_f = Σ s_i² over frame f — exact in Long (≤ 2^30 per
    * sample, frameLen ≪ 2^33). Walks the RIFF chunk list like a real
    * demuxer (tolerates extra chunks before `data`); null when the RIFF/
    * WAVE magic, fmt (PCM16 mono), or data chunk is missing/truncated. */
  def wavFrameEnergies(payload: Array[Byte], frameLen: Int, stride: Int): Any = {
    // non-positive framing poisons to null (the wavDecimateStats factor
    // contract), never a division-by-zero task failure
    if (frameLen <= 0 || stride <= 0) return null
    if (payload.length < 12 || !tagAt(payload, 0, "RIFF") ||
        !tagAt(payload, 8, "WAVE")) return null
    var off = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= payload.length && dataOff < 0) {
      val size = leInt(payload, off + 4)
      if (size < 0 || off.toLong + 8 + size > payload.length) return null
      if (tagAt(payload, off, "fmt ")) {
        fmtOk = size >= 16 && leShort(payload, off + 8) == 1 &&
          leShort(payload, off + 10) == 1 && leShort(payload, off + 22) == 16
        if (!fmtOk) return null
      } else if (tagAt(payload, off, "data")) {
        dataOff = off + 8
        dataLen = size
      }
      off += 8 + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0 || dataLen % 2 != 0) return null
    val n = dataLen / 2
    val nFrames = (n + frameLen - 1) / frameLen
    val kept = if (nFrames == 0) 0 else (nFrames + stride - 1) / stride
    val out = new Array[Long](kept)
    var f = 0
    var o = 0
    while (f < nFrames) {
      if (f % stride == 0) {
        var e = 0L
        var i = f * frameLen
        val end = math.min(i + frameLen, n)
        while (i < end) {
          val s = (leShort(payload, dataOff + 2 * i) << 16) >> 16 // sign-extend
          e += s.toLong * s
          i += 1
        }
        out(o) = e
        o += 1
      }
      f += 1
    }
    new GenericArrayData(out)
  }
}

/** media_id (long) → deterministic P6 PPM payload (fixture prep). */
case class PpmEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "ppm_encode"
  override protected def nullSafeEval(v: Any): Any =
    MediaCodec.ppmPayload(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.MediaCodec.ppmPayload($c)")
  override protected def withNewChildInternal(newChild: Expression): PpmEncode =
    copy(child = newChild)
}

/** media_id (long) → deterministic PCM16 WAV payload (fixture prep). */
case class WavEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_encode"
  override protected def nullSafeEval(v: Any): Any =
    MediaCodec.wavPayload(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.operators.MediaCodec.wavPayload($c)")
  override protected def withNewChildInternal(newChild: Expression): WavEncode =
    copy(child = newChild)
}

/** P6 payload → [w, h, sum_r, sum_g, sum_b]; null on malformed input. */
case class PpmStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ppm_stats"
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodec.ppmStats(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("ppmR")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = graft.operators.MediaCodec.ppmStats($c);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): PpmStats =
    copy(child = newChild)
}

/** P6 payload → 64-bit perceptual average-hash; null on malformed input. */
case class PpmAHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "ppm_ahash"
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodec.ppmAHash(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("ahashR")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = graft.operators.MediaCodec.ppmAHash($c);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): PpmAHash =
    copy(child = newChild)
}

/** P6 payload → tw×th nearest-neighbor resize as flat [r,g,b,…] longs;
  * null on malformed input. */
case class PpmResize(child: Expression, tw: Int, th: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ppm_resize"
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodec.ppmResize(v.asInstanceOf[Array[Byte]], tw, th)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("rszR")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = graft.operators.MediaCodec.ppmResize($c, $tw, $th);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): PpmResize =
    copy(child = newChild)
}

/** WAV payload → [n_kept, energy, peak] of the decimated signal; null
  * on malformed input. */
case class WavDecimateStats(child: Expression, factor: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "wav_decimate_stats"
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodec.wavDecimateStats(v.asInstanceOf[Array[Byte]], factor)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("decR")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = graft.operators.MediaCodec.wavDecimateStats($c, $factor);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): WavDecimateStats =
    copy(child = newChild)
}

/** WAV payload → kept-frame energies; null on malformed input. */
case class WavFrameEnergies(child: Expression, frameLen: Int, stride: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "wav_frame_energies"
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodec.wavFrameEnergies(v.asInstanceOf[Array[Byte]], frameLen, stride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("wavR")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = graft.operators.MediaCodec.wavFrameEnergies(
        $c, $frameLen, $stride);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): WavFrameEnergies =
    copy(child = newChild)
}

/** WAV payload → interleaved per-frame [zcr, peak]; null on malformed
  * input. */
case class WavFrameZcrPeak(child: Expression, frameLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "wav_frame_zcr_peak"
  override def nullable: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    MediaCodec.wavFrameZcrPeak(v.asInstanceOf[Array[Byte]], frameLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("zcrR")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = graft.operators.MediaCodec.wavFrameZcrPeak($c, $frameLen);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): WavFrameZcrPeak =
    copy(child = newChild)
}

object MediaCodecColumns {
  def ppmEncode(id: Column): Column =
    ColumnBridge.column(PpmEncode(ColumnBridge.expression(id)))
  def wavEncode(id: Column): Column =
    ColumnBridge.column(WavEncode(ColumnBridge.expression(id)))
  def ppmStats(payload: Column): Column =
    ColumnBridge.column(PpmStats(ColumnBridge.expression(payload)))
  def ppmAHash(payload: Column): Column =
    ColumnBridge.column(PpmAHash(ColumnBridge.expression(payload)))
  def ppmResize(payload: Column, tw: Int, th: Int): Column =
    ColumnBridge.column(PpmResize(ColumnBridge.expression(payload), tw, th))
  def wavFrameEnergies(payload: Column, frameLen: Int, stride: Int): Column =
    ColumnBridge.column(WavFrameEnergies(
      ColumnBridge.expression(payload), frameLen, stride))
  def wavFrameZcrPeak(payload: Column, frameLen: Int): Column =
    ColumnBridge.column(WavFrameZcrPeak(
      ColumnBridge.expression(payload), frameLen))
  def wavDecimateStats(payload: Column, factor: Int): Column =
    ColumnBridge.column(WavDecimateStats(
      ColumnBridge.expression(payload), factor))
}
