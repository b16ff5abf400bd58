package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** numPerm-wide MinHash signature of a shingle array as a NATIVE Catalyst
  * expression.
  *
  * Each shingle is hashed ONCE — the first 8 bytes of md5(shingle),
  * big-endian ([[SimHashFns.tokenHash]]; md5, not xxhash64, so a SQL
  * oracle can rebuild the base hash from
  * `('0x' || substr(md5(s), …))::UBIGINT` halves) — then numPerm
  * multiply-shift permutations π_p(h) = a_p·h + b_p with
  * SplittableRandom(0x5EED5EED)-derived coefficients, sig[p] = min. The
  * wrapping 64-bit arithmetic is SQL-reproducible too: HUGEINT multiply,
  * mod 2^64, re-center to signed. The perm loop runs as a tight JVM loop
  * over a primitive long array — the interpreted `aggregate`/`zip_with`
  * lambdas allocated a fresh boxed 64-element array per shingle, which
  * measured 7.3 s of d02's 7.5 s at sf0.1. Codegen'd, so scan → shingle
  * → signature stays in one WholeStageCodegen span.
  */
object MinHashFns {
  /** (a, b) coefficient arrays per numPerm — derived exactly like the HOF
    * version: one SplittableRandom stream, all a's first, then all b's. */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  def coeffs(numPerm: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(numPerm, { n =>
      val rnd = new java.util.SplittableRandom(0x5EED5EEDL)
      val as = Array.fill(n)(rnd.nextLong() | 1L)
      val bs = Array.fill(n)(rnd.nextLong())
      (as, bs)
    })

  /** Fused shingle → hash → min pipeline over the raw TOKEN array: for
    * each word w-gram (same windowing as Dedup.shingles — max(n-w,0)+1
    * windows, short docs yield one truncated window) build the
    * space-joined shingle, hash it once, update the numPerm minima.
    * No shingle array, no distinct (min is idempotent — duplicate
    * shingles cannot change a minimum), no intermediate allocation
    * beyond one scratch window. */
  def signatureOfTokens(arr: ArrayData, w: Int, numPerm: Int): ArrayData = {
    val (as, bs) = coeffs(numPerm)
    val sig = Array.fill(numPerm)(Long.MaxValue)
    val n = arr.numElements()
    val windows = math.max(n - w, 0) + 1
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val scratch = new Array[org.apache.spark.unsafe.types.UTF8String](w)
    var i = 0
    while (i < windows) {
      val len = math.min(w, n - i)
      var j = 0
      while (j < len) { scratch(j) = arr.getUTF8String(i + j); j += 1 }
      while (j < w) { scratch(j) = null; j += 1 } // concatWs skips nulls
      val h = SimHashFns.tokenHash(
        org.apache.spark.unsafe.types.UTF8String.concatWs(sep, scratch: _*)
          .getBytes)
      var p = 0
      while (p < numPerm) {
        val v = as(p) * h + bs(p)
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  def signature(arr: ArrayData, numPerm: Int): ArrayData = {
    val (as, bs) = coeffs(numPerm)
    val sig = Array.fill(numPerm)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = SimHashFns.tokenHash(arr.getUTF8String(i).getBytes)
        var p = 0
        while (p < numPerm) {
          val v = as(p) * h + bs(p)
          if (v < sig(p)) sig(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

case class MinHashSig(child: Expression, numPerm: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(v: Any): Any =
    MinHashFns.signature(v.asInstanceOf[ArrayData], numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashFns.signature($c, $numPerm)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Word w-shingles of a token array as a native expression: the distinct
  * (first-occurrence order, matching array_distinct) space-joined sliding
  * windows — the HOF `transform(sequence…, slice+concat_ws)` chain it
  * replaces materialized every window through interpreted lambdas. Same
  * windowing as [[MinHashFns.signatureOfTokens]]: max(n-w,0)+1 windows,
  * short docs yield one truncated window. */
case class WordShingles(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(v: Any): Any =
    WordShingles.of(v.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WordShingles.of($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def of(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    val windows = math.max(n - w, 0) + 1
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val scratch = new Array[org.apache.spark.unsafe.types.UTF8String](w)
    var i = 0
    while (i < windows) {
      val len = math.min(w, n - i)
      var j = 0
      while (j < len) { scratch(j) = arr.getUTF8String(i + j); j += 1 }
      while (j < w) { scratch(j) = null; j += 1 } // concatWs skips nulls
      seen.add(org.apache.spark.unsafe.types.UTF8String.concatWs(sep, scratch: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }
}

case class MinHashTokensSig(child: Expression, w: Int, numPerm: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_tokens_sig"

  override protected def nullSafeEval(v: Any): Any =
    MinHashFns.signatureOfTokens(v.asInstanceOf[ArrayData], w, numPerm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashFns.signatureOfTokens($c, $w, $numPerm)")

  override protected def withNewChildInternal(newChild: Expression): MinHashTokensSig =
    copy(child = newChild)
}

/** Position-wise agreement count of two signature arrays — the MinHash
  * Jaccard estimator's kernel (agree/numPerm), as a tight primitive loop
  * so the d02 verify runs inside the band join's codegen span instead of
  * an interpreted `zip_with` allocating a boxed 64-wide array per pair
  * (at sf1 the band join evaluates ~13M candidate pairs). */
object SigAgreeFns {
  def agree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var c = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }
}

case class SigAgree(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "sig_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SigAgreeFns.agree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SigAgreeFns.agree($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigAgree =
    copy(left = newLeft, right = newRight)
}

object MinHash {
  /** Column API: minhash_sig(array<string> shingles) → array<long>. */
  def minhashSig(shingles: Column, numPerm: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numPerm))

  /** Fused Column API: minhash over w-shingles of a token array. */
  def minhashTokensSig(tokens: Column, w: Int, numPerm: Int): Column =
    ColumnBridge.column(
      MinHashTokensSig(ColumnBridge.expression(tokens), w, numPerm))

  /** Column API: sig_agree(array<long>, array<long>) → int. */
  def sigAgree(a: Column, b: Column): Column =
    ColumnBridge.column(
      SigAgree(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
