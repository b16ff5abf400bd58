package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) of a
  * token array as ONE fused native expression: k-gram md5-derived hashes
  * → sliding-window minima (monotonic deque, O(grams)) → sorted distinct
  * set.
  *
  * Fused for the same reason as MinHashTokensSig/SimHash64: the
  * higher-order-function formulation — `transform(sequence…, i ->
  * array_min(slice(hashes, i, w)))` — INLINES the whole gram+hash
  * pipeline expression inside the window lambda, and interpreted HOFs do
  * no common-subexpression elimination, so every window re-tokenized,
  * re-built and re-hashed every gram of the document: measured 237 s at
  * sf0.1 where this kernel is ~1 s. Codegen'd, so scan → fingerprints →
  * explode stays in one WholeStageCodegen span.
  */
object WinnowFns {
  /** Positional k-gram hashes: h(i) = md5-derived 64-bit hash of
    * tokens[i..i+k-1] joined by ' ' (SimHashFns.tokenHash, so a SQL
    * oracle rebuilds every value). A doc shorter than k tokens emits ONE
    * gram over its whole token list (concatWs skips the null padding). */
  def gramHashes(arr: ArrayData, k: Int): Array[Long] = {
    val n = arr.numElements()
    val nGrams = math.max(n - k + 1, 1)
    val sep = UTF8String.fromString(" ")
    val scratch = new Array[UTF8String](k)
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      val len = math.min(k, n - i)
      var j = 0
      while (j < len) { scratch(j) = arr.getUTF8String(i + j); j += 1 }
      while (j < k) { scratch(j) = null; j += 1 } // concatWs skips nulls
      hashes(i) = SimHashFns.tokenHash(
        UTF8String.concatWs(sep, scratch: _*).getBytes)
      i += 1
    }
    hashes
  }

  def gramHashesArray(arr: ArrayData, k: Int): ArrayData =
    new GenericArrayData(gramHashes(arr, k))

  def fingerprints(arr: ArrayData, k: Int, w: Int): ArrayData = {
    val hashes = gramHashes(arr, k)
    val nGrams = hashes.length
    // sorted distinct window minima; TreeSet orders signed ascending,
    // matching sort_array / the oracle's list_sort
    val mins = new java.util.TreeSet[java.lang.Long]()
    if (nGrams <= w) {
      var m = Long.MaxValue
      var t = 0
      while (t < nGrams) { if (hashes(t) < m) m = hashes(t); t += 1 }
      mins.add(m)
    } else {
      val deque = new java.util.ArrayDeque[Integer]()
      var t = 0
      while (t < nGrams) {
        while (!deque.isEmpty && deque.peekFirst() <= t - w) deque.pollFirst()
        while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(t))
          deque.pollLast()
        deque.addLast(t)
        if (t >= w - 1) mins.add(hashes(deque.peekFirst()))
        t += 1
      }
    }
    val out = new Array[Long](mins.size())
    val it = mins.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override protected def nullSafeEval(v: Any): Any =
    WinnowFns.fingerprints(v.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFns.fingerprints($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** All positional k-gram hashes of a token array (no winnowing): the
  * signature source for exact-substring dedup (d08) — position i's hash
  * identifies the substring tokens[i..i+k-1], so runs of globally
  * duplicated positions ARE duplicated spans. Fused for the same reason
  * as [[WinnowFingerprints]]: one codegen'd pass, no HOF re-evaluation. */
case class GramHashes(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(v: Any): Any =
    WinnowFns.gramHashesArray(v.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFns.gramHashesArray($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
}

object Winnow {
  /** Column API: winnow_fingerprints(array<string> tokens) → array<long>. */
  def fingerprints(tokens: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(tokens), k, w))

  /** Column API: gram_hashes(array<string> tokens) → array<long>. */
  def gramHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(GramHashes(ColumnBridge.expression(tokens), k))
}
