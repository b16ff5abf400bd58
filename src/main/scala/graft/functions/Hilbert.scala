package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert space-filling curve index — the locality-preserving layout key
  * that strictly dominates the Z-curve (operators/Layout.scala) for 2-D
  * range pruning: every unit step of the Hilbert walk is a grid-NEIGHBOR
  * move, so an index range [a, b] covers a compact blob with no Z-corner
  * jumps, and a rectangle query touches fewer index runs (the layout
  * Delta 3.x's OPTIMIZE ... BY HILBERT and Hudi's hilbert clustering
  * write for exactly this reason).
  *
  * The quadrant-fold recurrence is the classic public xy2d formulation
  * (Hamilton's compact Hilbert indices / the Wikipedia iterative form):
  * walk bit planes from the top; at each scale s the quadrant id is
  * gray-coded from (rx, ry), and the lower plane is reflected/transposed
  * into the quadrant's frame. Pure integer arithmetic — one tight loop
  * per row in WholeStageCodegen here, and an unrolled 8-level CTE chain
  * in the DuckDB oracle (see PipelineQueries p22) replays it bit-exactly.
  */
object HilbertIndex {

  /** Map (x, y) on the 2^bits × 2^bits grid to its Hilbert index in
    * [0, 4^bits). Inputs outside the grid are masked into it (callers
    * scale first; the mask keeps the loop total). */
  def compute(bits: Int, x0: Long, y0: Long): Long = {
    val mask = (1L << bits) - 1L
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0L) 1 else 0
      val ry = if ((y & s) != 0L) 1 else 0
      d += s * s * ((3 * rx) ^ ry)
      // rotate the lower plane into this quadrant's frame
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Inverse walk (d2xy): index → grid cell. Test-side only — the specs
    * prove compute∘inverse = id and that consecutive indices are grid
    * neighbors (THE Hilbert property; Z-order fails it at every power-of-
    * two boundary). */
  def inverse(bits: Int, dIn: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = dIn
    var s = 1L
    val n = 1L << bits
    while (s < n) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }
}

/** Codegen'd Hilbert index of two long columns. A Column-level unroll of
  * the 8-round fold would re-reference x and y in every CASE arm — the
  * expression tree grows ~5× per round (≈400k nodes at 8 bits), which is
  * exactly the shape that blows past the codegen method-size limit and
  * falls back to interpreted eval. One native expression keeps it a
  * 10-line loop. */
case class HilbertCode(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits out of range: $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_code"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex.compute(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.HilbertIndex.compute($bits, $a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertCode =
    copy(left = newLeft, right = newRight)
}

object Hilbert {
  def code(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.column(HilbertCode(
      ColumnBridge.expression(x), ColumnBridge.expression(y), bits))
}

/** Jump consistent hash (Lamping & Veach, arXiv 2014) — the shard
  * assignment with MINIMAL MOVEMENT under resize: going from n to n+1
  * shards moves exactly the keys that land on the new shard (≈ 1/(n+1)
  * of them) and NO others, where `key % n` reshuffles nearly
  * everything. That is the property a 100 TB re-shard lives or dies
  * by: adding capacity must not rewrite the whole layout. O(ln n)
  * expected iterations per key, zero memory, no ring to store.
  */
object JumpHash {

  /** Reference loop — the published algorithm verbatim (wrapping
    * 64-bit LCG; unsigned shift keeps the double positive). */
  def compute(key0: Long, numShards: Int): Int = {
    require(numShards > 0, s"numShards must be positive: $numShards")
    var key = key0
    var b = -1L
    var j = 0L
    while (j < numShards) {
      b = j
      key = key * 2862933555777941757L + 1
      j = ((b + 1) * ((1L << 31).toDouble / ((key >>> 33) + 1).toDouble))
        .toLong
    }
    b.toInt
  }
}

/** Codegen'd jump hash of a long key column. */
case class JumpHashCode(child: Expression, numShards: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(numShards > 0, s"numShards must be positive: $numShards")

  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "jump_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint key, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any =
    JumpHash.compute(v.asInstanceOf[Long], numShards)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JumpHash.compute($c, $numShards)")

  override protected def withNewChildInternal(newChild: Expression): JumpHashCode =
    copy(child = newChild)
}

object JumpHashColumn {
  def jumpHash(key: Column, numShards: Int): Column =
    ColumnBridge.column(JumpHashCode(ColumnBridge.expression(key), numShards))
}

