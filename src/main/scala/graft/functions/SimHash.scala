package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}

/** 64-bit SimHash of a token array as a NATIVE Catalyst expression.
  *
  * Semantics: bit j is set iff a majority of tokens have bit j set in
  * xxhash64(token) — exactly the HOF formulation (each token hashed with
  * Spark's own XXH64, seed 42, so signatures are bit-identical to
  * `xxhash64(t)` column results), but the 64-counter accumulation runs
  * as a tight JVM loop instead of interpreted higher-order-function
  * lambdas (which box every intermediate — the measured cost model at
  * sf0.1 was ~6 s of signature time for 5k docs; this loop is
  * negligible). Codegen'd, so the whole scan → signature → explode
  * pipeline stays in one WholeStageCodegen span.
  */
object SimHashFns {
  /** counters loop shared by eval and codegen. */
  def ofTokens(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < 64) {
          counters(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counters(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any =
    SimHashFns.ofTokens(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashFns.ofTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash {
  /** Column API: simhash64(array<string> tokens) → long. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
