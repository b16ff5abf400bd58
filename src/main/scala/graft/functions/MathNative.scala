package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Natural log via `java.lang.Math.log` — NOT Spark's built-in `log`,
  * which routes through `StrictMath.log` (fdlibm) and disagrees with
  * platform libm by 1 ulp on ~4% of inputs (measured 26/600 on BM25
  * idf-shaped values). `Math.log` compiles to the libm-faithful
  * intrinsic, bit-identical to DuckDB/libm `ln` on every value tested,
  * which is what lets BM25 scores hash-match an external oracle
  * (operators/Retrieval.scala). */
case class LnLibm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "ln_libm"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any =
    java.lang.Math.log(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"java.lang.Math.log($c)")

  override protected def withNewChildInternal(newChild: Expression): LnLibm =
    copy(child = newChild)
}

object MathNative {
  def lnLibm(c: Column): Column =
    ColumnBridge.column(LnLibm(ColumnBridge.expression(c)))
}
