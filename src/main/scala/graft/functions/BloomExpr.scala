package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** might_contain over a driver-built [[BloomFilter]], as a codegen'd
  * expression (the Int8NearestList reference-object pattern): the filter
  * rides to executors inside the generated code's references array, so a
  * membership pre-filter runs inside WholeStageCodegen with no UDF
  * boxing and no join. False positives only — callers must verify
  * candidates exactly (see Dedup.contaminatedDocsBloom). */
case class BloomMightContain(child: Expression, bf: BloomFilter)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any =
    bf.mightContainString(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bf", bf,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bfRef.mightContainString($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomExpr {
  def mightContain(c: Column, bf: BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(c), bf))
}
