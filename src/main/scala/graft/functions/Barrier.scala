package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Value-identity expression that the planner cannot see through: a column
  * projected as `partitioning_barrier(x)` carries x's exact values but NOT
  * x's partitioning lineage, because alias-aware output partitioning
  * (ProjectExec / HashAggregateExec) only propagates through bare
  * `Alias(Attribute)` — an opaque unary expression over the attribute is
  * dropped from the output partitioning, leaving UnknownPartitioning.
  *
  * Why that is useful: AQE's OptimizeSkewedJoin only fires when BOTH join
  * inputs are bare ENSURE_REQUIREMENTS shuffle stages. A `groupBy(gh)`
  * aggregate feeding a join on `gh` satisfies the join's distribution with
  * its own exchange, so the aggregate side enters the join without a fresh
  * shuffle stage — and a hot key (e.g. a boilerplate gram duplicated 10^8
  * times at corpus scale) is pinned to ONE reducer with no split. Wrapping
  * the aggregate's join key in this barrier makes EnsureRequirements insert
  * a lazy exchange on that side, restoring skew-splittability — WITHOUT the
  * eager materialization a `localCheckpoint` would cost (round 9 paid a
  * measured 2-9x on d08/d09 for exactly that). Hashing is by value, so the
  * two sides still co-locate. In the broadcast regime (small dup set) the
  * barrier is a no-op projection and the fully-fused streaming plan
  * survives.
  *
  * Codegen'd pass-through: zero per-row cost inside WholeStageCodegen.
  */
case class PartitioningBarrier(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def prettyName: String = "partitioning_barrier"

  override protected def nullSafeEval(v: Any): Any = v

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): PartitioningBarrier =
    copy(child = newChild)
}

object Barrier {
  /** Column API: identical values, severed partitioning lineage. */
  def partitioning(c: Column): Column =
    ColumnBridge.column(PartitioningBarrier(ColumnBridge.expression(c)))
}
