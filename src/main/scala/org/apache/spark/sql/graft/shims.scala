package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Add, EvalMode, Expression, Multiply}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's package-private Column ↔ Expression conversions.
  * Spark 4 made `Column` backend-agnostic; libraries that ship native
  * Catalyst expressions use this well-known shim pattern (same technique
  * as spark-daria / frameless / delta — a tiny object inside the
  * org.apache.spark.sql package tree).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame over an already-parsed logical plan (Dataset.ofRows is
    * private[sql]) — lets a caller that parsed a statement to CLASSIFY it
    * execute the same plan without re-parsing/re-analyzing. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrapping (2-complement) long arithmetic for hash mixing — ANSI mode
    * (Spark 4 default) makes `*`/`+` throw on overflow, but universal
    * hashing WANTS modular wraparound. */
  def wrapMul(a: Column, b: Column): Column =
    column(Multiply(expression(a), expression(b), EvalMode.LEGACY))
  def wrapAdd(a: Column, b: Column): Column =
    column(Add(expression(a), expression(b), EvalMode.LEGACY))
}
