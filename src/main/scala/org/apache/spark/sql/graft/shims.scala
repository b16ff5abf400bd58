package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
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
}
