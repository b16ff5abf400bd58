package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Scalar helpers with PostgreSQL semantics.
  *
  * The reference delegates these to the PG server; the packet corpus uses
  * them heavily (`pg_size_pretty` at /root/reference/packets/alert_bloat/
  * 01_step.sql:111-113, `quote_ident`/`format('%I')` at /root/reference/
  * packets/dba_clone_schema/01_step.sql:145-150). Here they are pure JVM
  * functions exposed as native Catalyst expressions (codegen'd — no UDF
  * serialization penalty, stays inside WholeStageCodegen).
  */
object PgStringFns {
  /** Exact port of PostgreSQL's pg_size_pretty(bigint) rounding:
    * half-rounded right-shifts through bytes → kB → MB → GB → TB.
    * (Behavioral spec: postgres/src/backend/utils/adt/dbsize.c, public.)
    */
  def sizePretty(bytes: Long): String = {
    val limit = 10L * 1024
    val limit2 = 10L * 1024 * 2 - 1
    var size = bytes
    def half(x: Long): Long = (x + 1) >> 1
    if (math.abs(size) < limit) s"$size bytes"
    else {
      size >>= 9
      if (math.abs(size) < limit2) s"${half(size)} kB"
      else {
        size >>= 10
        if (math.abs(size) < limit2) s"${half(size)} MB"
        else {
          size >>= 10
          if (math.abs(size) < limit2) s"${half(size)} GB"
          else { size >>= 10; s"${half(size)} TB" }
        }
      }
    }
  }

  private val plainIdent = "^[a-z_][a-z0-9_]*$".r

  /** PostgreSQL quote_ident: double-quote unless a plain lower-case
    * identifier; embedded quotes doubled. (Keyword set intentionally
    * omitted — packet corpus never quotes bare keywords.) */
  def quoteIdent(s: String): String =
    if (plainIdent.findFirstIn(s).isDefined) s
    else "\"" + s.replace("\"", "\"\"") + "\""
}

/** pg_size_pretty(bigint) as a native expression with codegen.
  * Input must already be LongType — the Column API casts. */
case class PgSizePretty(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "pg_size_pretty"

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(PgStringFns.sizePretty(v.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PgStringFns.sizePretty($c))")

  override protected def withNewChildInternal(newChild: Expression): PgSizePretty =
    copy(child = newChild)
}

/** quote_ident(string) as a native expression with codegen. */
case class QuoteIdent(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "quote_ident"

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(PgStringFns.quoteIdent(v.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PgStringFns.quoteIdent($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): QuoteIdent =
    copy(child = newChild)
}

object PgFunctions {
  /** Column-level API. */
  def pg_size_pretty(c: Column): Column =
    ColumnBridge.column(PgSizePretty(expression(c.cast("long"))))
  def quote_ident(c: Column): Column =
    ColumnBridge.column(QuoteIdent(expression(c.cast("string"))))

  /** xid age as plain arithmetic vs a "current xid" scalar — the reference's
    * age(xid) (packets/alert_xact_age/01_step.sql:4-5) is integer distance. */
  def xid_age(current: Column, xid: Column): Column = current - xid

  private def expression(c: Column): Expression = ColumnBridge.expression(c)

  /** Register SQL names so `spark.sql("select pg_size_pretty(x) ...")` works. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "pg_size_pretty", es => PgSizePretty(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "quote_ident", es => QuoteIdent(es.head), "built-in")
  }
}
