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
    // PG's half_rounded rounds toward zero for negatives ((x-1)/2), which
    // (x+1)>>1 would miss by one unit on negative sizes (wal lag deltas)
    def half(x: Long): Long = (x + (if (x < 0) -1 else 1)) / 2
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

  /** PostgreSQL quote_literal: single-quote wrap, embedded quotes doubled
    * (backslashes too, via the E'' form PG picks — the corpus never feeds
    * backslashes, so the plain form is kept). */
  def quoteLiteral(s: String): String =
    "'" + s.replace("'", "''") + "'"
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

/** pg_sleep(seconds) — the corpus's control-function straggler
  * (packets/test_sleep/01_step.sql:3; SURVEY §2.2 maps pg_cancel/
  * terminate_backend to job-group cancellation and pg_sleep to a
  * sleeping expression). Nondeterministic so Catalyst never folds or
  * reorders it; interruptible so a cancelled job group stops mid-sleep
  * exactly like the reference's cancelled backend. */
case class PgSleep(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "pg_sleep"
  override lazy val deterministic: Boolean = false

  override protected def nullSafeEval(v: Any): Any = {
    val ms = (v.asInstanceOf[Double] * 1000).toLong
    Thread.sleep(math.max(ms, 0L))
    true
  }

  override protected def withNewChildInternal(newChild: Expression): PgSleep =
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

/** quote_literal(string) as a native expression with codegen: wraps in
  * single quotes, doubling embedded quotes — the %L side of the format()
  * family (dba_idx_diag/06_step.sql builds DROP/ANALYZE commands with it).
  */
case class QuoteLiteral(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "quote_literal"

  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(PgStringFns.quoteLiteral(v.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PgStringFns.quoteLiteral($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): QuoteLiteral =
    copy(child = newChild)
}

object PgFunctions {
  /** Column-level API. */
  def pg_size_pretty(c: Column): Column =
    ColumnBridge.column(PgSizePretty(expression(c.cast("long"))))
  def quote_ident(c: Column): Column =
    ColumnBridge.column(QuoteIdent(expression(c.cast("string"))))
  def quote_literal(c: Column): Column =
    ColumnBridge.column(QuoteLiteral(expression(c.cast("string"))))

  /** xid age as plain arithmetic vs a "current xid" scalar — the reference's
    * age(xid) (packets/alert_xact_age/01_step.sql:4-5) is integer distance. */
  def xid_age(current: Column, xid: Column): Column = current - xid

  // -- age(timestamp) decomposition ------------------------------------
  // PostgreSQL age(d2, d1) symbolic interval (used by dba_long_queries /
  // alert_xact_age displays): months = calendar month distance, days
  // borrow from the month of the EARLIER date when negative. Same
  // algorithm as PG/DuckDB `age` for d2 >= d1 (the corpus's case).
  import org.apache.spark.sql.functions._

  private def ageParts(d2: Column, d1: Column): (Column, Column, Column) = {
    val dd = dayofmonth(d2) - dayofmonth(d1)
    val borrow = when(dd < 0, 1).otherwise(0)
    val days = when(dd < 0, dd + dayofmonth(last_day(d1))).otherwise(dd)
    val mmTotal = (year(d2) - year(d1)) * 12 + (month(d2) - month(d1)) - borrow
    (floor(mmTotal / 12).cast("long"), pmod(mmTotal, lit(12)).cast("long"),
      days.cast("long"))
  }
  def age_years(d2: Column, d1: Column): Column = ageParts(d2, d1)._1
  def age_months(d2: Column, d1: Column): Column = ageParts(d2, d1)._2
  def age_days(d2: Column, d1: Column): Column = ageParts(d2, d1)._3

  /** to_char(interval, 'HH24:MI:SS') over a duration in whole seconds
    * (alert_stat / dba_long_queries render intervals this way). */
  def interval_hh24miss(seconds: Column): Column = {
    val s = seconds.cast("long")
    concat(
      lpad(floor(s / 3600).cast("long").cast("string"), 2, "0"), lit(":"),
      lpad(floor(pmod(s, lit(3600L)) / 60).cast("long").cast("string"), 2, "0"),
      lit(":"),
      lpad(pmod(s, lit(60L)).cast("string"), 2, "0"))
  }

  /** PostgreSQL format() with %I / %L / %s / %% directives
    * (packets/dba_idx_diag/06_step.sql:13-18, dba_clone_schema throughout).
    * The format string is a compile-time constant, so it is parsed ONCE on
    * the driver into a concat of plain column expressions — %I becomes the
    * native QuoteIdent expression, %L single-quotes with '' doubling (NULL
    * renders as unquoted NULL, as in PG), %s casts to string. The result
    * stays fully codegen'd; no UDF, no per-row format parsing. */
  def pg_format(fmt: String, args: Column*): Column = {
    val parts = scala.collection.mutable.Buffer.empty[Column]
    val sb = new StringBuilder
    var argIdx = 0
    def flush(): Unit =
      if (sb.nonEmpty) { parts += lit(sb.toString); sb.clear() }
    def nextArg(): Column = {
      require(argIdx < args.length, s"format '$fmt': too few arguments")
      val a = args(argIdx); argIdx += 1; a
    }
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case '%' => sb += '%'
          case 'I' => flush(); parts += quote_ident(nextArg())
          case 'L' =>
            flush()
            val a = nextArg().cast("string")
            parts += when(a.isNull, lit("NULL"))
              .otherwise(concat(lit("'"), regexp_replace(a, "'", "''"), lit("'")))
          case 's' => flush(); parts += nextArg().cast("string")
          case c => throw new IllegalArgumentException(
            s"format '$fmt': unsupported directive %$c")
        }
        i += 2
      } else { sb += fmt.charAt(i); i += 1 }
    }
    flush()
    concat(parts.toSeq: _*)
  }

  // -- WAL LSN arithmetic (dba_lag/01_step.sql:3-7) ---------------------
  /** 'X/Y' hex LSN → absolute byte position (X·2^32 + Y). */
  def lsn_bytes(lsn: Column): Column =
    conv(split(lsn, "/").getItem(0), 16, 10).cast("long") * 4294967296L +
      conv(split(lsn, "/").getItem(1), 16, 10).cast("long")

  /** pg_wal_lsn_diff(a, b) = byte distance between two LSNs. */
  def pg_wal_lsn_diff(a: Column, b: Column): Column = lsn_bytes(a) - lsn_bytes(b)

  // -- PG interval rendering (verbatim-dialect packets) -----------------
  // PostgreSQL displays day-time intervals as `[-][D day[s] ]HH:MI:SS
  // [.ffffff]` with trailing fractional zeros trimmed. The verbatim
  // steps surface intervals in their SELECT lists
  // (packets/dba_long_queries/01_step.sql:7-9 date_trunc('milliseconds',
  // now() - ts); packets/dba_active_maint/01_step.sql:8-12 to_char(...,
  // 'HH12:MI:SS.MS')) — parquet/DuckDB can't hash-compare native interval
  // values, so the dialect layer renders them to PG's text form. These
  // run as plain UDFs over java.time.Duration: the inputs are pg_catalog
  // fixture rows (dozens), the same bounded-scale contract as the other
  // catalog shims in PgCatalog.ensureFunctionsRegistered.

  /** PG text of a day-time interval truncated to milliseconds — the
    * rewrite target of the PG-only `date_trunc('milliseconds', iv)`. */
  def pgIntervalTextMs(d: java.time.Duration): String = {
    if (d == null) return null
    val neg = d.isNegative
    val a = d.abs
    val days = a.toDays
    val h = a.toHoursPart; val m = a.toMinutesPart; val s = a.toSecondsPart
    val ms = a.toMillisPart
    val frac =
      if (ms == 0) ""
      else ("." + f"$ms%03d").reverse.dropWhile(_ == '0').reverse
    val dayPart =
      if (days == 0) "" else s"$days day${if (days == 1) "" else "s"} "
    (if (neg) "-" else "") + dayPart + f"$h%02d:$m%02d:$s%02d" + frac
  }

  /** PG to_char(interval, fmt) for the HH12/HH24/MI/SS/MS field set
    * (dba_active_maint's 'HH12:MI:SS.MS'). HH12 renders hour 0 as 12,
    * exactly as PG does; HH24 carries day overflow (26:00:00 stays 26). */
  def pgToCharInterval(d: java.time.Duration, fmt: String): String = {
    if (d == null || fmt == null) return null
    val totalH = d.toHours
    val m = d.toMinutesPart; val s = d.toSecondsPart; val ms = d.toMillisPart
    val h12 = if (totalH % 12 == 0) 12L else totalH % 12
    val fields = Seq(
      "HH24" -> f"$totalH%02d", "HH12" -> f"$h12%02d",
      "MS" -> f"$ms%03d", "MI" -> f"$m%02d", "SS" -> f"$s%02d")
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      fields.find { case (k, _) => fmt.startsWith(k, i) } match {
        case Some((k, v)) => sb.append(v); i += k.length
        case None => sb.append(fmt.charAt(i)); i += 1
      }
    }
    sb.toString
  }

  /** 'X/Y' wire LSN → absolute byte position (JVM twin of lsn_bytes). */
  def lsnBytesJvm(lsn: String): Long = {
    val Array(hi, lo) = lsn.split("/")
    java.lang.Long.parseLong(hi, 16) * 4294967296L +
      java.lang.Long.parseLong(lo, 16)
  }

  private def expression(c: Column): Expression = ColumnBridge.expression(c)

  /** Register SQL names so `spark.sql("select pg_size_pretty(x) ...")` works. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      // PG overloads pg_size_pretty(numeric): accept any numeric child
      // by casting to BIGINT (callers pass integral values — the c21
      // verbatim path arrives here as DOUBLE via the ::numeric rewrite)
      "pg_size_pretty", es => PgSizePretty(
        org.apache.spark.sql.catalyst.expressions.Cast(es.head,
          org.apache.spark.sql.types.LongType)), "built-in")
    reg.createOrReplaceTempFunction(
      "quote_ident", es => QuoteIdent(es.head), "built-in")
    reg.createOrReplaceTempFunction(
      "pg_sleep", es => PgSleep(org.apache.spark.sql.catalyst.expressions.Cast(
        es.head, org.apache.spark.sql.types.DoubleType)), "built-in")
    reg.createOrReplaceTempFunction(
      "quote_literal", es => QuoteLiteral(es.head), "built-in")
    // pg_get_expr(adbin, adrelid): on a file target adbin already holds the
    // rendered expression, so this is a passthrough of the first argument —
    // the same compat shim DuckDB ships, which keeps the SQL text portable
    reg.createOrReplaceTempFunction(
      "pg_get_expr", es => es.head, "built-in")
    // SQL names for the verbatim-dialect surface: WAL arithmetic
    // (dba_lag/01_step.sql) and the PG interval renderers — UDFs over
    // java.time.Duration/String, bounded to pg_catalog fixture rows
    spark.udf.register("pg_wal_lsn_diff",
      (a: String, b: String) =>
        PgFunctions.lsnBytesJvm(a) - PgFunctions.lsnBytesJvm(b))
    spark.udf.register("pg_interval_text",
      (d: java.time.Duration) => PgFunctions.pgIntervalTextMs(d))
    spark.udf.register("pg_to_char_interval",
      (d: java.time.Duration, fmt: String) =>
        PgFunctions.pgToCharInterval(d, fmt))
  }
}
