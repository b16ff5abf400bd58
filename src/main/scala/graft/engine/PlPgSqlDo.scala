package graft.engine

import org.apache.spark.sql.SparkSession

/** Narrow PL/pgSQL `DO $$ … $$` executor for the verbatim-dialect path
  * (conf.pgDialect): the reference's alert packets use DO blocks as
  * condition-gated raises —
  *
  * {{{
  *   do $$ begin
  *     if exists(<QUERY>) then
  *       raise exception '<FMT>', (<ARG>), …;
  *     end if;
  *   end$$;
  * }}}
  *
  * (packets/alert_check_autovacuum/01_step.sql) plus the unconditional
  * `raise exception '…';` form (packets/test_raise/01_step.sql). The
  * guard query and every argument run through [[PgDialectRewriter]]
  * against the synthesized catalog; `raise exception` throws into the
  * runner's E22 raise_error path (step fails, raise hook fires with the
  * PG-formatted message), `raise notice` lands on the Notice channel.
  * Anything outside this shape — loops, DECLARE blocks, EXECUTE —
  * fails LOUDLY as unsupported (the big plpgsql programs,
  * dba_clone_schema and alert_int4_capacity, stay on their re-authored
  * driver-side paths c12/c14 by design).
  */
object PlPgSqlDo {

  /** True when the statement is a DO block this executor can run. */
  def isDo(stm: String): Boolean =
    SqlSplitter.firstKeyword(stm).equalsIgnoreCase("do")

  /** Default inner-statement executor: only `raise` is allowed (the
    * alert-packet posture). The PG-DDL path passes a real callback so
    * DO-gated DDL (the int4→int8 packet's trigger/constraint setup)
    * executes through the engine's statement machinery. */
  private def refuseExec(st: String): Unit = sys.error(
    s"PlPgSqlDo: unsupported statement inside DO (only raise, or DDL " +
      s"via the pgSchemaMap path): ${st.take(120)}")

  def execute(spark: SparkSession, stm: String,
      notice: String => Unit): Unit =
    execute(spark, stm, notice, refuseExec)

  def execute(spark: SparkSession, stm: String,
      notice: String => Unit, exec: String => Unit): Unit = {
    val clean = SqlSplitter.stripComments(stm).trim
    val body = {
      val m = ("(?is)^\\s*do\\s+\\$\\$\\s*begin\\b(.*?)\\bend\\s*" +
        "\\$\\$\\s*;?\\s*$").r.findFirstMatchIn(clean)
        .getOrElse(sys.error(
          "PlPgSqlDo: unsupported DO shape (declare/loop/execute " +
            "bodies run on the re-authored driver-side paths): " +
            stm.take(120)))
      m.group(1).trim
    }
    // comment-only body (test_common/05_step.sql: the raise is
    // commented out) — a legitimate no-op block
    if (body.isEmpty) return
    // PERFORM-only bodies (test_common/01_step.sql `PERFORM 1, 2, 3;`,
    // 06_step.sql `perform pg_sleep(1);`): each PERFORM evaluates its
    // expression list as a SELECT and discards the result — PG
    // semantics, including side effects (pg_sleep really sleeps)
    if ("(?is)^(?:perform\\b[^;]*;\\s*)*perform\\b[^;]*;?\\s*$".r
        .matches(body)) {
      body.split(";").map(_.trim).filter(_.nonEmpty).foreach { st =>
        val exprs = st.replaceFirst("(?is)^perform\\b", "").trim
        spark.sql(PgDialectRewriter.rewrite(s"SELECT $exprs")).collect()
      }
      return
    }
    // two further supported statements: IF <cond> THEN <stmts> END IF;
    // and a bare <raise>; — inside THEN, `raise` runs here and anything
    // else goes through the caller's executor (refused by default)
    val ifRx = "(?is)^if\\b(.*?)\\bthen\\b(.*)\\bend\\s+if\\s*;?$".r
    ifRx.findFirstMatchIn(body) match {
      case Some(m) =>
        val cond = m.group(1).trim
        val inner = m.group(2).trim
        if (evalCond(spark, cond)) {
          SqlSplitter.split(inner).map(_.trim).filter(_.nonEmpty)
            .foreach { st =>
              if (SqlSplitter.firstKeyword(st)
                  .equalsIgnoreCase("raise"))
                runRaise(spark, st.stripSuffix(";").trim, notice)
              else exec(st)
            }
        }
      case None =>
        val raisePart = body.stripSuffix(";").trim
        runRaise(spark, raisePart, notice)
    }
  }

  /** Evaluate an IF condition as one scalar boolean. `exists(<q>)`
    * sub-forms rewrite to count-scalar subqueries first (Spark allows
    * EXISTS only in filters), so shapes like `exists(…) = false` and
    * `(SELECT is_nullable FROM …) = 'YES'` all evaluate uniformly. */
  private def evalCond(spark: SparkSession, cond: String): Boolean = {
    val sb = new StringBuilder
    val rx = "(?is)exists\\s*\\(".r
    var rest = cond
    while (rest.nonEmpty) {
      rx.findFirstMatchIn(rest) match {
        case Some(m) =>
          val open = m.end - 1
          val close = matchParen(rest, open)
          sb ++= rest.substring(0, m.start)
          sb ++= "((SELECT count(*) FROM (" +
            rest.substring(open + 1, close) + ") dbc_exists_probe) > 0)"
          rest = rest.substring(close + 1)
        case None =>
          sb ++= rest
          rest = ""
      }
    }
    val row = spark.sql(PgDialectRewriter.rewrite(
      s"SELECT (${sb.toString}) AS c")).head()
    !row.isNullAt(0) && row.getBoolean(0)
  }

  /** `raise (exception|notice) 'fmt'[, arg]…` — each `%` consumes one
    * argument (PG's raise formatting; `%%` is a literal percent). */
  private def runRaise(spark: SparkSession, raise: String,
      notice: String => Unit): Unit = {
    val m = ("(?is)^raise\\s+(exception|notice)\\s+" +
      "'((?:[^']|'')*)'\\s*(.*)$").r.findFirstMatchIn(raise)
      .getOrElse(sys.error(
        s"PlPgSqlDo: unsupported raise form: ${raise.take(120)}"))
    val level = m.group(1).toLowerCase
    val fmt = m.group(2).replace("''", "'")
    val argText = m.group(3).trim
    val args =
      if (argText.isEmpty) Seq.empty[String]
      else splitTopLevel(argText.stripPrefix(",").trim).map(evalArg(spark, _))
    val sb = new StringBuilder
    var ai = 0
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length &&
        fmt.charAt(i + 1) == '%') { sb += '%'; i += 2 }
      else if (fmt.charAt(i) == '%') {
        require(ai < args.length,
          s"PlPgSqlDo: raise '$fmt': too few arguments")
        sb ++= args(ai); ai += 1; i += 1
      } else { sb += fmt.charAt(i); i += 1 }
    }
    val msg = sb.toString
    if (level == "exception") throw new IllegalStateException(msg)
    else notice(msg)
  }

  /** Evaluate one raise argument: a parenthesized scalar subquery runs
    * directly; any other expression runs as `SELECT <expr>`. */
  private def evalArg(spark: SparkSession, arg: String): String = {
    val a = arg.trim
    val inner =
      if (a.startsWith("(") && matchParen(a, 0) == a.length - 1)
        a.substring(1, a.length - 1).trim
      else a
    val sql =
      if (SqlSplitter.firstKeyword(inner).equalsIgnoreCase("select") ||
        SqlSplitter.firstKeyword(inner).equalsIgnoreCase("with")) inner
      else s"SELECT $inner"
    val row = spark.sql(PgDialectRewriter.rewrite(sql)).head()
    if (row.isNullAt(0)) "<NULL>" else String.valueOf(row.get(0))
  }

  /** Index of the ')' matching the '(' at `open`, honoring
    * single-quoted strings ('' is the embedded quote). */
  private def matchParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          var done = false
          while (i < s.length && !done) {
            if (s.charAt(i) == '\'') {
              if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
              else done = true
            } else i += 1
          }
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    sys.error(s"PlPgSqlDo: unbalanced parentheses in: ${s.take(120)}")
  }

  /** Split on top-level commas (outside parens and strings). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\'' =>
          i += 1
          var done = false
          while (i < s.length && !done) {
            if (s.charAt(i) == '\'') {
              if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
              else done = true
            } else i += 1
          }
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }
}
