package graft.engine

/** Source-to-source rewrite of PostgreSQL-dialect SQL into Spark SQL,
  * so the reference's OWN packet step files run VERBATIM (byte-identical
  * step text) against the synthesized catalog fixture
  * (graft.sources.PgCatalog) — the finite construct set SURVEY.md
  * §2.2/§4 enumerates, exercised end-to-end by the c20/c21 queries on
  * /root/reference/packets/dba_top_tables/01_step.sql and
  * /root/reference/packets/alert_bloat/01_step.sql.
  *
  * Covered rewrites (each token-aware — string literals, quoted
  * identifiers, and comments are never touched by a rule):
  *
  *   - `x::type` postfix casts. Value-preserving numeric target types
  *     go through `CAST(round(CAST(x AS DOUBLE), 0) AS T)` because
  *     PostgreSQL numeric→int casts ROUND while Spark CAST truncates
  *     (3.92::int = 4 in PG, 3 under a bare Spark cast — the
  *     alert_bloat alignment math is sensitive to exactly this);
  *     `::numeric` maps to DOUBLE math (the CatalogQueries portability
  *     convention); `::regclass`/`::name`/`::"char"` drop (oids and
  *     single-char literals are already the right values on the
  *     fixture); `'lit'::regtype` folds to the type's oid constant.
  *   - `expr FROM 'sql-pattern' FOR 'esc'` substring → anchored
  *     `nullif(regexp_extract(...), '')` (SQL LIKE-pattern with
  *     `#"…#"` capture delimiters, PG returns NULL on no-match).
  *   - `regexp_split_to_table(e, d)[::T]` →
  *     `explode(transform(split(e, d), __gx -> CAST(__gx AS T)))`.
  *   - `ARRAY[...]` → `array(...)`; `x = ANY (arr)` →
  *     `array_contains(arr, x)`; `x <> ALL (arr)` →
  *     `NOT array_contains(arr, x)`.
  *   - `a ~ p` → `a RLIKE p`; `a !~ p` → `a NOT RLIKE p`.
  *   - `IS NOT DISTINCT FROM` → `<=>`.
  *   - numeric `a ^ b` → `power(a, b)` (Spark `^` is XOR).
  *   - `(SELECT f(...))` FROM-less correlated scalar wrap → `f(...)`.
  *   - `pg_catalog.` function-name qualifier dropped.
  *   - `string_agg(e, d)` → `array_join(collect_list(e), d)`;
  *     `generate_series(...)` → `explode(sequence(...))`;
  *     `now()` → `current_timestamp()`;
  *     `current_database()` → `'graft'` (the fixture's database);
  *     `version()` → a pinned 64-bit PostgreSQL version string (the
  *     `version() ~ '…x86_64…'` MAXALIGN probe must take the 8-byte
  *     branch the fixture's stats were authored for);
  *     `'lit'::interval` → `INTERVAL 'lit'`.
  *
  * Deliberately OUT of scope (documented engine boundary): full PG
  * type inference (e.g. bare int/int division truncates in PG but is
  * fractional in Spark — packets relying on it, like
  * alert_bloat/02_step's `(7+count(*))/8`, stay on the re-authored
  * path), PL/pgSQL bodies (E26 runs them as typed Scala callbacks),
  * and FROM-clause set-returning functions.
  */
object PgDialectRewriter {

  // ------------------------------------------------------------------
  // lexer
  sealed trait Tok { def text: String }
  final case class Comment(text: String) extends Tok
  final case class Str(text: String) extends Tok // includes quotes
  final case class QIdent(text: String) extends Tok // "..."
  final case class Num(text: String) extends Tok
  final case class Ident(text: String) extends Tok
  final case class Op(text: String) extends Tok
  final case class Punct(text: String) extends Tok

  private def isKw(t: Tok, kw: String): Boolean = t match {
    case Ident(s) => s.equalsIgnoreCase(kw)
    case _ => false
  }

  def lex(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) { i += 1 }
      else if (c == '-' && i + 1 < n && sql(i + 1) == '-') {
        val e = sql.indexOf('\n', i)
        val stop = if (e < 0) n else e
        out += Comment(sql.substring(i, stop)); i = stop
      } else if (c == '/' && i + 1 < n && sql(i + 1) == '*') {
        // PG block comments nest
        var depth = 1; var k = i + 2
        while (k + 1 < n && depth > 0) {
          if (sql(k) == '/' && sql(k + 1) == '*') { depth += 1; k += 2 }
          else if (sql(k) == '*' && sql(k + 1) == '/') { depth -= 1; k += 2 }
          else k += 1
        }
        out += Comment(sql.substring(i, k)); i = k
      } else if (c == '\'') {
        var k = i + 1
        var done = false
        while (k < n && !done) {
          if (sql(k) == '\'') {
            if (k + 1 < n && sql(k + 1) == '\'') k += 2 else { done = true }
          } else k += 1
        }
        require(done, s"unterminated string literal at offset $i")
        out += Str(sql.substring(i, k + 1)); i = k + 1
      } else if (c == '"') {
        var k = i + 1
        var done = false
        while (k < n && !done) {
          if (sql(k) == '"') {
            if (k + 1 < n && sql(k + 1) == '"') k += 2 else { done = true }
          } else k += 1
        }
        require(done, s"unterminated quoted identifier at offset $i")
        out += QIdent(sql.substring(i, k + 1)); i = k + 1
      } else if (c.isDigit) {
        var k = i
        while (k < n && (sql(k).isDigit || sql(k) == '.')) k += 1
        if (k < n && (sql(k) == 'e' || sql(k) == 'E')) {
          var e = k + 1
          if (e < n && (sql(e) == '+' || sql(e) == '-')) e += 1
          if (e < n && sql(e).isDigit) {
            while (e < n && sql(e).isDigit) e += 1
            k = e
          }
        }
        out += Num(sql.substring(i, k)); i = k
      } else if (c.isLetter || c == '_') {
        var k = i
        while (k < n && (sql(k).isLetterOrDigit || sql(k) == '_' ||
          sql(k) == '$')) k += 1
        out += Ident(sql.substring(i, k)); i = k
      } else {
        val three = if (i + 3 <= n) sql.substring(i, i + 3) else ""
        val two = if (i + 2 <= n) sql.substring(i, i + 2) else ""
        if (three == "!~*") { out += Op(three); i += 3 }
        else if (Set("::", "<>", "!=", "<=", ">=", "!~", "~*", "||",
          "<=>", "@>", "<@").contains(two)) { out += Op(two); i += 2 }
        else if ("+-*/%<>=~^&|".indexOf(c) >= 0) { out += Op(c.toString); i += 1 }
        else if ("()[],;.".indexOf(c) >= 0) { out += Punct(c.toString); i += 1 }
        else sys.error(s"PgDialectRewriter: unexpected character '$c' at $i")
      }
    }
    out.result()
  }

  def render(ts: Seq[Tok]): String = ts.map(_.text).mkString(" ")

  // ------------------------------------------------------------------
  // helpers over significant-token vectors

  /** Index of the Punct(")")/("]") matching the opener at `open`. */
  private def matchForward(ts: Vector[Tok], open: Int): Int = {
    var depth = 0; var k = open
    while (k < ts.length) {
      ts(k) match {
        case Punct("(") | Punct("[") => depth += 1
        case Punct(")") | Punct("]") =>
          depth -= 1; if (depth == 0) return k
        case _ =>
      }
      k += 1
    }
    sys.error("PgDialectRewriter: unbalanced parentheses")
  }

  private val sqlKeywords = Set(
    "select", "from", "where", "and", "or", "not", "on", "join", "inner",
    "left", "right", "full", "cross", "outer", "when", "then", "else",
    "end", "case", "in", "as", "all", "any", "some", "distinct", "group",
    "by", "order", "having", "union", "intersect", "except", "limit",
    "offset", "exists", "between", "like", "ilike", "is", "null", "true",
    "false", "values", "with", "using", "desc", "asc", "nulls", "first",
    "last", "over", "partition")

  /** Start index of the primary expression ENDING at `end` (inclusive):
    * a literal, an identifier with its qualifier dot-chain, or a
    * balanced paren/bracket group with an optional function-name head. */
  private def primaryStart(ts: Vector[Tok], end: Int): Int = {
    var s = end
    ts(s) match {
      case Punct(")") | Punct("]") =>
        var depth = 0; var k = s
        var open = -1
        while (k >= 0 && open < 0) {
          ts(k) match {
            case Punct(")") | Punct("]") => depth += 1
            case Punct("(") | Punct("[") =>
              depth -= 1; if (depth == 0) open = k
            case _ =>
          }
          k -= 1
        }
        require(open >= 0, "PgDialectRewriter: unbalanced close")
        s = open
        // include a FUNCTION-name head, but never a SQL keyword — a
        // parenthesized expression after SELECT/WHERE/AND/… is not a call
        if (s > 0) ts(s - 1) match {
          case Ident(name) if !sqlKeywords.contains(name.toLowerCase) =>
            s -= 1
          case QIdent(_) => s -= 1
          case _ =>
        }
      case Ident(_) | QIdent(_) | Num(_) | Str(_) =>
      case t => sys.error(s"PgDialectRewriter: cannot anchor cast on $t")
    }
    // qualifier chain: a.b.c
    while (s >= 2 && ts(s - 1) == Punct(".") &&
      (ts(s - 2) match { case Ident(_) | QIdent(_) => true; case _ => false }))
      s -= 2
    s
  }

  /** Split the top-level (depth-1) comma-separated argument ranges of a
    * call whose '(' is at `open` and ')' at `close`. */
  private def splitArgs(ts: Vector[Tok], open: Int,
      close: Int): Seq[(Int, Int)] = {
    val cuts = Vector.newBuilder[Int]
    var depth = 0
    var k = open
    while (k <= close) {
      ts(k) match {
        case Punct("(") | Punct("[") => depth += 1
        case Punct(")") | Punct("]") => depth -= 1
        case Punct(",") if depth == 1 => cuts += k
        case _ =>
      }
      k += 1
    }
    val bounds = (open +: cuts.result()) :+ close
    bounds.sliding(2).map { case Seq(a, b) => (a + 1, b - 1) }.toSeq
      .filter { case (a, b) => a <= b }
  }

  // ------------------------------------------------------------------
  // SQL LIKE-pattern (with escape) → anchored Java regex with ONE
  // capture group delimited by esc+double-quote pairs
  def sqlPatternToRegex(pattern: String,
      esc: String): String = {
    require(esc.length == 1, s"escape must be one char: '$esc'")
    val e = esc.head
    def quote(c: Char): String =
      if ("\\.[]{}()*+?^$|".indexOf(c) >= 0) "\\" + c else c.toString
    val sb = new StringBuilder("^")
    var i = 0
    var inGroup = false
    while (i < pattern.length) {
      val c = pattern(i)
      if (c == e && i + 1 < pattern.length && pattern(i + 1) == '"') {
        sb.append(if (inGroup) ")" else "("); inGroup = !inGroup; i += 2
      } else if (c == e && i + 1 < pattern.length) {
        sb.append(quote(pattern(i + 1))); i += 2
      } else if (c == '%') { sb.append(".*"); i += 1 }
      else if (c == '_') { sb.append("."); i += 1 }
      else { sb.append(quote(c)); i += 1 }
    }
    require(!inGroup, s"unbalanced capture delimiters in '$pattern'")
    sb.append("$").toString
  }

  private def strLit(s: String): Str = Str("'" + s.replace("'", "''") + "'")
  private def strValue(t: Str): String =
    t.text.substring(1, t.text.length - 1).replace("''", "'")

  // regtype literal → PG type oid (extend as packets need)
  private val regtypeOids = Map(
    "name" -> 19, "pg_catalog.name" -> 19, "text" -> 25,
    "pg_catalog.text" -> 25, "int4" -> 23, "int8" -> 20)

  // value-preserving cast targets: PG rounds numeric→int, Spark truncates
  private val intTargets = Map(
    "int2" -> "SMALLINT", "smallint" -> "SMALLINT",
    "int4" -> "INT", "int" -> "INT", "integer" -> "INT",
    "int8" -> "BIGINT", "bigint" -> "BIGINT")
  private val plainTargets = Map(
    "text" -> "STRING", "varchar" -> "STRING",
    "numeric" -> "DOUBLE", "decimal" -> "DOUBLE",
    "float4" -> "DOUBLE", "float8" -> "DOUBLE", "real" -> "DOUBLE",
    "double" -> "DOUBLE", "float" -> "DOUBLE", // PG float = float8

    "boolean" -> "BOOLEAN", "bool" -> "BOOLEAN",
    "date" -> "DATE", "timestamp" -> "TIMESTAMP", "timestamptz" -> "TIMESTAMP")
  private val dropTargets =
    Set("regclass", "regnamespace", "regrole", "name", "char", "oid")

  // ------------------------------------------------------------------
  /** Scoped PG-schema → catalog-namespace mapping (RunnerConf
    * .pgSchemaMap): inside [[withTableMap]], `public.t` rewrites to the
    * mapped multi-part name and `information_schema.columns` to the
    * engine-materialized `dbc_info_columns` view. Thread-local — each
    * packet run scopes its own. */
  private val tableMap =
    new scala.util.DynamicVariable[Map[String, String]](Map.empty)

  def withTableMap[A](m: Map[String, String])(f: => A): A =
    if (m.isEmpty) f else tableMap.withValue(m)(f)

  private def mapTables(ts0: Vector[Tok]): Vector[Tok] = {
    val m = tableMap.value
    if (m.isEmpty) return ts0
    val b = Vector.newBuilder[Tok]
    var k = 0
    while (k < ts0.length) {
      ts0(k) match {
        case Ident(s) if k + 2 < ts0.length && ts0(k + 1) == Punct(".") =>
          ts0(k + 2) match {
            case Ident(t)
                if s.equalsIgnoreCase("information_schema") &&
                  t.equalsIgnoreCase("columns") =>
              b += Ident("dbc_info_columns"); k += 3
            case Ident(t) if m.contains(s.toLowerCase) =>
              m(s.toLowerCase).split("\\.").foreach { part =>
                b += Ident(part); b += Punct(".")
              }
              b += Ident(t)
              k += 3
            case _ => b += ts0(k); k += 1
          }
        case t => b += t; k += 1
      }
    }
    b.result()
  }

  def rewrite(sql: String): String = {
    var ts = mapTables(lex(sql).filterNot(_.isInstanceOf[Comment]))
    // trailing statement terminator
    while (ts.nonEmpty && ts.last == Punct(";")) ts = ts.dropRight(1)

    // pg_catalog. qualifier (functions AND catalog tables — the fixture
    // registers everything unqualified; 'pg_catalog' inside string
    // literals is a Str token and never touched)
    ts = {
      val b = Vector.newBuilder[Tok]
      var k = 0
      while (k < ts.length) {
        if (isKw(ts(k), "pg_catalog") && k + 2 < ts.length &&
          ts(k + 1) == Punct(".") &&
          (ts(k + 2) match { case Ident(_) => true; case _ => false })) k += 2
        else { b += ts(k); k += 1 }
      }
      b.result()
    }

    // row_number() OVER () — PG numbers rows in their incoming order
    // (the reference grids sort a subquery, then number); Spark refuses
    // an unordered ranking window. ORDER BY monotonically_increasing_id
    // reproduces the incoming order: ids are (partition, row-index)
    // prefixed, and a sorted child's range partitions are themselves in
    // key order — so numbering follows the subquery's ORDER BY, exactly
    // the PG behavior the packet relies on
    // (reference packets/test_common/02_gen_obj.sql:12-25).
    ts = {
      val b = Vector.newBuilder[Tok]
      var k = 0
      while (k < ts.length) {
        if (isKw(ts(k), "over") && k + 2 < ts.length &&
          ts(k + 1) == Punct("(") && ts(k + 2) == Punct(")")) {
          b += ts(k) += Punct("(") += Ident("ORDER") += Ident("BY") +=
            Ident("monotonically_increasing_id") += Punct("(") +=
            Punct(")") += Punct(")")
          k += 3
        } else { b += ts(k); k += 1 }
      }
      b.result()
    }

    // PG int/int division TRUNCATES; Spark '/' is always fractional.
    // `a / b` becomes `a div b` only when BOTH operands are PROVABLY
    // integer-typed: integer literals, count(...) calls, and +,-,*
    // compositions of those in parentheses — the alert_bloat tuple-
    // header estimator's `(7 + count(*)) / 8`
    // (reference packets/alert_bloat/02_step.sql:14). Anything with a
    // column reference or another function keeps '/': PG's reltuples &
    // friends are float4, where '/' IS fractional — inferring more
    // would risk changing those.
    ts = {
      def intish(span: Vector[Tok]): Boolean =
        span.nonEmpty && span.exists(t => !t.isInstanceOf[Punct]) &&
          span.forall {
            case Num(n) => !n.contains('.') && !n.toLowerCase.contains("e")
            case t if isKw(t, "count") => true
            case Punct("(") | Punct(")") | Punct("+") | Punct("-") |
                Punct("*") => true
            case _ => false
          }
      def leftStart(v: Vector[Tok], e: Int): Option[Int] = v(e) match {
        case Num(_) => Some(e)
        case Punct(")") =>
          var depth = 0; var j = e
          while (j >= 0) {
            v(j) match {
              case Punct(")") | Punct("]") => depth += 1
              case Punct("(") | Punct("[") =>
                depth -= 1
                if (depth == 0)
                  return Some(
                    if (j > 0 && (v(j - 1) match {
                      case Ident(_) => true; case _ => false
                    })) j - 1 else j)
              case _ =>
            }
            j -= 1
          }
          None
        case _ => None
      }
      def rightEnd(v: Vector[Tok], s: Int): Option[Int] = v(s) match {
        case Num(_) => Some(s)
        case Punct("(") => Some(matchForward(v, s))
        case Ident(_) if s + 1 < v.length && v(s + 1) == Punct("(") =>
          Some(matchForward(v, s + 1))
        case _ => None
      }
      var v = ts
      var k = 1
      while (k < v.length - 1) {
        if (v(k) == Punct("/")) {
          val repl = for {
            ls <- leftStart(v, k - 1)
            re <- rightEnd(v, k + 1)
            if intish(v.slice(ls, k)) && intish(v.slice(k + 1, re + 1))
          } yield ()
          if (repl.isDefined) v = v.updated(k, Ident("div"))
        }
        k += 1
      }
      v
    }

    // (SELECT f(...)) scalar wrap → f(...)
    var changed = true
    while (changed) {
      changed = false
      var k = 0
      while (!changed && k + 4 < ts.length) {
        if (ts(k) == Punct("(") && isKw(ts(k + 1), "select") &&
          (ts(k + 2) match { case Ident(_) => true; case _ => false }) &&
          ts(k + 3) == Punct("(")) {
          val close = matchForward(ts, k + 3)
          if (close + 1 < ts.length && ts(close + 1) == Punct(")")) {
            ts = ts.patch(close + 1, Nil, 1).patch(k, Nil, 2)
            changed = true
          }
        }
        k += 1
      }
    }

    // substring(X from 'pat' for 'esc') → nullif(regexp_extract(X,rx,1),'')
    changed = true
    while (changed) {
      changed = false
      var k = 0
      while (!changed && k + 1 < ts.length) {
        if (isKw(ts(k), "substring") && ts(k + 1) == Punct("(")) {
          val close = matchForward(ts, k + 1)
          // locate depth-1 FROM / FOR keywords
          var depth = 0; var fromIdx = -1; var forIdx = -1
          var j = k + 1
          while (j <= close) {
            ts(j) match {
              case Punct("(") | Punct("[") => depth += 1
              case Punct(")") | Punct("]") => depth -= 1
              case t if depth == 1 && isKw(t, "from") && fromIdx < 0 =>
                fromIdx = j
              case t if depth == 1 && isKw(t, "for") && forIdx < 0 =>
                forIdx = j
              case _ =>
            }
            j += 1
          }
          (fromIdx, forIdx) match {
            case (f, r) if f > 0 && r > f =>
              val (patT, escT) = (ts.slice(f + 1, r), ts.slice(r + 1, close))
              (patT, escT) match {
                case (Vector(p: Str), Vector(e: Str)) =>
                  val rx = sqlPatternToRegex(strValue(p), strValue(e))
                  val x = ts.slice(k + 2, f)
                  val repl = Vector(Ident("nullif"), Punct("("),
                    Ident("regexp_extract"), Punct("(")) ++ x ++
                    Vector(Punct(","), strLit(rx), Punct(","), Num("1"),
                      Punct(")"), Punct(","), Str("''"), Punct(")"))
                  ts = ts.patch(k, repl, close - k + 1)
                  changed = true
                case _ =>
                  // NUMERIC from/for: PG counts from a virtual position
                  // that may be < 1 — `from 0 for 64` yields positions
                  // 1..63 (63 chars), where Spark's substring(x, 0, 64)
                  // would yield 64. Preserve PG:
                  //   substring(x, greatest(a,1), (a+b) - greatest(a,1))
                  val x = ts.slice(k + 2, f)
                  val a = ts.slice(f + 1, r)
                  val bb = ts.slice(r + 1, close)
                  val ga = Vector(Ident("greatest"), Punct("(")) ++ a ++
                    Vector(Punct(","), Num("1"), Punct(")"))
                  val repl = Vector(Ident("substring"), Punct("(")) ++ x ++
                    Vector(Punct(",")) ++ ga ++ Vector(Punct(","),
                      Punct("("), Punct("(")) ++ a ++ Vector(Punct(")"),
                      Op("+"), Punct("(")) ++ bb ++ Vector(Punct(")"),
                      Op("-")) ++ ga ++ Vector(Punct(")"), Punct(")"))
                  ts = ts.patch(k, repl, close - k + 1)
                  changed = true
              }
            case (f, -1) if f > 0 =>
              val x = ts.slice(k + 2, f)
              val a = ts.slice(f + 1, close)
              a match {
                case Vector(p: Str) =>
                  // substring(x FROM 'regex'): PG's POSIX-regex form —
                  // the FIRST capture group when the pattern has one,
                  // else the whole match; NULL on no match
                  // (alert_bloat/02_step.sql:63
                  // `substring(... from 'fillfactor=([0-9]+)')`)
                  val pat = strValue(p)
                  val grp =
                    if (pat.replace("\\(", "").contains("(")) "1" else "0"
                  val repl = Vector(Ident("nullif"), Punct("("),
                    Ident("regexp_extract"), Punct("(")) ++ x ++
                    Vector(Punct(","), p, Punct(","), Num(grp),
                      Punct(")"), Punct(","), Str("''"), Punct(")"))
                  ts = ts.patch(k, repl, close - k + 1)
                  changed = true
                case _ =>
                  // substring(x FROM a): start clamps to 1 in PG
                  val repl = Vector(Ident("substring"), Punct("(")) ++ x ++
                    Vector(Punct(","), Ident("greatest"), Punct("(")) ++
                    a ++
                    Vector(Punct(","), Num("1"), Punct(")"), Punct(")"))
                  ts = ts.patch(k, repl, close - k + 1)
                  changed = true
              }
            case _ => // plain substring(s, a, b): leave untouched
          }
        }
        k += 1
      }
    }

    // regexp_split_to_table(A, B)[::T]
    changed = true
    while (changed) {
      changed = false
      var k = 0
      while (!changed && k + 1 < ts.length) {
        if (isKw(ts(k), "regexp_split_to_table") && ts(k + 1) == Punct("(")) {
          val close = matchForward(ts, k + 1)
          val args = splitArgs(ts, k + 1, close)
          require(args.length == 2,
            "regexp_split_to_table: expected 2 arguments")
          val a = ts.slice(args(0)._1, args(0)._2 + 1)
          val b = ts.slice(args(1)._1, args(1)._2 + 1)
          val castTo: Option[String] =
            if (close + 2 < ts.length && ts(close + 1) == Op("::"))
              ts(close + 2) match {
                case Ident(t)
                  if intTargets.contains(t.toLowerCase) =>
                  Some(intTargets(t.toLowerCase))
                case Ident(t) if plainTargets.contains(t.toLowerCase) =>
                  Some(plainTargets(t.toLowerCase))
                case _ => None
              }
            else None
          val split = Vector(Ident("split"), Punct("(")) ++ a ++
            Vector(Punct(",")) ++ b ++ Vector(Punct(")"))
          val (repl, consumed) = castTo match {
            case Some(t) =>
              (Vector(Ident("explode"), Punct("("), Ident("transform"),
                Punct("(")) ++ split ++
                Vector(Punct(","), Ident("__gx"), Op("->"),
                  Ident("CAST"), Punct("("), Ident("__gx"), Ident("AS"),
                  Ident(t), Punct(")"), Punct(")"), Punct(")")),
                close - k + 3)
            case None =>
              (Vector(Ident("explode"), Punct("(")) ++ split ++
                Vector(Punct(")")), close - k + 1)
          }
          ts = ts.patch(k, repl, consumed)
          changed = true
        }
        k += 1
      }
    }

    // ARRAY[...] → array(...)
    changed = true
    while (changed) {
      changed = false
      var k = 0
      while (!changed && k + 1 < ts.length) {
        if (isKw(ts(k), "array") && ts(k + 1) == Punct("[")) {
          val close = matchForward(ts, k + 1)
          ts = ts.updated(k, Ident("array"))
            .updated(k + 1, Punct("(")).updated(close, Punct(")"))
          changed = true
        }
        k += 1
      }
    }

    // PG vector columns (int2vector/oidvector: indkey, conkey, confkey)
    // ride the fixture as their wire TEXT form ('2 3 4 5'). Subscripts
    // and ANY() over them rewrite to split() arithmetic:
    //   x.indkey[N]  →  CAST(try_element_at(split(x.indkey,' '), N+1)
    //                    AS INT)      (0-based → 1-based; out-of-range
    //                                  reads NULL, as PG's subscript)
    val vectorCols = Set("indkey", "conkey", "confkey")
    def isVectorChainEnd(t: Tok): Boolean = t match {
      case Ident(n) => vectorCols.contains(n.toLowerCase)
      case _ => false
    }
    changed = true
    while (changed) {
      changed = false
      var k = 0
      while (!changed && k + 3 < ts.length) {
        if (isVectorChainEnd(ts(k)) && ts(k + 1) == Punct("[")) {
          (ts(k + 2), ts(k + 3)) match {
            case (Num(n), Punct("]")) =>
              val s = primaryStart(ts, k)
              val chain = ts.slice(s, k + 1)
              val repl = Vector(Ident("CAST"), Punct("("),
                Ident("try_element_at"), Punct("("), Ident("split"),
                Punct("(")) ++ chain ++ Vector(Punct(","), Str("' '"),
                Punct(")"), Punct(","), Num((n.toInt + 1).toString),
                Punct(")"), Ident("AS"), Ident("INT"), Punct(")"))
              ts = ts.patch(s, repl, k + 4 - s)
              changed = true
            case _ =>
          }
        }
        k += 1
      }
    }

    // x = ANY (e) / x <> ALL (e) / x != ALL (e); when e is a vector
    // column chain the text splits into a casted INT array first
    changed = true
    while (changed) {
      changed = false
      var k = 1
      while (!changed && k + 2 < ts.length) {
        val isAny = ts(k) == Op("=") && isKw(ts(k + 1), "any")
        val isAll = (ts(k) == Op("<>") || ts(k) == Op("!=")) &&
          isKw(ts(k + 1), "all")
        if ((isAny || isAll) && ts(k + 2) == Punct("(")) {
          val close = matchForward(ts, k + 2)
          val e0 = ts.slice(k + 3, close)
          val isVector = e0.nonEmpty && isVectorChainEnd(e0.last) &&
            e0.zipWithIndex.forall {
              case (Ident(_), i) if i % 2 == 0 => true
              case (Punct("."), i) if i % 2 == 1 => true
              case _ => false
            }
          val e =
            if (isVector)
              Vector(Ident("transform"), Punct("("), Ident("split"),
                Punct("(")) ++ e0 ++ Vector(Punct(","), Str("' '"),
                Punct(")"), Punct(","), Ident("gx"), Op("->"),
                Ident("CAST"), Punct("("), Ident("gx"), Ident("AS"),
                Ident("INT"), Punct(")"), Punct(")"))
            else e0
          val s = primaryStart(ts, k - 1)
          val operand = ts.slice(s, k)
          val core = Vector(Ident("array_contains"), Punct("(")) ++ e ++
            Vector(Punct(",")) ++ operand ++ Vector(Punct(")"))
          val repl = if (isAll) Ident("NOT") +: core else core
          ts = ts.patch(s, repl, close - s + 1)
          changed = true
        }
        k += 1
      }
    }

    // regex matches: infix ~ / !~ → RLIKE / NOT RLIKE
    ts = {
      val b = Vector.newBuilder[Tok]
      var k = 0
      while (k < ts.length) {
        val infix = k > 0 && (ts(k - 1) match {
          case Ident(_) | QIdent(_) | Num(_) | Str(_) | Punct(")") => true
          case _ => false
        })
        ts(k) match {
          case Op("~") if infix => b += Ident("RLIKE")
          case Op("!~") if infix => b += Ident("NOT"); b += Ident("RLIKE")
          case t => b += t
        }
        k += 1
      }
      b.result()
    }

    // IS NOT DISTINCT FROM → <=>
    ts = {
      val b = Vector.newBuilder[Tok]
      var k = 0
      while (k < ts.length) {
        if (k + 3 < ts.length && isKw(ts(k), "is") && isKw(ts(k + 1), "not") &&
          isKw(ts(k + 2), "distinct") && isKw(ts(k + 3), "from")) {
          b += Op("<=>"); k += 4
        } else { b += ts(k); k += 1 }
      }
      b.result()
    }

    // numeric power: NUM ^ NUM → power(NUM, NUM)
    changed = true
    while (changed) {
      changed = false
      var k = 1
      while (!changed && k + 1 < ts.length) {
        (ts(k - 1), ts(k), ts(k + 1)) match {
          case (a: Num, Op("^"), b: Num) =>
            ts = ts.patch(k - 1, Vector(Ident("power"), Punct("("), a,
              Punct(","), b, Punct(")")), 3)
            changed = true
          case _ =>
        }
        k += 1
      }
    }

    // string_agg(e, d) → array_join(collect_list(e), d)
    changed = true
    while (changed) {
      changed = false
      var k = 0
      while (!changed && k + 1 < ts.length) {
        if (isKw(ts(k), "string_agg") && ts(k + 1) == Punct("(")) {
          val close = matchForward(ts, k + 1)
          val args = splitArgs(ts, k + 1, close)
          require(args.length == 2, "string_agg: expected 2 arguments")
          val e = ts.slice(args(0)._1, args(0)._2 + 1)
          val d = ts.slice(args(1)._1, args(1)._2 + 1)
          val repl = Vector(Ident("array_join"), Punct("("),
            Ident("collect_list"), Punct("(")) ++ e ++
            Vector(Punct(")"), Punct(",")) ++ d ++ Vector(Punct(")"))
          ts = ts.patch(k, repl, close - k + 1)
          changed = true
        }
        k += 1
      }
    }

    // generate_series(...) → explode(sequence(...)) (select-item form)
    ts = {
      val b = Vector.newBuilder[Tok]
      var k = 0
      while (k < ts.length) {
        if (isKw(ts(k), "generate_series") && k + 1 < ts.length &&
          ts(k + 1) == Punct("(")) {
          b += Ident("explode"); b += Punct("(") ; b += Ident("sequence")
          // the matching close gains one extra ')'
          val close = matchForward(ts, k + 1)
          var j = k + 1
          while (j <= close) { b += ts(j); j += 1 }
          b += Punct(")")
          k = close + 1
        } else { b += ts(k); k += 1 }
      }
      b.result()
    }

    // whole-select-item test for a rewrite spanning [s, afterEnd): PG
    // names `select f(x)` after the FUNCTION; Spark would name the
    // rewritten expression after its text — re-attach `AS f` when the
    // call forms a whole select item so both engines agree on the name
    def wholeSelectItem(s: Int, afterEnd: Int): Boolean =
      (s == 0 || ts(s - 1) == Punct(",") || isKw(ts(s - 1), "select")) &&
        (afterEnd >= ts.length || ts(afterEnd) == Punct(",") ||
          isKw(ts(afterEnd), "from"))

    // age(xid) / mxid_age(mxid) → wrap-around distance from the pinned
    // current xid/mxid (the fixture is a snapshot: current xid = 9100,
    // current mxid = 5000 — PG's age() is mod-2^32 distance, see
    // packets/dba_xact_age/01_step.sql, alert_xact_age/01_step.sql);
    // age(a, b) → (a - b) day-time interval (value-preserving for the
    // corpus's threshold comparisons and sorts)
    changed = true
    while (changed) {
      changed = false
      var k = 0
      while (!changed && k + 1 < ts.length) {
        val isAge = isKw(ts(k), "age") && ts(k + 1) == Punct("(")
        val isMxid = isKw(ts(k), "mxid_age") && ts(k + 1) == Punct("(")
        if (isAge || isMxid) {
          val close = matchForward(ts, k + 1)
          val args = splitArgs(ts, k + 1, close)
          val fname = if (isAge) "age" else "mxid_age"
          val alias: Vector[Tok] =
            if (wholeSelectItem(k, close + 1))
              Vector(Ident("AS"), Ident(fname))
            else Vector.empty
          val repl: Vector[Tok] = args match {
            case Seq((a, b)) =>
              val pinned = if (isAge) "9100" else "5000"
              Vector(Ident("CAST"), Punct("("), Ident("pmod"), Punct("("),
                Num(pinned), Op("-"), Punct("(")) ++ ts.slice(a, b + 1) ++
                Vector(Punct(")"), Punct(","), Num("4294967296"),
                  Punct(")"), Ident("AS"), Ident("BIGINT"), Punct(")")) ++
                alias
            case Seq((a1, b1), (a2, b2)) if isAge =>
              Vector(Punct("("), Punct("(")) ++ ts.slice(a1, b1 + 1) ++
                Vector(Punct(")"), Op("-"), Punct("(")) ++
                ts.slice(a2, b2 + 1) ++ Vector(Punct(")"), Punct(")")) ++
                alias
            case other => sys.error(
              s"PgDialectRewriter: $fname with ${other.length} args")
          }
          ts = ts.patch(k, repl, close - k + 1)
          changed = true
        }
        k += 1
      }
    }

    // date_trunc('milliseconds', iv) → pg_interval_text(iv) (PG-only
    // field over an interval operand — dba_long_queries/01_step.sql:7-9;
    // timestamp-field date_trunc forms are Spark-native and untouched);
    // to_char(iv, 'HH12:MI:SS.MS'-style) → pg_to_char_interval
    changed = true
    while (changed) {
      changed = false
      var k = 0
      while (!changed && k + 1 < ts.length) {
        if (isKw(ts(k), "date_trunc") && ts(k + 1) == Punct("(")) {
          val close = matchForward(ts, k + 1)
          splitArgs(ts, k + 1, close) match {
            case Seq((a1, b1), (a2, b2)) if a1 == b1 =>
              ts(a1) match {
                case s: Str
                  if strValue(s).equalsIgnoreCase("milliseconds") =>
                  val repl = Vector(Ident("pg_interval_text"),
                    Punct("(")) ++ ts.slice(a2, b2 + 1) ++ Vector(Punct(")"))
                  ts = ts.patch(k, repl, close - k + 1)
                  changed = true
                case _ =>
              }
            case _ =>
          }
        } else if (isKw(ts(k), "to_char") && ts(k + 1) == Punct("(")) {
          val close = matchForward(ts, k + 1)
          splitArgs(ts, k + 1, close) match {
            case Seq((a1, b1), (a2, b2)) if a2 == b2 =>
              ts(a2) match {
                case s: Str if strValue(s).contains("HH12") ||
                  strValue(s).contains("MS") =>
                  val repl = Vector(Ident("pg_to_char_interval"),
                    Punct("(")) ++ ts.slice(a1, b1 + 1) ++
                    Vector(Punct(","), s, Punct(")"))
                  ts = ts.patch(k, repl, close - k + 1)
                  changed = true
                case _ =>
              }
            case _ =>
          }
        }
        k += 1
      }
    }

    // format(fmt, ...) with a LITERAL fmt containing %I/%L expands to a
    // concat of quote_ident/quote_literal/string pieces at rewrite time
    // (dba_idx_diag/06_step.sql:13-18 renders CREATE INDEX statements) —
    // the same driver-side expansion PgFunctions.pg_format does for the
    // re-authored twins, here as source text
    changed = true
    while (changed) {
      changed = false
      var k = 0
      while (!changed && k + 2 < ts.length) {
        if (isKw(ts(k), "format") && ts(k + 1) == Punct("(")) {
          val close = matchForward(ts, k + 1)
          val args = splitArgs(ts, k + 1, close)
          val fmtOk = args.nonEmpty && args.head._1 == args.head._2 &&
            (ts(args.head._1) match {
              case s: Str => strValue(s).contains("%I") ||
                strValue(s).contains("%L")
              case _ => false
            })
          if (fmtOk) {
            val fmt = strValue(ts(args.head._1).asInstanceOf[Str])
            val rest = args.tail
            var argIdx = 0
            val parts = Vector.newBuilder[Vector[Tok]]
            val sb = new StringBuilder
            def flush(): Unit =
              if (sb.nonEmpty) { parts += Vector(strLit(sb.toString)); sb.clear() }
            def nextArg(): Vector[Tok] = {
              require(argIdx < rest.length,
                s"PgDialectRewriter: format '$fmt': too few arguments")
              val (a, b) = rest(argIdx); argIdx += 1
              ts.slice(a, b + 1)
            }
            var i = 0
            while (i < fmt.length) {
              if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
                fmt.charAt(i + 1) match {
                  case '%' => sb += '%'
                  case 'I' =>
                    flush()
                    parts += (Vector(Ident("quote_ident"), Punct("(")) ++
                      nextArg() ++ Vector(Punct(")")))
                  case 'L' =>
                    flush()
                    parts += (Vector(Ident("quote_literal"), Punct("(")) ++
                      nextArg() ++ Vector(Punct(")")))
                  case 's' =>
                    flush()
                    parts += (Vector(Ident("CAST"), Punct("(")) ++
                      nextArg() ++ Vector(Ident("AS"), Ident("STRING"),
                        Punct(")")))
                  case c => sys.error(
                    s"PgDialectRewriter: format: unsupported %$c")
                }
                i += 2
              } else { sb += fmt.charAt(i); i += 1 }
            }
            flush()
            val pieces = parts.result()
            val repl = Vector(Ident("concat"), Punct("(")) ++
              pieces.zipWithIndex.flatMap { case (p, j) =>
                (if (j == 0) Vector.empty[Tok] else Vector(Punct(","))) ++ p
              } ++ Vector(Punct(")"))
            ts = ts.patch(k, repl, close - k + 1)
            changed = true
          }
        }
        k += 1
      }
    }

    // format(...) → format_string(...): the remaining query-level format
    // uses only %s (alert_max_connections/01_step.sql:1), which Java's
    // formatter renders identically
    ts = ts.zipWithIndex.map { case (t, k) =>
      if (isKw(t, "format") && k + 1 < ts.length && ts(k + 1) == Punct("("))
        Ident("format_string")
      else t
    }

    // array_agg([distinct] X) → PG's array TEXT rendering '{a,b}' over
    // a SORTED set/list (dba_idx_diag/07's duplicate-index lists;
    // alert_check_autovacuum's raise argument, where the trailing
    // ::text then casts string→string). PG's own aggregate order is
    // input-dependent — the sorted rendering is the deterministic
    // cross-engine projection of the same multiset, the same treatment
    // string_agg gets
    changed = true
    while (changed) {
      changed = false
      var k = 0
      while (!changed && k + 2 < ts.length) {
        if (isKw(ts(k), "array_agg") && ts(k + 1) == Punct("(")) {
          val close = matchForward(ts, k + 1)
          val distinct = isKw(ts(k + 2), "distinct")
          val e = ts.slice(if (distinct) k + 3 else k + 2, close)
          val agg = if (distinct) "collect_set" else "collect_list"
          val repl = Vector(Ident("concat"), Punct("("), Str("'{'"),
            Punct(","), Ident("array_join"), Punct("("),
            Ident("sort_array"), Punct("("), Ident(agg),
            Punct("(")) ++ e ++ Vector(Punct(")"), Punct(")"), Punct(","),
            Str("','"), Punct(")"), Punct(","), Str("'}'"), Punct(")"))
          ts = ts.patch(k, repl, close - k + 1)
          changed = true
        }
        k += 1
      }
    }

    // '{a,b}'::text[] @> col — PG array containment over the fixture's
    // pre-joined reloptions text (alert_check_autovacuum/01_step.sql:7):
    // LEFT contains RIGHT ⟺ every element of col is in the literal set.
    // NULL reloptions stays NULL (excluded by WHERE), as in PG.
    changed = true
    while (changed) {
      changed = false
      var k = 0
      while (!changed && k + 6 < ts.length) {
        (ts(k), ts(k + 1), ts(k + 2), ts(k + 3), ts(k + 4), ts(k + 5)) match {
          case (lit: Str, Op("::"), t, Punct("["), Punct("]"), Op("@>"))
            if isKw(t, "text") =>
            val v = strValue(lit)
            require(v.startsWith("{") && v.endsWith("}"),
              s"PgDialectRewriter: expected array literal, got $v")
            val els = v.substring(1, v.length - 1).split(",").toSeq
              .map(_.trim)
            // RHS: a qualifier chain
            var e = k + 6
            while (e + 2 < ts.length && ts(e + 1) == Punct(".") &&
              (ts(e + 2) match { case Ident(_) => true; case _ => false }))
              e += 2
            val rhs = ts.slice(k + 6, e + 1)
            val elems = els.zipWithIndex.flatMap { case (el, j) =>
              (if (j == 0) Vector.empty[Tok] else Vector(Punct(","))) :+
                strLit(el)
            }
            val repl = Vector(Ident("forall"), Punct("("), Ident("split"),
              Punct("(")) ++ rhs ++ Vector(Punct(","), Str("','"),
              Punct(")"), Punct(","), Ident("ge"), Op("->"),
              Ident("array_contains"), Punct("("), Ident("array"),
              Punct("(")) ++ elems ++ Vector(Punct(")"), Punct(","),
              Ident("ge"), Punct(")"), Punct(")"))
            ts = ts.patch(k, repl, e + 1 - k)
            changed = true
          case _ =>
        }
        k += 1
      }
    }

    // interval-shaped string literal adjacent to a comparison → typed
    // INTERVAL literal (PG compares interval to string implicitly;
    // Spark does not — alert_stat's `> '15 days'`, dba_long_queries'
    // `>= '00:00:00.000001'`)
    {
      val compOps = Set(">", "<", ">=", "<=", "=", "<>", "!=")
      val dayRx = "(?i)^\\d+\\s*(day|days|hour|hours|minute|minutes|" +
        "second|seconds)$"
      val timeRx = "^\\d{1,3}:\\d{2}:\\d{2}(\\.\\d{1,6})?$"
      def isComp(i: Int): Boolean = i >= 0 && i < ts.length && (ts(i) match {
        case Op(o) => compOps.contains(o)
        case _ => false
      })
      val b = Vector.newBuilder[Tok]
      var k = 0
      while (k < ts.length) {
        ts(k) match {
          case s: Str if isComp(k - 1) || isComp(k + 1) =>
            val v = strValue(s)
            if (v.matches(dayRx)) { b += Ident("INTERVAL"); b += s }
            else if (v.matches(timeRx)) {
              b += Ident("INTERVAL"); b += s
              b += Ident("HOUR"); b += Ident("TO"); b += Ident("SECOND")
            } else b += s
          case t => b += t
        }
        k += 1
      }
      ts = b.result()
    }

    // now() → the pinned snapshot instant (the synthesized catalog is a
    // point-in-time snapshot; its "now" is 2024-01-01 10:05:00, the same
    // instant the re-authored twins pin — deterministic, oracle-
    // replayable); pg_backend_pid() → 999 (no fixture pid collides);
    // pg_current_wal_lsn() → the fixture's WAL head;
    // current_database() → 'graft'; version() → pinned 64-bit PG banner
    ts = {
      val b = Vector.newBuilder[Tok]
      var k = 0
      while (k < ts.length) {
        val isCall = k + 2 < ts.length && ts(k + 1) == Punct("(") &&
          ts(k + 2) == Punct(")")
        if (isCall && isKw(ts(k), "now")) {
          b += Ident("TIMESTAMP"); b += Str("'2024-01-01 10:05:00'")
          k += 3
        } else if (isCall && isKw(ts(k), "pg_backend_pid")) {
          b += Num("999"); k += 3
        } else if (isCall && isKw(ts(k), "pg_current_wal_lsn")) {
          b += Str("'2/1A2B3C40'"); k += 3
        } else if (isCall && isKw(ts(k), "current_database")) {
          b += Str("'graft'"); k += 3
        } else if (isCall && isKw(ts(k), "version")) {
          b += Str("'PostgreSQL 14.11 on x86_64-pc-linux-gnu, " +
            "compiled by gcc, 64-bit'")
          if (wholeSelectItem(k, k + 3)) {
            b += Ident("AS"); b += Ident("version")
          }
          k += 3
        } else { b += ts(k); k += 1 }
      }
      b.result()
    }

    // postfix ::type casts (after every rule that consumes its own ::)
    changed = true
    while (changed) {
      changed = false
      var k = 1
      while (!changed && k + 1 < ts.length) {
        if (ts(k) == Op("::")) {
          val tname = ts(k + 1) match {
            case Ident(t) => t.toLowerCase
            case QIdent(q) => q.substring(1, q.length - 1).toLowerCase
            case t => sys.error(s"PgDialectRewriter: bad cast target $t")
          }
          // multi-word PG type names: consume the qualifier tokens.
          // `timestamp with/without time zone` both map to the session
          // TIMESTAMP (the fixture carries UTC micros either way);
          // `double precision` is plain DOUBLE.
          val extraWords: Int =
            if ((tname == "timestamp" || tname == "time") &&
              k + 4 < ts.length &&
              (isKw(ts(k + 2), "with") || isKw(ts(k + 2), "without")) &&
              isKw(ts(k + 3), "time") && isKw(ts(k + 4), "zone")) 3
            else if (tname == "double" && k + 2 < ts.length &&
              isKw(ts(k + 2), "precision")) 1
            else 0
          val s = primaryStart(ts, k - 1)
          val operand = ts.slice(s, k)
          // PG names a bare select-item `col::type` after the COLUMN;
          // Spark would auto-name the CAST. Re-attach the name when the
          // operand is a pure column chain that forms a WHOLE select
          // item (preceded by SELECT or a comma, followed by a comma or
          // FROM) — `indisunique::integer,` in alert_bloat etc.
          val pureColumn = operand.zipWithIndex.forall {
            case (Ident(_), i) if i % 2 == 0 => true
            case (Punct("."), i) if i % 2 == 1 => true
            case _ => false
          }
          val wholeItem = pureColumn &&
            (s == 0 || ts(s - 1) == Punct(",") || isKw(ts(s - 1), "select")) &&
            (k + 2 + extraWords >= ts.length ||
              ts(k + 2 + extraWords) == Punct(",") ||
              isKw(ts(k + 2 + extraWords), "from"))
          val autoAlias: Vector[Tok] =
            if (wholeItem) operand.last match {
              case id: Ident => Vector(Ident("AS"), id)
              case _ => Vector.empty
            } else Vector.empty
          val repl: Vector[Tok] =
            if (tname == "regtype") operand match {
              case Vector(lit: Str) =>
                val key = strValue(lit).toLowerCase
                Vector(Num(regtypeOids.getOrElse(key, sys.error(
                  s"PgDialectRewriter: unknown regtype literal '$key'"))
                  .toString))
              case _ => operand // column::regtype: already an oid here
            }
            else if (dropTargets.contains(tname)) operand
            else if (tname == "interval") operand match {
              case Vector(lit: Str) => Vector(Ident("INTERVAL"), lit)
              case _ => sys.error(
                "PgDialectRewriter: ::interval needs a literal")
            }
            else if (intTargets.contains(tname))
              Vector(Ident("CAST"), Punct("("), Ident("round"), Punct("("),
                Ident("CAST"), Punct("(")) ++ operand ++
                Vector(Ident("AS"), Ident("DOUBLE"), Punct(")"), Punct(","),
                  Num("0"), Punct(")"), Ident("AS"),
                  Ident(intTargets(tname)), Punct(")")) ++ autoAlias
            else if (plainTargets.contains(tname))
              Vector(Ident("CAST"), Punct("(")) ++ operand ++
                Vector(Ident("AS"), Ident(plainTargets(tname)), Punct(")")) ++
                autoAlias
            else sys.error(
              s"PgDialectRewriter: unsupported cast target '$tname'")
          ts = ts.patch(s, repl, k + 2 + extraWords - s)
          changed = true
        }
        k += 1
      }
    }

    // PG names an UNALIASED whole-select-item function call after the
    // FUNCTION (select pg_get_indexdef(x) → column "pg_get_indexdef",
    // count(*) → "count"); Spark would auto-name the expression text.
    // Re-attach the name at TOP-LEVEL (depth-0) select items only —
    // argument positions also sit between commas, but never at depth 0
    // (the final resultset is the only place PG's naming is observable).
    {
      val depths = {
        val d = new Array[Int](ts.length)
        var dep = 0
        var i = 0
        while (i < ts.length) {
          ts(i) match {
            case Punct("(") | Punct("[") => d(i) = dep; dep += 1
            case Punct(")") | Punct("]") => dep -= 1; d(i) = dep
            case _ => d(i) = dep
          }
          i += 1
        }
        d
      }
      val excluded = sqlKeywords ++ Set("cast", "interval", "array",
        "row", "grouping")
      val b = Vector.newBuilder[Tok]
      var k = 0
      while (k < ts.length) {
        ts(k) match {
          case Ident(name) if depths(k) == 0 && k + 1 < ts.length &&
            ts(k + 1) == Punct("(") &&
            !excluded.contains(name.toLowerCase) &&
            (k == 0 || ts(k - 1) == Punct(",") ||
              isKw(ts(k - 1), "select")) =>
            val close = matchForward(ts, k + 1)
            val after = close + 1
            b ++= ts.slice(k, close + 1)
            if (after >= ts.length || ts(after) == Punct(",") ||
              isKw(ts(after), "from")) {
              b += Ident("AS"); b += Ident(name)
            }
            k = close + 1
          case t => b += t; k += 1
        }
      }
      ts = b.result()
    }

    // PG double-quoted identifiers → Spark backtick identifiers (LAST:
    // earlier passes match on QIdent; `""` is PG's embedded quote)
    ts = ts.map {
      case QIdent(q) =>
        val inner = q.substring(1, q.length - 1).replace("\"\"", "\"")
        Ident("`" + inner.replace("`", "``") + "`")
      case t => t
    }

    render(ts)
  }
}
