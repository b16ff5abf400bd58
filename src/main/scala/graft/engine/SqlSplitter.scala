package graft.engine

import scala.collection.mutable.ArrayBuffer

/** Multi-statement step splitting (reference E10: `sqlparse.split` at
  * dbccore.py:852). Splits on top-level `;`, respecting single/double
  * quoted strings, line comments (`--`) and block comments. Statements
  * that are empty after comment stripping are dropped (the reference's
  * prepared("") would fail the same way we'd want to skip).
  */
object SqlSplitter {

  def split(text: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var state: Char = 'n' // n=normal, s='...', d="...", l=line comment, b=block comment, $=dollar-quoted
    var dqTag = "" // the $tag$ that opened the current dollar-quoted body
    // PG dollar-quote opener at position i: $$ or $tag$ where tag is an
    // identifier (no leading digit — $1 is a parameter, not a tag)
    def dollarTagAt(i: Int): Option[String] =
      if (text.charAt(i) != '$') None
      else {
        var j = i + 1
        while (j < text.length && (text.charAt(j).isLetterOrDigit ||
          text.charAt(j) == '_')) j += 1
        if (j < text.length && text.charAt(j) == '$' &&
          (j == i + 1 || !text.charAt(i + 1).isDigit))
          Some(text.substring(i, j + 1))
        else None
      }
    while (i < text.length) {
      val c = text.charAt(i)
      val next = if (i + 1 < text.length) text.charAt(i + 1) else '\u0000'
      state match {
        case 'n' =>
          c match {
            case ';' => out += cur.toString; cur.clear()
            case '\'' => state = 's'; cur += c
            case '"' => state = 'd'; cur += c
            case '-' if next == '-' => state = 'l'; cur += c
            case '/' if next == '*' => state = 'b'; cur += c
            case '$' => dollarTagAt(i) match {
              // a plpgsql body is ONE token to the splitter: `;` inside
              // $tag$ … $tag$ never ends the statement (PG lexing)
              case Some(tag) =>
                dqTag = tag; state = '$'
                cur ++= tag; i += tag.length - 1
              case None => cur += c
            }
            case _ => cur += c
          }
        case '$' =>
          if (c == '$' && text.regionMatches(i, dqTag, 0, dqTag.length)) {
            cur ++= dqTag; i += dqTag.length - 1; state = 'n'
          } else cur += c
        case 's' =>
          cur += c
          if (c == '\'' && next == '\'') { cur += next; i += 1 } // '' escape
          else if (c == '\'') state = 'n'
        case 'd' =>
          cur += c
          if (c == '"') state = 'n'
        case 'l' =>
          cur += c
          if (c == '\n') state = 'n'
        case 'b' =>
          cur += c
          if (c == '*' && next == '/') { cur += next; i += 1; state = 'n' }
      }
      i += 1
    }
    out += cur.toString
    out.toSeq.map(_.trim).filter(s => stripComments(s).trim.nonEmpty)
  }

  /** Remove -- line comments and block comments (for emptiness checks and
    * statement classification, not for execution). */
  def stripComments(sql: String): String = {
    val noBlock = "(?s)/\\*.*?\\*/".r.replaceAllIn(sql, " ")
    "--[^\n]*".r.replaceAllIn(noBlock, " ")
  }

  /** First keyword of the statement, uppercased (classification aid). */
  def firstKeyword(sql: String): String = {
    val s = stripComments(sql).trim
    val m = "^[A-Za-z_]+".r.findFirstIn(s)
    m.map(_.toUpperCase).getOrElse("")
  }

  /** Read-only statements: safe under read_only / no_commit semantics
    * (reference SET TRANSACTION READ ONLY, dbccore.py:857-860). */
  def isReadOnlyStatement(sql: String): Boolean =
    Set("SELECT", "WITH", "VALUES", "SHOW", "DESCRIBE", "DESC", "EXPLAIN", "TABLE")
      .contains(firstKeyword(sql))

  /** Maintenance (non-transactional) statement detection (reference E9:
    * SysConf.non_tx_ops db_converter.py:22-31 + is_non_tx_query
    * dbccore.py:717-722) — mapped to the Spark-SQL maintenance surface. */
  def isMaintenanceStatement(sql: String): Boolean = {
    val s = SqlSplitter.stripComments(sql).trim.toUpperCase
    Seq("VACUUM", "ANALYZE", "ANALYZE TABLE", "OPTIMIZE", "REINDEX",
      "REFRESH TABLE", "MSCK REPAIR", "ALTER SYSTEM", "CREATE DATABASE",
      "DROP DATABASE", "CREATE INDEX CONCURRENTLY")
      .exists(s.startsWith)
  }
}
