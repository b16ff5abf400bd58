package graft.engine

/** Webhook alert sink (reference E21 resultset_hook: dbccore.py:629-706 +
  * matterhook/incoming.py:46-58). Resultsets / raises are rendered as
  * markdown tables, filtered by the hook's `verbosity` subset
  * (all | resultset | raise | stm_result), and handed to `post` — an
  * injectable transport (java.net.http in production, a buffer in tests;
  * the reference mocks requests.post the same way, test_packets.py:19-22).
  */
class HookSink(post: (String, String, String) => Unit) {

  /** Render + post captured resultsets (verbosity: all|resultset). */
  def resultsetHook(meta: MetaData, stepName: String,
      results: Seq[ResultSet]): Unit =
    meta.hook.foreach { h =>
      if (h.verbosity.contains("all") || h.verbosity.contains("resultset")) {
        val md = results.filter(_.rows.nonEmpty).map(markdownTable).mkString("\n")
        if (md.nonEmpty)
          post(h.channel.getOrElse(""), h.username.getOrElse("db_converter"),
            s"${h.message.map(_ + "\n").getOrElse("")}**$stepName**\n$md")
      }
    }

  /** Post a RAISE-style notice (verbosity: all|raise) — reference
    * raise_error_logic, dbccore.py:1183-1219. */
  def raiseHook(meta: MetaData, stepName: String, notice: Notice): Unit =
    meta.hook.foreach { h =>
      if (h.verbosity.contains("all") || h.verbosity.contains("raise"))
        post(h.channel.getOrElse(""), h.username.getOrElse("db_converter"),
          s"**$stepName** ${notice.severity}: ${notice.message}")
    }

  /** Post a statement execution summary (verbosity: all|stm_result). */
  def stmResultHook(meta: MetaData, stepName: String, summary: String): Unit =
    meta.hook.foreach { h =>
      if (h.verbosity.contains("all") || h.verbosity.contains("stm_result"))
        post(h.channel.getOrElse(""), h.username.getOrElse("db_converter"),
          s"**$stepName** $summary")
    }

  /** GitHub-flavored markdown table of a resultset (reference renders the
    * same shape for Mattermost, dbccore.py:662-686). */
  def markdownTable(rs: ResultSet): String = {
    val header = rs.columns.mkString("| ", " | ", " |")
    val sep = rs.columns.map(_ => "---").mkString("| ", " | ", " |")
    val rows = rs.rows.map(_.map(v => String.valueOf(v)).mkString("| ", " | ", " |"))
    (header +: sep +: rows).mkString("\n")
  }
}

object HookSink {
  /** Test/double-entry sink collecting (channel, username, message). */
  def buffering(buf: scala.collection.mutable.Buffer[(String, String, String)]): HookSink =
    new HookSink((c, u, m) => buf += ((c, u, m)))
}
