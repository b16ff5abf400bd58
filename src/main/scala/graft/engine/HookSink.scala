package graft.engine

/** Webhook alert sink (reference E21 resultset_hook: dbccore.py:629-706 +
  * matterhook/incoming.py:46-58). Resultsets / raises are rendered as
  * markdown tables, filtered by the hook's `verbosity` subset
  * (all | resultset | raise | stm_result), and handed to a transport —
  * injectable (java.net.http in production via [[Webhooks]], buffers in
  * tests; the reference mocks requests.post the same way,
  * test_packets.py:19-22).
  *
  * Two webhook dialects, selected by meta_data.json `hook.type`
  * (dbccore.py:632-648):
  *  - `mattermost` (default): `####`-header markdown, payload carries
  *    channel + username (matterhook/incoming.py:46-58);
  *  - `slack`: `*single-asterisk*` emphasis, code-fenced tables, payload
  *    is text-only — the webhook key itself selects the channel
  *    (db_converter.py:324-329, dbccore.py:696-697). The channel string
  *    still routes to the right webhook key.
  */
class HookSink(post: (String, String, String) => Unit,
    slackPost: (String, String) => Unit = (_, _) => ()) {

  /** Alerting must never fail the run (reference log-and-continue,
    * dbccore.py:702-706): raiseHook fires inside the runner's catch
    * blocks, where a webhook outage — plausibly correlated with the very
    * DB outage being handled — must not replace the original exception or
    * bypass the skip/reconnect classification. */
  private def dispatch(h: HookConf, mmText: => String, slackText: => String)(
      implicit log: HookSink.Log): Unit =
    try {
      if (h.hookType == "slack") slackPost(h.channel.getOrElse(""), slackText)
      else post(h.channel.getOrElse(""), h.username.getOrElse("db_converter"), mmText)
    } catch {
      case scala.util.control.NonFatal(e) =>
        log(s"[hook] webhook post failed; dropped: ${e.getMessage}", "Error")
    }

  /** Render + post captured resultsets (verbosity: all|resultset). */
  def resultsetHook(meta: MetaData, stepName: String,
      results: Seq[ResultSet])(
      implicit log: HookSink.Log = HookSink.stderrLog): Unit =
    meta.hook.foreach { h =>
      if (h.verbosity.contains("all") || h.verbosity.contains("resultset")) {
        val nonEmpty = results.filter(_.rows.nonEmpty)
        if (nonEmpty.nonEmpty) dispatch(h,
          mmText = s"${h.message.map(_ + "\n").getOrElse("")}**$stepName**\n" +
            nonEmpty.map(markdownTable).mkString("\n"),
          slackText = s"${h.message.map(_ + "\n").getOrElse("")}:gear: *$stepName*\n" +
            nonEmpty.map(rs => s"```\n${markdownTable(rs)}\n```").mkString("\n"))
      }
    }

  /** Post a RAISE-style notice (verbosity: all|raise) — reference
    * raise_error_logic, dbccore.py:1183-1219. */
  def raiseHook(meta: MetaData, stepName: String, notice: Notice)(
      implicit log: HookSink.Log = HookSink.stderrLog): Unit =
    meta.hook.foreach { h =>
      if (h.verbosity.contains("all") || h.verbosity.contains("raise"))
        dispatch(h,
          mmText = s"**$stepName** ${notice.severity}: ${notice.message}",
          slackText = s"*$stepName* ${notice.severity}: ${notice.message}")
    }

  /** Post a statement execution summary (verbosity: all|stm_result). */
  def stmResultHook(meta: MetaData, stepName: String, summary: String)(
      implicit log: HookSink.Log = HookSink.stderrLog): Unit =
    meta.hook.foreach { h =>
      if (h.verbosity.contains("all") || h.verbosity.contains("stm_result"))
        dispatch(h,
          mmText = s"**$stepName** $summary",
          slackText = s"*$stepName* $summary")
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
  /** Per-call logger for swallowed hook failures — an opaque wrapper (not a
    * bare function type) so the implicit can't be satisfied by an unrelated
    * (String, String) => Unit in scope. PacketRunner supplies its run
    * logger implicitly; outside a run the stderr default applies. */
  final case class Log(fn: (String, String) => Unit) {
    def apply(msg: String, level: String): Unit = fn(msg, level)
  }
  val stderrLog: Log = Log((m, _) => System.err.println(m))

  /** Test/double-entry sink collecting (channel, username, message). */
  def buffering(buf: scala.collection.mutable.Buffer[(String, String, String)]): HookSink =
    new HookSink((c, u, m) => buf += ((c, u, m)))

  /** Test sink collecting both dialects: mattermost 3-tuples and slack
    * (channel, text) pairs. */
  def bufferingBoth(
      mm: scala.collection.mutable.Buffer[(String, String, String)],
      slack: scala.collection.mutable.Buffer[(String, String)]): HookSink =
    new HookSink((c, u, m) => mm += ((c, u, m)), (c, t) => slack += ((c, t)))
}

/** Production webhook transports built from the engine INI (reference
  * SysConf init_hooks, db_converter.py:84-103 + MainRoutine:317-329):
  *
  *   [mattermost_hooks]                  [slack_hooks]
  *   url = https://mm.example.com        url = https://hooks.slack.example
  *   chat_keys = alerts/KEY1,ops/KEY2    chat_keys = alerts=KEY1,ops=KEY2
  *
  * Mattermost posts {"text","channel","username"} to `url/hooks/KEY`
  * (matterhook/incoming.py:43-58); Slack posts {"text"} to `url/KEY`
  * (WebhookClient, db_converter.py:327). An unknown channel drops the
  * post with a stderr note — the reference logs and continues
  * (dbccore.py:702-706); alerting must never fail the run.
  */
object Webhooks {

  /** chat_keys parser: comma list of `chat<delim>key` (db_converter.py:87-99). */
  def chatKeys(raw: String, delim: Char): Map[String, String] =
    raw.split(",").toSeq.map(_.trim).filter(_.nonEmpty).flatMap { item =>
      item.split(delim) match {
        case Array(chat, key) => Some(chat.trim -> key.trim)
        case _ => None
      }
    }.toMap

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Bounded transport: a hook post must not hang the run, so both the
    * connect and the whole request carry timeouts (failures are swallowed
    * by HookSink.dispatch either way). */
  private def httpPost(url: String, body: String): Unit = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(5))
      .build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofSeconds(10))
      .header("Content-Type", "application/json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    client.send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
  }

  /** Build the HookSink from INI sections; None when neither is present.
    * `send` is injectable for tests (url, jsonBody). */
  def fromIni(ini: Map[String, Map[String, String]],
      send: (String, String) => Unit = httpPost): Option[HookSink] = {
    val mm = ini.get("mattermost_hooks")
    val sl = ini.get("slack_hooks")
    if (mm.isEmpty && sl.isEmpty) return None

    def route(conf: Option[Map[String, String]], delim: Char, channel: String,
        pathOf: (String, String) => String)(body: String): Unit =
      for (c <- conf; url <- c.get("url")) {
        chatKeys(c.getOrElse("chat_keys", ""), delim).get(channel) match {
          case Some(key) => send(pathOf(url, key), body)
          case None => System.err.println(
            s"[hook] no webhook key for channel '$channel'; dropped")
        }
      }

    Some(new HookSink(
      post = (channel, username, text) =>
        route(mm, '/', channel, (u, k) => s"$u/hooks/$k")(
          s"""{"text":${jsonStr(text)},"channel":${jsonStr(channel)},"username":${jsonStr(username)}}"""),
      slackPost = (channel, text) =>
        route(sl, '=', channel, (u, k) => s"$u/$k")(
          s"""{"text":${jsonStr(text)}}""")))
  }
}
