package graft

import org.apache.spark.sql.SparkSession

import graft.engine._

/** CLI entry point (reference db_converter.py argparse surface,
  * E3 command dispatch + E29 confirmation gate + E19 signal handling).
  *
  * Usage:
  *   graft.Cli --conf=conf/engine.conf --packet-name=P --db-name=D [--cmd=run]
  *             [--seq] [--force] [--skip-step-cancel] [--skip-action-cancel]
  *             [--placeholders=k1:v1,k2:v2] [--template=T] [--yes]
  *
  * Config INI: `[databases]` name = parquet-dir OR a jdbc: URL (the
  * reference's pq:// target URIs, db_converter.py:51-53); `[main]`
  * state_root, packets_root; `[session]` ordered init statements applied
  * to every JDBC connection (the reference's prepare_session SET block,
  * dbccore.py:347-377).
  */
object Cli {

  /** `[databases]` values → Targets: jdbc: URLs become live targets with
    * the `[session]` init block, anything else a parquet dir. */
  def targetsFrom(dbs: Map[String, String],
      sessionInit: Seq[String]): Seq[Target] =
    dbs.toSeq.sortBy(_._1).map { case (n, d) =>
      if (d.startsWith("jdbc:")) Target(n, "", jdbcUrl = Some(d),
        jdbcInit = sessionInit)
      else Target(n, d)
    }

  /** E29 confirmation gate (reference's interactive YES prompt,
    * db_converter.py:556-560): multi-target run requires explicit consent
    * unless --yes/--force. Injectable reader so the gate is testable. */
  def confirmGate(command: String, packetName: String, selected: Seq[String],
      yes: Boolean, force: Boolean,
      readLine: () => String = () => scala.io.StdIn.readLine()): Boolean = {
    if (command != "run" || selected.size <= 1 || yes || force) true
    else {
      println(s"About to run '$packetName' on ${selected.size} targets: " +
        selected.mkString(", ") + "\nType YES to continue:")
      readLine() == "YES"
    }
  }
  def main(args: Array[String]): Unit = {
    val opts = args.collect {
      case a if a.startsWith("--") && a.contains("=") =>
        val Array(k, v) = a.drop(2).split("=", 2); k -> v
      case a if a.startsWith("--") => a.drop(2) -> "true"
    }.toMap
    val confPath = opts.getOrElse("conf", "conf/engine.conf")
    val ini =
      if (new java.io.File(confPath).isFile)
        IniConf.parse(java.nio.file.Files.readString(java.nio.file.Paths.get(confPath)))
      else Map.empty[String, Map[String, String]]
    val dbs = ini.getOrElse("databases", Map("local" -> "/root/testdata/sf0.001"))
    val main_ = ini.getOrElse("main", Map.empty)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-engine")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sessionInit = ini.getOrElse("session", Map.empty)
      .toSeq.sortBy(_._1).map(_._2)
    val targets = targetsFrom(dbs, sessionInit)
    val engine = new Engine(spark, targets,
      stateRoot = main_.getOrElse("state_root", "dbc_state"),
      packetsRoot = main_.getOrElse("packets_root", "packets"),
      // [mattermost_hooks] / [slack_hooks] webhook sections
      // (reference db_converter.py:84-103,317-329)
      hookSink = Webhooks.fromIni(ini),
      connExceptionSleepMs = 1000L * main_.getOrElse(
        "conn_exception_sleep_interval", "5").toLong)
    val spec = RunSpec(
      command = opts.getOrElse("cmd", "run"),
      packetName = opts.getOrElse("packet-name", ""),
      targetSelector = opts.getOrElse("db-name", "ALL"),
      sequential = opts.contains("seq"),
      placeholders = opts.get("placeholders").map(_.split(",").collect {
        case kv if kv.contains(":") =>
          val Array(k, v) = kv.split(":", 2); k -> v
      }.toMap).getOrElse(Map.empty),
      force = opts.contains("force"),
      skipStepCancel = opts.contains("skip-step-cancel"),
      skipActionCancel = opts.contains("skip-action-cancel"),
      templateName = opts.getOrElse("template", "default"))

    // E29 confirmation gate: multi-target run asks unless --yes/--force
    val selected = GlobMatcher.resolve(spec.targetSelector, targets.map(_.name))
    if (!confirmGate(spec.command, spec.packetName, selected,
        opts.contains("yes"), spec.force)) { println("aborted"); return }
    // E19: SIGINT/SIGTERM → cancel every target's job group
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      engine.stopAll(spec.packetName)))

    val res = engine.run(spec)
    res.notices.foreach(n => println(s"${n.severity}: ${n.message}"))
    res.resultCode.toSeq.sortBy(_._1).foreach { case (t, code) =>
      println(s"$t: $code / ${res.packetStatus.getOrElse(t, "unknown")}")
    }
    spark.stop()
    if (res.resultCode.values.exists(_ == "fail")) sys.exit(1)
  }
}
