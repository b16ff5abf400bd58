package graft.engine

import java.sql.{Connection, DriverManager, Statement}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A live JDBC execution target — the reference's actual deployment
  * surface (`pq://` URIs per database, /root/reference/db_converter.py:
  * 51-53). The Spark-first split of responsibilities:
  *
  *  - READS are `spark.read.jdbc` relations registered as temp views, so
  *    SELECT steps are DataFrame plans with predicate pushdown into the
  *    database, parallelizable via partitioned reads (`readOptions`:
  *    partitionColumn/lowerBound/upperBound/numPartitions — at 100 TB the
  *    scan fans out across executors, each pulling its own key range).
  *  - WRITES run on ONE JDBC connection per step in ONE transaction
  *    (the reference's execute_q connection bracketing, dbccore.py:
  *    831-903): every statement of the step commits or rolls back
  *    together, and read statements inside a write step observe the
  *    transaction's own uncommitted effects.
  *  - `initStatements` is session preparation (E24, dbccore.py:347-377):
  *    executed on every engine connection, and handed to Spark's
  *    `sessionInitStatement` for its partition readers.
  *  - stop → `Jdbc.cancelAll` cancels in-flight statements — on a
  *    PostgreSQL driver `Statement.cancel()` IS the wire cancel request
  *    (the server-side equivalent of pg_cancel_backend,
  *    db_converter.py:390-411); embedded engines that do not implement
  *    cancel are tolerated (the cross-process stop flag still interrupts
  *    between actions).
  */
final case class JdbcChannel(
    targetName: String,
    url: String,
    initStatements: Seq[String] = Nil,
    /** extra per-read options, e.g. partitionColumn/numPartitions */
    readOptions: Map[String, String] = Map.empty)

object Jdbc {

  // -- stop → cancel passthrough registry --------------------------------
  private val inFlight =
    new ConcurrentHashMap[String, java.util.Set[Statement]]()

  private def track(target: String, st: Statement): Unit =
    inFlight.computeIfAbsent(target, _ => ConcurrentHashMap.newKeySet[Statement]())
      .add(st)

  private def untrack(target: String, st: Statement): Unit =
    Option(inFlight.get(target)).foreach(_.remove(st))

  /** Cancel every in-flight statement of a target (Engine.stop's JDBC
    * half). Returns how many cancels were attempted; drivers without
    * cancel support (embedded Derby) are tolerated. */
  def cancelAll(targetName: String): Int = {
    val set = Option(inFlight.get(targetName)).map(_.toArray).getOrElse(Array.empty)
    set.foreach { st =>
      try st.asInstanceOf[Statement].cancel()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    set.length
  }

  /** Classify a throwable into the reference's RETRYABLE taxonomy — the
    * SQLSTATEs its reconnect loop sleeps on and resumes from
    * (dbccore.py:1125-1168):
    *
    *   57014 query_canceled        57P01 admin_shutdown
    *   57P02 crash_shutdown        57P03 cannot_connect_now
    *   57P04 database_dropped      40P01 deadlock_detected
    *
    * plus SQLSTATE class 08 (connection exceptions — what a dropped/killed
    * connection surfaces as through JDBC, the reference's driver-level
    * ConnectionError) and 40001 serialization_failure (Derby reports
    * deadlocks under the standard state, PostgreSQL under 40P01). Returns
    * the reference's `exception_descr` channel value
    * ("deadlock_detected" | "connection"), walking the cause chain since
    * Spark and pooled layers wrap the SQLException. */
  def retryClass(e: Throwable): Option[String] = {
    var cur: Throwable = e
    var depth = 0
    while (cur != null && depth < 20) {
      cur match {
        case s: java.sql.SQLException =>
          val st = Option(s.getSQLState).getOrElse("")
          if (st == "40P01" || st == "40001") return Some("deadlock_detected")
          if (st.startsWith("08") || st == "57014" || st.startsWith("57P"))
            return Some("connection")
        case _ => ()
      }
      val next = cur.getCause
      cur = if (next eq cur) null else next
      depth += 1
    }
    None
  }

  /** Open an engine-side connection with session preparation applied. */
  def openConnection(ch: JdbcChannel): Connection = {
    val conn = DriverManager.getConnection(ch.url)
    ch.initStatements.foreach { s =>
      val st = conn.createStatement()
      try st.execute(s) finally st.close()
    }
    conn
  }

  /** Readable relations of the target database: tables AND views, plus
    * system catalogs outside the excluded schemas — on PostgreSQL that is
    * pg_catalog (so the DBA/alert packet corpus reads live pg_class/
    * pg_stat_activity/... through JDBC); Derby's SYS* diagnostics stay
    * excluded (they are reached via lockSnapshot). */
  def listTables(ch: JdbcChannel): Seq[(String, String)] = {
    val conn = DriverManager.getConnection(ch.url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%",
        Array("TABLE", "VIEW", "SYSTEM TABLE", "SYSTEM VIEW"))
      val out = mutable.Buffer.empty[(String, String)]
      while (rs.next()) {
        val schema = Option(rs.getString("TABLE_SCHEM")).getOrElse("")
        if (!schema.toUpperCase.startsWith("SYS") &&
            schema.toUpperCase != "INFORMATION_SCHEMA")
          out += ((schema, rs.getString("TABLE_NAME")))
      }
      out.toSeq
    } finally conn.close()
  }

  /** Register every user table as a lowercase temp view over a
    * `spark.read.jdbc` relation. Re-invoked after DDL so created/dropped
    * tables stay visible to subsequent SELECT steps. */
  def registerTables(spark: SparkSession, ch: JdbcChannel): Unit =
    listTables(ch).foreach { case (schema, table) =>
      var reader = spark.read.format("jdbc")
        .option("url", ch.url)
        .option("dbtable",
          if (schema.isEmpty) s""""$table"""" else s""""$schema"."$table"""")
      // Spark executes the option as one string; drivers that accept
      // multi-statement strings (PostgreSQL) get the whole init block
      // joined — partition readers then match the engine-side connections
      if (ch.initStatements.nonEmpty)
        reader = reader.option("sessionInitStatement",
          ch.initStatements.mkString("; "))
      ch.readOptions.foreach { case (k, v) => reader = reader.option(k, v) }
      reader.load().createOrReplaceTempView(table.toLowerCase)
    }

  private val DdlKeywords = Set("CREATE", "DROP", "ALTER", "RENAME", "TRUNCATE")

  /** Single-connection multi-statement transaction (dbccore.py:831-903).
    * Returns captured resultsets and whether any statement was DDL (the
    * caller then refreshes the view registry). `commit = false` is the
    * no_commit dry-run: execute everything, then roll back — the
    * reference's behavior (dbccore.py:886-888), stronger than analyze-only
    * because constraint violations and lock conflicts surface too. */
  def executeTx(ch: JdbcChannel, stms: Seq[String], rowCap: Int,
      commit: Boolean = true, readOnly: Boolean = false): (Seq[ResultSet], Boolean) = {
    val conn = openConnection(ch)
    var hadDdl = false
    val out = mutable.Buffer.empty[ResultSet]
    try {
      conn.setAutoCommit(false)
      // read_only packets run under a READ ONLY connection so the SERVER
      // rejects writes (the reference's SET TRANSACTION READ ONLY,
      // dbccore.py:857-860) — keyword classification alone would let a
      // data-modifying CTE (`WITH del AS (DELETE …) SELECT …`) through
      if (readOnly) conn.setReadOnly(true)
      stms.foreach { stm =>
        val st = conn.createStatement()
        track(ch.targetName, st)
        try {
          if (st.execute(stm)) out += toResultSet(st.getResultSet, rowCap)
          if (DdlKeywords(SqlSplitter.firstKeyword(stm))) hadDdl = true
        } finally { untrack(ch.targetName, st); st.close() }
      }
      if (commit) conn.commit() else conn.rollback()
      (out.toSeq, hadDdl)
    } catch {
      case e: Throwable =>
        try conn.rollback() catch { case scala.util.control.NonFatal(_) => () }
        throw e
    } finally conn.close()
  }

  /** Non-transactional execution (E9 maintenance routing): one autocommit
    * connection per statement — VACUUM/REINDEX/ALTER SYSTEM refuse to run
    * inside a transaction block on PostgreSQL (is_non_tx_query,
    * dbccore.py:717-722). */
  def executeAutoCommit(ch: JdbcChannel, stm: String): Unit = {
    val conn = openConnection(ch)
    try {
      conn.setAutoCommit(true)
      val st = conn.createStatement()
      track(ch.targetName, st)
      try st.execute(stm)
      finally { untrack(ch.targetName, st); st.close() }
    } finally conn.close()
  }

  /** Maintenance statements Spark itself owns (view-cache refresh); the
    * rest of the maintenance surface (VACUUM/REINDEX/ALTER SYSTEM/...) is
    * database-side on a live target. */
  def isSparkSideMaintenance(stm: String): Boolean = {
    val s = SqlSplitter.stripComments(stm).trim.toUpperCase
    Seq("REFRESH TABLE", "MSCK REPAIR", "ANALYZE TABLE", "OPTIMIZE")
      .exists(s.startsWith)
  }

  private def toResultSet(rs: java.sql.ResultSet, rowCap: Int): ResultSet = {
    val md = rs.getMetaData
    val n = md.getColumnCount
    val cols = (1 to n).map(i => md.getColumnLabel(i).toLowerCase)
    val rows = mutable.Buffer.empty[Seq[Any]]
    while (rs.next() && rows.size < rowCap)
      rows += (1 to n).map(i => rs.getObject(i))
    ResultSet(cols, rows.toSeq)
  }

  /** Live lock-state snapshot for the LockObserver (the reference pulls
    * pg_locks + pg_stat_activity, dbccore.py:185-220). For PostgreSQL the
    * two views map 1:1; here the Derby diagnostic tables are projected
    * into the same shape: a lock row is (pid, granted, database, relation,
    * transactionid) and an activity row is (pid, xact_start,
    * wait_event_type, wait_event) with wait_event_type = 'Lock' for any
    * transaction holding a WAIT lock — identical rule inputs, so the
    * observer's two detection joins run unchanged on a live target. */
  // Derby's TRANSACTION_TABLE exposes no wallclock start; a monitoring
  // sidecar's honest view is "running at least since I first observed it"
  // (the PostgreSQL adapter would use pg_stat_activity.xact_start
  // directly). Keyed url#xid; entries for vanished transactions pruned.
  private val firstSeen = new ConcurrentHashMap[String, java.lang.Long]()

  def lockSnapshot(spark: SparkSession, ch: JdbcChannel): LockSnapshot = {
    def read(table: String): DataFrame = spark.read.format("jdbc")
      .option("url", ch.url).option("dbtable", table).load()
    val rawLocks = read("SYSCS_DIAG.LOCK_TABLE")
    val locks = rawLocks.select(
      col("XID").cast("int").as("pid"),
      (col("STATE") === "GRANT").as("granted"),
      lit(1).as("database"),
      col("TABLENAME").as("relation"),
      lit(null).cast("int").as("transactionid"))
    // live transactions + which of them hold an ungranted lock; both
    // diagnostic relations are tiny (bounded by live sessions), so the
    // activity projection is computed driver-side
    val txRows = read("SYSCS_DIAG.TRANSACTION_TABLE")
      .select(col("XID")).collect().map(_.getString(0).trim)
    val waitXids = rawLocks.filter(col("STATE") === "WAIT")
      .select(col("XID")).collect().map(_.getString(0).trim).toSet
    val nowMs = System.currentTimeMillis()
    // capture each xid's first-seen INSIDE computeIfAbsent so a concurrent
    // poller's prune (below) can at worst reset another thread's entry to
    // a slightly later first-seen — never null it out from under the read
    val seenAt: Map[String, Long] = txRows.map { x =>
      x -> firstSeen.computeIfAbsent(s"${ch.url}#$x", _ => nowMs).longValue()
    }.toMap
    val live = txRows.map(x => s"${ch.url}#$x").toSet
    firstSeen.keySet().removeIf(k => k.startsWith(ch.url + "#") && !live(k))
    val activity = spark.createDataFrame(
      txRows.toSeq.map { x =>
        val waiting = waitXids(x)
        org.apache.spark.sql.Row(
          Integer.valueOf(x.toInt),
          new java.sql.Timestamp(seenAt(x)),
          if (waiting) "Lock" else null,
          if (waiting) "relation" else null)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("pid",
          org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("xact_start",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("wait_event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("wait_event",
          org.apache.spark.sql.types.StringType))))
    LockSnapshot(locks, activity)
  }
}
