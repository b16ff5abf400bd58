package graft

import java.nio.file.Files
import java.sql.DriverManager

import org.scalatest.funsuite.AnyFunSuite

import graft.engine._
import graft.sources.Tables

/** Live-JDBC target behavior against embedded Derby (the in-sandbox stand-in
  * for the reference's PostgreSQL targets): spark.read.jdbc sources, the
  * single-connection transaction sink, session-preparation init statements,
  * and the LockObserver fed by REAL database lock snapshots. Mirrors the
  * reference's live-DB test flows (tests/test_packets.py runs every packet
  * against an actual server; TestDBCLockObserver at :415-497).
  */
class JdbcTargetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session
  val fixtures = "/root/testdata/sf0.001"

  private def freshDb(): String = {
    val dir = Files.createTempDirectory("graft-derby").toString
    s"jdbc:derby:$dir/db;create=true"
  }

  /** Seed Derby tables from the parquet fixture through Spark's JDBC sink
    * (DataFrame write → database table, the ingest direction). */
  private def seed(url: String, tables: String*): Unit =
    tables.foreach { t =>
      Tables.load(spark, fixtures, t).write.format("jdbc")
        .option("url", url).option("dbtable", t).save()
    }

  private def mkPackets(name: String, files: Map[String, String]): (String, String) = {
    val root = Files.createTempDirectory("graft-jdbc-pk")
    val dir = root.resolve(name)
    Files.createDirectories(dir)
    files.foreach { case (n, c) => Files.writeString(dir.resolve(n), c) }
    (root.toString, name)
  }

  private def engine(t: Target, packetsRoot: String = "packets"): Engine =
    new Engine(spark, Seq(t),
      stateRoot = Files.createTempDirectory("graft-jdbc-state").toString,
      packetsRoot = packetsRoot)

  test("test_common runs against a live Derby target") {
    val url = freshDb()
    seed(url, "region", "nation") // the maint REFRESH targets
    val e = engine(Target("derbyt", "", jdbcUrl = Some(url)))
    val res = e.run(RunSpec("run", "test_common", "derbyt"))
    assert(res.resultCode("derbyt") == "success", res.notices.mkString("; "))
    assert(res.packetStatus("derbyt") == "done")
    val done = res.stepResults("derbyt")
    assert(done("02_step.sql") == StepOutcome.Done(10))
    assert(done("04_step.sql") == StepOutcome.Done(9))
  }

  test("write packet: one transaction per step, init statements applied, " +
      "reads see the new tables") {
    val url = freshDb()
    val (root, name) = mkPackets("jdbc_write", Map(
      "01_step.sql" -> "CREATE TABLE dbc_t (id INT PRIMARY KEY, v VARCHAR(20));",
      "02_step.sql" -> ("INSERT INTO dbc_t VALUES (1, 'a');" +
        "INSERT INTO dbc_t VALUES (2, 'b');" +
        "UPDATE dbc_t SET v = 'z' WHERE id = 2;" +
        "VALUES CURRENT ISOLATION;"),
      "03_step.sql" -> "SELECT id, v FROM dbc_t ORDER BY id;",
      "04_step.sql" -> "CREATE VIEW dbc_v AS SELECT id FROM dbc_t WHERE id = 2;",
      "05_step.sql" -> "SELECT id FROM dbc_v;",
      "meta_data.json" -> """{"description": "derby write packet"}"""))
    val e = engine(Target("derbyw", "", jdbcUrl = Some(url),
      jdbcInit = Seq("SET ISOLATION SERIALIZABLE")), root)
    val res = e.run(RunSpec("run", name, "derbyw"))
    assert(res.resultCode("derbyw") == "success", res.notices.mkString("; "))
    // the VALUES probe ran INSIDE the write transaction's connection, where
    // the E24 init statement set serializable isolation ('RR')
    val probe = res.resultData("derbyw")("02_step.sql").last
    assert(probe.rows.head.head.toString.trim == "RR", probe.toString)
    // step 03 is a pure read: it flows through the spark.read.jdbc view
    // registered after step 01's DDL, and sees both committed rows
    val read = res.resultData("derbyw")("03_step.sql").head
    assert(read.columns == Seq("id", "v"))
    assert(read.rows.map(r => (r.head.toString, r(1).toString)) ==
      Seq(("1", "a"), ("2", "z")))
    // a VIEW created mid-run is registered too (getTables must ask for
    // view types, not just TABLE) and readable by a later pure-read step
    val viewRead = res.resultData("derbyw")("05_step.sql").head
    assert(viewRead.rows.map(_.head.toString) == Seq("2"))
  }

  test("a failing statement rolls back the whole step's transaction") {
    val url = freshDb()
    val (root, name) = mkPackets("jdbc_rollback", Map(
      "01_step.sql" -> "CREATE TABLE roll_t (id INT PRIMARY KEY);",
      "02_step.sql" -> ("INSERT INTO roll_t VALUES (1);" +
        "INSERT INTO roll_t VALUES (1);"), // duplicate PK → step fails
      "meta_data.json" -> """{"description": "rollback atomicity"}"""))
    val e = engine(Target("derbyr", "", jdbcUrl = Some(url)), root)
    val res = e.run(RunSpec("run", name, "derbyr"))
    assert(res.resultCode("derbyr") == "fail")
    // the FIRST insert of the failed step must not survive (atomic tx)
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery("SELECT count(*) FROM roll_t")
      rs.next()
      assert(rs.getInt(1) == 0, "failed step leaked a partial transaction")
    } finally conn.close()
  }

  test("no_commit packet executes then rolls back on the live target") {
    val url = freshDb()
    val (root, name) = mkPackets("jdbc_nocommit", Map(
      "01_step.sql" -> "CREATE TABLE nc_t (id INT);",
      "meta_data.json" -> """{"type": "no_commit"}"""))
    val e = engine(Target("derbyn", "", jdbcUrl = Some(url)), root)
    val res = e.run(RunSpec("run", name, "derbyn"))
    assert(res.resultCode("derbyn") == "success", res.notices.mkString("; "))
    assert(res.notices.exists(_.message.contains("no_commit: rolled back")))
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "NC_T", null)
      assert(!rs.next(), "no_commit must leave no table behind")
    } finally conn.close()
  }

  test("read-only transactions are enforced by the SERVER, not keywords") {
    // the read_only passthrough path runs statements the Spark parser
    // rejected — a keyword-misclassified write (e.g. a data-modifying CTE)
    // must be refused by the database's READ ONLY connection
    val url = freshDb()
    val setup = DriverManager.getConnection(url)
    try setup.createStatement().execute("CREATE TABLE ro_t (id INT)")
    finally setup.close()
    val ch = JdbcChannel("derbyro", url)
    intercept[java.sql.SQLException] {
      Jdbc.executeTx(ch, Seq("INSERT INTO ro_t VALUES (1)"), 10,
        readOnly = true)
    }
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery("SELECT count(*) FROM ro_t")
      rs.next()
      assert(rs.getInt(1) == 0, "read-only connection let a write through")
    } finally conn.close()
  }

  test("read-only dialect passthrough: server-only syntax runs verbatim") {
    val url = freshDb()
    val (root, name) = mkPackets("jdbc_dialect", Map(
      // Spark's parser rejects VALUES CURRENT ISOLATION; a read_only
      // packet must still run it against the live database
      "01_step.sql" -> "VALUES CURRENT ISOLATION;",
      "meta_data.json" -> """{"type": "read_only"}"""))
    val e = engine(Target("derbyd", "", jdbcUrl = Some(url)), root)
    val res = e.run(RunSpec("run", name, "derbyd"))
    assert(res.resultCode("derbyd") == "success", res.notices.mkString("; "))
    val rs = res.resultData("derbyd")("01_step.sql").head
    assert(Set("CS", "RS", "RR", "UR")(rs.rows.head.head.toString.trim),
      rs.toString)
  }

  test("jdbc reads push filters down into the database scan") {
    val url = freshDb()
    seed(url, "nation")
    val ch = JdbcChannel("derbyp", url)
    Jdbc.registerTables(spark, ch)
    val q = spark.table("nation").filter("n_regionkey = 2")
      .select("n_name")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(n_regionkey,2)"), plan.take(1500))
  }

  test("lock observer detects a real blocker and a real waiter over JDBC") {
    val url = freshDb()
    val ch = JdbcChannel("derbyl", url)
    // a committed base table with one contended row
    val setup = DriverManager.getConnection(url)
    try {
      val st = setup.createStatement()
      st.execute("CREATE TABLE lk_t (id INT PRIMARY KEY, v INT)")
      st.execute("INSERT INTO lk_t VALUES (1, 0)")
      st.close()
    } finally setup.close()

    val holder = DriverManager.getConnection(url)
    holder.setAutoCommit(false)
    val blocked = new java.util.concurrent.CountDownLatch(1)
    val waiterThread = new Thread(() => {
      val waiter = DriverManager.getConnection(url)
      try {
        waiter.setAutoCommit(false)
        blocked.countDown()
        val st = waiter.createStatement()
        st.executeUpdate("UPDATE lk_t SET v = 2 WHERE id = 1") // blocks
        st.close()
        waiter.commit()
      } catch { case _: Throwable => () } finally waiter.close()
    }, "graft-jdbc-waiter")
    try {
      holder.createStatement().executeUpdate("UPDATE lk_t SET v = 1 WHERE id = 1")
      waiterThread.start()
      blocked.await()
      // poll until the database reports the waiter's ungranted lock
      var snap = Jdbc.lockSnapshot(spark, ch)
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (snap.locks.filter("NOT granted AND relation = 'LK_T'").count() == 0 &&
          System.nanoTime() < deadline) {
        Thread.sleep(200)
        snap = Jdbc.lockSnapshot(spark, ch)
      }
      val waitPid = snap.locks.filter("NOT granted AND relation = 'LK_T'")
        .select("pid").head().getInt(0)
      val holdPid = snap.locks
        .filter(s"granted AND relation = 'LK_T' AND pid <> $waitPid")
        .select("pid").head().getInt(0)
      val cancelled = scala.collection.mutable.Buffer.empty[Int]
      val obs = new LockObserver(
        snapshot = () => Jdbc.lockSnapshot(spark, ch),
        cancel = cancelled += _,
        now = () => new java.sql.Timestamp(System.currentTimeMillis()),
        blockerTimeoutSec = 0, waitTimeoutSec = 0)
      // rule 1 on the REAL snapshot: our pid (the holder) blocks the waiter
      assert(obs.blockerPids(snap, Set(holdPid)) == Seq(holdPid))
      // rule 2: our pid (the waiter) is stuck on a heavyweight lock
      assert(obs.waiterPids(snap, Set(waitPid)) == Seq(waitPid))
      // pollOnce drives cancel + counters off the live snapshot
      obs.pollOnce(Set(holdPid))
      assert(cancelled.toSeq == Seq(holdPid) && obs.blockerCnt.get() == 1)
    } finally {
      holder.commit()
      holder.close()
      waiterThread.join(30000)
    }
  }

  test("stop cancels in-flight jdbc statements without breaking the engine") {
    // embedded Derby may not implement Statement.cancel; the passthrough
    // must tolerate that (on PostgreSQL the driver's cancel is the
    // pg_cancel_backend wire request) and the registry must drain
    assert(Jdbc.cancelAll("no-such-target") == 0)
  }

  // -- E25 reconnect (reference dbccore.py:545-567, 1125-1168;
  //    TestDBCConnErr, tests/test_packets.py:260-289) ---------------------

  test("retryClass maps the reference's SQLSTATE taxonomy, walking causes") {
    def sql(state: String) = new java.sql.SQLException("boom", state)
    assert(Jdbc.retryClass(sql("08006")) == Some("connection"))
    assert(Jdbc.retryClass(sql("08003")) == Some("connection"))
    assert(Jdbc.retryClass(sql("57014")) == Some("connection")) // query_canceled
    assert(Jdbc.retryClass(sql("57P01")) == Some("connection")) // admin_shutdown
    assert(Jdbc.retryClass(sql("40P01")) == Some("deadlock_detected"))
    assert(Jdbc.retryClass(sql("40001")) == Some("deadlock_detected")) // Derby
    assert(Jdbc.retryClass(sql("42X05")).isEmpty) // object not found: permanent
    assert(Jdbc.retryClass(new IllegalStateException("nope")).isEmpty)
    // Spark/engine layers wrap the SQLException — the cause chain is walked
    assert(Jdbc.retryClass(new RuntimeException("outer",
      new RuntimeException("mid", sql("08006")))) == Some("connection"))
  }

  test("transient connection failure mid-packet reconnects and resumes to " +
      "SUCCESS with zero duplicate actions (TestDBCConnErr parity)") {
    val url = freshDb()
    val setup = DriverManager.getConnection(url)
    try setup.createStatement().execute("CREATE TABLE conn_t (v INT)")
    finally setup.close()
    val (root, name) = mkPackets("test_conn_err", Map(
      "01_step.sql" -> "INSERT INTO conn_t VALUES (1)",
      "02_step.py" -> "# killed-connection injection point",
      "03_step.sql" -> "INSERT INTO conn_t VALUES (3)",
      "meta_data.json" -> """{"description": "conn err parity"}"""))
    // the reference test kills the backend mid-run and expects the worker
    // loop to reconnect and finish; here the injected failure is the same
    // surface a killed JDBC connection presents (SQLSTATE 08006), and the
    // engine-side reconnect is inherent: every retried statement batch opens
    // a fresh prepared connection (Jdbc.openConnection)
    val calls = new java.util.concurrent.atomic.AtomicInteger
    ScalaSteps.register(name, "02_step.py") { _ =>
      if (calls.incrementAndGet() <= 2)
        throw new java.sql.SQLNonTransientConnectionException(
          "java.net.SocketException: connection reset", "08006")
    }
    val e = new Engine(spark, Seq(Target("derbyk", "", jdbcUrl = Some(url))),
      stateRoot = Files.createTempDirectory("graft-jdbc-state").toString,
      packetsRoot = root, connExceptionSleepMs = 10)
    val res = e.run(RunSpec("run", name, "derbyk"))
    assert(res.resultCode("derbyk") == "success", res.notices.mkString("; "))
    assert(res.packetStatus("derbyk") == "done")
    assert(calls.get == 3, s"expected 2 failures + 1 success, saw ${calls.get}")
    // completed actions must NOT re-run across the reconnects: exactly one
    // row from each insert step
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        "SELECT v, COUNT(*) FROM conn_t GROUP BY v ORDER BY v")
      val counts = Iterator.continually(rs)
        .takeWhile(_.next()).map(r => (r.getInt(1), r.getInt(2))).toList
      assert(counts == List((1, 1), (3, 1)), counts.toString)
    } finally conn.close()
  }

  test("deadlock (40001/40P01) is retryable: the run resumes to SUCCESS") {
    val url = freshDb()
    val (root, name) = mkPackets("test_deadlock_retry", Map(
      "01_step.py" -> "# deadlock injection point",
      "meta_data.json" -> """{"description": "deadlock retry"}"""))
    val calls = new java.util.concurrent.atomic.AtomicInteger
    ScalaSteps.register(name, "01_step.py") { _ =>
      if (calls.incrementAndGet() == 1)
        throw new java.sql.SQLTransactionRollbackException(
          "deadlock detected", "40001")
    }
    val e = new Engine(spark, Seq(Target("derbyd", "", jdbcUrl = Some(url))),
      stateRoot = Files.createTempDirectory("graft-jdbc-state").toString,
      packetsRoot = root, connExceptionSleepMs = 10)
    val res = e.run(RunSpec("run", name, "derbyd"))
    assert(res.resultCode("derbyd") == "success", res.notices.mkString("; "))
    assert(calls.get == 2)
  }

  test("retry limit exhaustion fails the packet loudly") {
    val url = freshDb()
    val (root, name) = mkPackets("test_conn_exhaust", Map(
      "01_step.py" -> "# permanent outage",
      "meta_data.json" -> """{"description": "outage"}"""))
    val calls = new java.util.concurrent.atomic.AtomicInteger
    ScalaSteps.register(name, "01_step.py") { _ =>
      calls.incrementAndGet()
      throw new java.sql.SQLNonTransientConnectionException("down", "08006")
    }
    val e = new Engine(spark, Seq(Target("derbyx", "", jdbcUrl = Some(url))),
      stateRoot = Files.createTempDirectory("graft-jdbc-state").toString,
      packetsRoot = root, connExceptionSleepMs = 1, connRetryLimit = 2)
    val res = e.run(RunSpec("run", name, "derbyx"))
    assert(res.resultCode("derbyx") == "fail")
    assert(res.packetStatus("derbyx") == "exception")
    assert(calls.get == 3, s"initial attempt + 2 retries, saw ${calls.get}")
    assert(res.notices.exists(_.message.contains("retry limit")),
      res.notices.mkString("; "))
  }

  test("skip-step-cancel takes precedence over reconnect (reference order)") {
    // dbccore.py:1155-1171: a retryable failure under --skip-step-cancel
    // skips the step (errors_count += 1) instead of looping forever
    val url = freshDb()
    val (root, name) = mkPackets("test_skip_over_retry", Map(
      "01_step.py" -> "# retryable failure under skip",
      "meta_data.json" -> """{"description": "skip precedence"}"""))
    val calls = new java.util.concurrent.atomic.AtomicInteger
    ScalaSteps.register(name, "01_step.py") { _ =>
      calls.incrementAndGet()
      throw new java.sql.SQLNonTransientConnectionException("killed", "08006")
    }
    val e = new Engine(spark, Seq(Target("derbys", "", jdbcUrl = Some(url))),
      stateRoot = Files.createTempDirectory("graft-jdbc-state").toString,
      packetsRoot = root, connExceptionSleepMs = 10)
    val res = e.run(RunSpec("run", name, "derbys", skipStepCancel = true))
    assert(res.resultCode("derbys") == "fail") // errors_count rule
    assert(calls.get == 1, "skip must not retry")
  }

  // -- typed retryability (Outcome/Kind refactor): retry is a KIND, never a
  //    descr-string match (reference classifies by error class,
  //    dbccore.py:1125-1171, not by message text) ------------------------

  test("a non-retryable failure whose MESSAGE says 'connection' is NOT " +
      "retried (typed Kind, not string match)") {
    val url = freshDb()
    val (root, name) = mkPackets("test_msg_not_class", Map(
      "01_step.py" -> "# permanent failure with a misleading message",
      "meta_data.json" -> """{"description": "message is not a class"}"""))
    val calls = new java.util.concurrent.atomic.AtomicInteger
    ScalaSteps.register(name, "01_step.py") { _ =>
      calls.incrementAndGet()
      // message reads like an outage; the exception class/SQLSTATE is NOT
      // retryable — retrying this would loop on a permanent failure
      throw new IllegalStateException("connection: invalid column reference")
    }
    val e = new Engine(spark, Seq(Target("derbym", "", jdbcUrl = Some(url))),
      stateRoot = Files.createTempDirectory("graft-jdbc-state").toString,
      packetsRoot = root, connExceptionSleepMs = 1, connRetryLimit = 5)
    val res = e.run(RunSpec("run", name, "derbym"))
    assert(res.resultCode("derbym") == "fail")
    assert(res.packetStatus("derbym") == "exception")
    assert(calls.get == 1, s"non-retryable must run once, saw ${calls.get}")
  }

  test("retry exhaustion leaves a terminal exception status on the FAILED " +
      "step (while retrying, the step stays status-less)") {
    val url = freshDb()
    val (root, name) = mkPackets("test_exhaust_step_status", Map(
      "01_step.py" -> "# permanent outage",
      "meta_data.json" -> """{"description": "outage step status"}"""))
    ScalaSteps.register(name, "01_step.py") { _ =>
      throw new java.sql.SQLNonTransientConnectionException("down", "08006")
    }
    val e = new Engine(spark, Seq(Target("derbyes", "", jdbcUrl = Some(url))),
      stateRoot = Files.createTempDirectory("graft-jdbc-state").toString,
      packetsRoot = root, connExceptionSleepMs = 1, connRetryLimit = 2)
    val res = e.run(RunSpec("run", name, "derbyes"))
    assert(res.resultCode("derbyes") == "fail")
    // the exhausted step carries the terminal error, not just the packet
    res.stepResults("derbyes").get("01_step.py") match {
      case Some(StepOutcome.Failed(err)) =>
        assert(err.contains("retry limit"), err)
      case other => fail(s"expected Failed(retry limit ...) step, got $other")
    }
  }

  test("terminate during a retryable failure ends the run as a terminal " +
      "error, not a silent loop exit") {
    val (root, name) = mkPackets("test_term_in_retry", Map(
      "01_step.py" -> "# retryable failure with terminate in flight",
      "meta_data.json" -> """{"description": "terminate mid-retry"}"""))
    val calls = new java.util.concurrent.atomic.AtomicInteger
    ScalaSteps.register(name, "01_step.py") { _ =>
      calls.incrementAndGet()
      throw new java.sql.SQLNonTransientConnectionException("killed", "08006")
    }
    // terminated() flips AFTER the step classifies its failure Retryable
    // (calls 1-2: pre-action poll + in-catch precedence check) and BEFORE
    // the runner's retry gate (call 3) — the narrow window where the old
    // code silently exited the while loop with a stale outcome
    val polls = new java.util.concurrent.atomic.AtomicInteger
    val conf = RunnerConf(
      stateDir = Files.createTempDirectory("graft-term-state").toString,
      connExceptionSleepMs = 1, connRetryLimit = 5,
      terminated = () => polls.incrementAndGet() >= 3)
    val res = new PacketRunner(spark, conf).run(s"$root/$name")
    assert(res.resultCode("spark") == "fail",
      s"expected terminal error, got ${res.resultCode}")
    assert(res.packetStatus("spark") == "exception")
    assert(calls.get == 1, s"no retry may run after terminate, saw ${calls.get}")
  }
}
