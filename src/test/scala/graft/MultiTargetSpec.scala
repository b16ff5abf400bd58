package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.engine._

/** Multi-target orchestration tests mirroring the reference's
  * TestDBCAllSeq (ALL,exclude + --seq, test_packets.py:805-841) and
  * TestDBCSignal (cancellation → TERMINATE/STARTED, :201-241).
  */
class MultiTargetSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private def engine(targets: Seq[Target]): Engine =
    new Engine(spark, targets,
      stateRoot = Files.createTempDirectory("graft-multi").toString)

  // three targets over the same fixture dir — separate state, shared data
  private def threeTargets = Seq(
    Target("alpha", "/root/testdata/sf0.001"),
    Target("beta", "/root/testdata/sf0.001"),
    Target("gamma", "/root/testdata/sf0.001"))

  test("ALL fan-out runs the packet on every target in parallel") {
    val e = engine(threeTargets)
    val res = e.run(RunSpec("run", "test_common", "ALL"))
    assert(res.resultCode == Map(
      "alpha" -> "success", "beta" -> "success", "gamma" -> "success"),
      res.notices.mkString("; "))
    assert(res.packetStatus.values.toSet == Set("done"))
    // per-target tracker state is isolated
    Seq("alpha", "beta", "gamma").foreach { t =>
      val tr = new ActionTracker(spark, e.stateDir(t))
      assert(tr.actions.count() == 24, s"target $t")
      // E27: each target run wrote its own batched log
      val logLines = Files.readAllLines(java.nio.file.Paths.get(
        e.stateDir(t), "log", s"dbc_${t}_test_common.log"))
      assert(logLines.stream().anyMatch(_.contains("packet test_common started")))
      assert(logLines.stream().anyMatch(_.contains("finished: success/done")))
    }
  }

  test("ALL,exclude + --seq runs the remaining targets sequentially") {
    val e = engine(threeTargets)
    val res = e.run(RunSpec("run", "test_common", "ALL,exclude:beta",
      sequential = true))
    assert(res.resultCode.keySet == Set("alpha", "gamma"))
    assert(res.resultCode.values.toSet == Set("success"))
  }

  test("glob selector picks matching targets only") {
    val e = engine(threeTargets)
    val res = e.run(RunSpec("run", "test_common", "?lpha,gam*"))
    assert(res.resultCode.keySet == Set("alpha", "gamma"))
  }

  test("status / wipe / unlock commands dispatch per target") {
    val e = engine(threeTargets)
    e.run(RunSpec("run", "test_common", "alpha"))
    val st = e.run(RunSpec("status", "test_common", "alpha"))
    assert(st.resultCode("alpha") == "success")
    assert(st.packetStatus("alpha") == "done")
    // status on a never-run target → nothing_todo/new
    val st2 = e.run(RunSpec("status", "test_common", "beta"))
    assert(st2.resultCode("beta") == "nothing_todo")
    assert(st2.packetStatus("beta") == "new")
    val w = e.run(RunSpec("wipe", "test_common", "alpha"))
    assert(w.resultCode("alpha") == "success")
    assert(e.run(RunSpec("wipe", "test_common", "alpha"))
      .resultCode("alpha") == "nothing_todo")
  }

  test("stop cancels a running packet: TERMINATE result, STARTED status") {
    // a packet whose single step is an expensive cross join — long enough
    // to cancel mid-flight (the reference blocks on pg_sleep)
    val dir = Files.createTempDirectory("graft-slow").resolve("slow_packet")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("01_step.sql"),
      """SELECT count(*) AS n FROM lineitem a
        JOIN lineitem b ON a.l_orderkey != b.l_orderkey
        JOIN lineitem c ON b.l_partkey != c.l_partkey;""")
    val e = new Engine(spark, Seq(Target("slow", "/root/testdata/sf0.001")),
      stateRoot = Files.createTempDirectory("graft-stop").toString,
      packetsRoot = dir.getParent.toString)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val fut = Future(e.run(RunSpec("run", "slow_packet", "slow")))
    Thread.sleep(4000) // let the job group start
    e.stop("slow", "slow_packet")
    val res = Await.result(fut, 120.seconds)
    assert(res.resultCode("slow") == "terminate", res.notices.mkString("; "))
    assert(res.packetStatus("slow") == "started")
  }

  test("concurrent run and wipe on one state dir serialize, never interleave") {
    val e = engine(Seq(Target("solo", "/root/testdata/sf0.001")))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val runFut = Future(e.run(RunSpec("run", "test_common", "solo")))
    Thread.sleep(500) // let the run take the state lock
    val wipeFut = Future(e.run(RunSpec("wipe", "test_common", "solo")))
    Await.result(runFut, 180.seconds)
    Await.result(wipeFut, 180.seconds)
    // serialized outcomes only: wipe-after-run → 0 actions; a wipe landing
    // BEFORE the run's lock → the full 24. Anything else is interleaving.
    val n = new ActionTracker(spark, e.stateDir("solo")).actions.count()
    assert(n == 0L || n == 24L, s"interleaved run/wipe left $n actions")
  }

  test("template scaffolds a new packet; list sees it") {
    val root = Files.createTempDirectory("graft-tpl").toString
    val tpl = java.nio.file.Paths.get(root, "templates", "default")
    Files.createDirectories(tpl)
    Files.writeString(tpl.resolve("01_step.sql"), "SELECT 1 AS ok;")
    val e = new Engine(spark, threeTargets,
      stateRoot = Files.createTempDirectory("graft-st").toString,
      packetsRoot = root)
    val res = e.run(RunSpec("template", packetName = "my_new_packet"))
    assert(res.resultCode("local") == "success")
    assert(Files.exists(java.nio.file.Paths.get(root, "my_new_packet", "01_step.sql")))
    val listed = e.run(RunSpec("list"))
    assert(listed.notices.exists(_.message == "my_new_packet"))
  }

  test("confirmation gate: multi-target run needs YES unless --yes/--force") {
    import graft.Cli.confirmGate
    val two = Seq("a", "b")
    assert(confirmGate("run", "p", two, yes = false, force = false,
      readLine = () => "YES"))
    assert(!confirmGate("run", "p", two, yes = false, force = false,
      readLine = () => "no"))
    // single target, --yes, --force, and non-run commands skip the prompt
    assert(confirmGate("run", "p", Seq("a"), yes = false, force = false,
      readLine = () => fail("prompted for a single target")))
    assert(confirmGate("run", "p", two, yes = true, force = false,
      readLine = () => fail("prompted despite --yes")))
    assert(confirmGate("run", "p", two, yes = false, force = true,
      readLine = () => fail("prompted despite --force")))
    assert(confirmGate("wipe", "p", two, yes = false, force = false,
      readLine = () => fail("prompted for a non-run command")))
  }

  test("shutdown hook path cancels every target and flags a fresh stop") {
    // E19: the SIGINT/SIGTERM hook is `stopAll(packet)` — drive the same
    // function the hook registers and observe the cross-process stop flags
    val e = engine(threeTargets)
    e.stopAll("test_common")
    Seq("alpha", "beta", "gamma").foreach { t =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(
        e.stateDir(t), "dbc_stop_test_common.flag")), s"no stop flag for $t")
    }
    // a subsequent run clears its own stale flag and completes
    val res = e.run(RunSpec("run", "test_common", "alpha"))
    assert(res.resultCode("alpha") == "success", res.notices.mkString("; "))
  }

  test("ini config parses databases and main sections") {
    val conf = IniConf.parse(
      """# engine config
        |[databases]
        |prod1 = /data/prod1   # primary
        |prod2 = "/data/prod2"
        |[main]
        |state_root = /tmp/state
        |""".stripMargin)
    assert(conf("databases") == Map("prod1" -> "/data/prod1", "prod2" -> "/data/prod2"))
    assert(conf("main")("state_root") == "/tmp/state")
  }
}
