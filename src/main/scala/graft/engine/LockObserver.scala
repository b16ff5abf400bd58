package graft.engine

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A point-in-time view of the target's lock state: the two catalog
  * relations the observer queries. On a live JDBC target these are
  * `spark.read.jdbc` pulls of pg_locks / pg_stat_activity; in tests, the
  * synthesized PgCatalog fixture. File targets have no server locks —
  * there the engine's protection is job-group cancellation (Engine.stop),
  * and no observer is started. */
final case class LockSnapshot(locks: DataFrame, activity: DataFrame)

/** Workload-protection sidecar (reference E17 lock observer,
  * /root/reference/dbccore/dbccore.py:155-273): watch OUR backend pids
  * and cancel them the moment they get in the production workload's way —
  * the tool yields, never the application.
  *
  * Two detection rules per poll, exactly the reference's queries:
  *
  *  1. blocker (dbccore.py:185-198): some backend `waiting` is NOT
  *     granted a lock, has been in its transaction longer than
  *     `blockerTimeoutSec`, and one of OUR pids holds a conflicting lock —
  *     same (database, relation), or same transactionid (the reference's
  *     `a AND b OR c` precedence is reproduced deliberately). Our pid is
  *     cancelled; `blockerCnt` increments.
  *  2. waiter (dbccore.py:209-220): one of OUR pids has been waiting on a
  *     heavyweight lock (`wait_event_type = 'Lock'`) in a transaction
  *     older than `waitTimeoutSec`. It is cancelled; `waitCnt` increments.
  *
  * Scale shape: the reference probes per-pid with EXISTS, one round trip
  * per observed pid; here each rule is ONE set-based plan over all
  * observed pids (the blocker OR-join is decomposed into two equi-joins
  * unioned — a BNLJ-free form that also holds on a busy catalog), and
  * only the cancelled-pid list (bounded by our own session count) reaches
  * the driver.
  *
  * Counters mirror `lock_observer_blocker_cnt` / `lock_observer_wait_cnt`
  * (asserted by reference tests test_packets.py:415-497).
  */
final class LockObserver(
    snapshot: () => LockSnapshot,
    cancel: Int => Unit,
    now: () => java.sql.Timestamp,
    blockerTimeoutSec: Long,
    waitTimeoutSec: Long) {

  val blockerCnt = new AtomicInteger(0)
  val waitCnt = new AtomicInteger(0)

  /** Rule 1: which of `ourPids` hold locks that block someone else past
    * the blocker timeout. */
  def blockerPids(snap: LockSnapshot, ourPids: Set[Int]): Seq[Int] = {
    if (ourPids.isEmpty) return Nil
    val cutoff = java.sql.Timestamp.from(
      now().toInstant.minusSeconds(blockerTimeoutSec))
    val waiting = snap.locks.filter(!col("granted"))
      .join(snap.activity.select(col("pid"), col("xact_start")), "pid")
      .filter(col("xact_start") < lit(cutoff))
      .select(col("pid").as("waiting_pid"), col("database"),
        col("relation"), col("transactionid"))
    val ours = snap.locks
      .filter(col("pid").isin(ourPids.toSeq.map(Integer.valueOf): _*))
      .select(col("pid").as("our_pid"), col("database"),
        col("relation"), col("transactionid"))
    // (database = AND relation =) OR (transactionid =) as two equi-joins
    val byRelation = waiting.join(ours, Seq("database", "relation"))
    val byXid = waiting.join(
      ours.withColumnRenamed("transactionid", "txid"),
      waiting("transactionid") === col("txid"))
    byRelation.select(col("waiting_pid"), col("our_pid"))
      .unionByName(byXid.select(col("waiting_pid"), col("our_pid")))
      .filter(col("waiting_pid") =!= col("our_pid"))
      .select(col("our_pid")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
  }

  /** Rule 2: which of `ourPids` are stuck waiting on a heavyweight lock
    * past the wait timeout. */
  def waiterPids(snap: LockSnapshot, ourPids: Set[Int]): Seq[Int] = {
    if (ourPids.isEmpty) return Nil
    val cutoff = java.sql.Timestamp.from(
      now().toInstant.minusSeconds(waitTimeoutSec))
    snap.activity
      .filter(col("pid").isin(ourPids.toSeq.map(Integer.valueOf): _*))
      .filter(col("wait_event").isNotNull &&
        col("wait_event_type") === "Lock" &&
        col("xact_start") < lit(cutoff))
      .select(col("pid")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
  }

  /** One observation round: evaluate both rules against a fresh snapshot,
    * cancel every offender once, bump counters. Returns the pids still
    * under observation. */
  def pollOnce(ourPids: Set[Int]): Set[Int] = {
    val snap = snapshot()
    val blockers = blockerPids(snap, ourPids)
    blockers.foreach { p => cancel(p); blockerCnt.incrementAndGet() }
    val remaining = ourPids -- blockers
    val waiters = waiterPids(snap, remaining)
    waiters.foreach { p => cancel(p); waitCnt.incrementAndGet() }
    remaining -- waiters
  }

  @volatile private var running = false

  /** Background loop (reference sleep_lo poll cycle): observe until
    * stopped or nothing is left to observe. */
  def start(ourPids: () => Set[Int], sleepIntervalMs: Long): Thread = {
    running = true
    val t = new Thread(() => {
      while (running && ourPids().nonEmpty) {
        pollOnce(ourPids())
        val deadline = System.nanoTime() + sleepIntervalMs * 1000000L
        while (running && System.nanoTime() < deadline) Thread.sleep(10)
      }
    }, "graft-lock-observer")
    t.setDaemon(true)
    t.start()
    t
  }

  def stop(): Unit = running = false
}
