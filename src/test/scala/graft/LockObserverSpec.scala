package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{LockObserver, LockSnapshot}
import graft.sources.PgCatalog

/** Lock-observer tests mirroring the reference's TestDBCBlockerTxTimeout
  * (lock_observer_blocker_cnt == 1 after blocking a vacuum,
  * test_packets.py:415-447) and TestDBCWaitTxTimeout
  * (lock_observer_wait_cnt == 1, :450-497), driven by the synthesized
  * catalog fixture: pid 404 idles in a transaction that blocks 303 (via
  * transactionid 555), pid 101 holds the relation lock 202 waits on, and
  * pid 202 is a backend stuck on a heavyweight lock.
  */
class LockObserverSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private def fixtureSnapshot(): LockSnapshot = {
    PgCatalog.registerAll(spark)
    LockSnapshot(spark.table("pg_locks"), spark.table("pg_stat_activity"))
  }

  // fixture xact_starts span 09:55:00..10:04:50
  private val clock = Timestamp.valueOf("2024-01-01 10:05:00")

  private def observer(cancelled: scala.collection.mutable.Buffer[Int],
      blockerSec: Long = 60, waitSec: Long = 60) =
    new LockObserver(() => fixtureSnapshot(), cancelled += _,
      () => clock, blockerSec, waitSec)

  test("blocker rule cancels our pid when it blocks another backend") {
    val cancelled = scala.collection.mutable.Buffer.empty[Int]
    val obs = observer(cancelled)
    // 404 is ours: it holds transactionid 555 that 303 waits on (303's
    // xact is 3 min old > 60 s threshold)
    val left = obs.pollOnce(Set(404))
    assert(cancelled == Seq(404))
    assert(obs.blockerCnt.get() == 1 && obs.waitCnt.get() == 0)
    assert(left.isEmpty)
  }

  test("wait rule cancels our pid stuck on a heavyweight lock") {
    val cancelled = scala.collection.mutable.Buffer.empty[Int]
    val obs = observer(cancelled)
    // 202 is ours: wait_event_type='Lock', xact 4.5 min old > 60 s —
    // but it blocks nobody, so only the wait rule fires
    val left = obs.pollOnce(Set(202))
    assert(cancelled == Seq(202))
    assert(obs.blockerCnt.get() == 0 && obs.waitCnt.get() == 1)
    assert(left.isEmpty)
  }

  test("innocent pid is left alone; thresholds gate both rules") {
    val cancelled = scala.collection.mutable.Buffer.empty[Int]
    // 505 holds an uncontended lock and waits on nothing
    assert(observer(cancelled).pollOnce(Set(505)) == Set(505))
    assert(cancelled.isEmpty)
    // with 10-minute thresholds nothing is old enough to cancel
    val lenient = observer(cancelled, blockerSec = 600, waitSec = 600)
    assert(lenient.pollOnce(Set(404, 202, 505)) == Set(404, 202, 505))
    assert(cancelled.isEmpty)
  }

  test("one round handles blocker and waiter together") {
    val cancelled = scala.collection.mutable.Buffer.empty[Int]
    val obs = observer(cancelled)
    val left = obs.pollOnce(Set(404, 202, 505))
    assert(cancelled.sorted == Seq(202, 404))
    assert(obs.blockerCnt.get() == 1 && obs.waitCnt.get() == 1)
    assert(left == Set(505))
  }

  test("101 blocks 202 via the relation branch of the join") {
    val cancelled = scala.collection.mutable.Buffer.empty[Int]
    val obs = observer(cancelled)
    assert(obs.blockerPids(fixtureSnapshot(), Set(101)) == Seq(101))
  }
}
