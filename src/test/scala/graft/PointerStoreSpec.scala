package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{EmulatedConditionalPutStore, ManifestTable, PartitionedManifest}

/** The object-store publication path: pointer swap and publish lock
  * running purely on conditional-PUT primitives (the emulated store is
  * linearizable per path — the protocol may only call get /
  * putIfAbsent / putIfMatch / delete, so a race it survives here it
  * survives against S3/GCS/Azure conditional writes). */
class PointerStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private def withStore[A](f: (String, EmulatedConditionalPutStore) => A): A = {
    val root = Files.createTempDirectory("graft-ptrstore").toString
    val store = new EmulatedConditionalPutStore
    ManifestTable.installPointerStore(root, store)
    try f(root, store) finally ManifestTable.removePointerStore(root)
  }

  test("publish over the conditional-PUT backend: pointer always " +
      "resolves a complete version while versions advance") {
    withStore { (base, store) =>
      val root = s"$base/t"
      import spark.implicits._
      ManifestTable.publish(spark, root, Seq((0L, 0L)).toDF("v", "i"))
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
      val reads = new java.util.concurrent.atomic.AtomicInteger(0)
      val reader = new Thread(() => {
        while (!stop.get()) {
          def scan(): Option[Seq[Long]] =
            try Some(ManifestTable.read(spark, root)
              .select($"v").distinct().as[Long].collect().toSeq)
            catch { case _: Throwable => None }
          scan().orElse(scan()).orElse(scan()) match {
            case Some(vs) =>
              if (vs.length != 1)
                bad.compareAndSet(null, s"torn read: $vs")
              reads.incrementAndGet()
            case None => bad.compareAndSet(null, "read failed 3x")
          }
        }
      })
      reader.start()
      for (v <- 1 to 5) {
        ManifestTable.publish(spark, root,
          (1 to 10).map(i => (v.toLong, i.toLong)).toDF("v", "i"))
        Thread.sleep(30)
      }
      stop.set(true); reader.join(60000)
      assert(bad.get() == null, String.valueOf(bad.get()))
      assert(reads.get() > 0)
      assert(ManifestTable.currentVersion(root).get.startsWith("v000006"))
    }
  }

  test("single-writer via conditional PUT: a second publisher fails " +
      "loudly while the lock is held; a stale lock is taken over with " +
      "one If-Match replace") {
    withStore { (base, store) =>
      val root = s"$base/t2"
      import spark.implicits._
      ManifestTable.publish(spark, root, Seq((1L, 1L)).toDF("v", "i"))
      // hold the lock by hand (fresh timestamp = live)
      assert(store.putIfAbsent(s"$root/.PUBLISH_LOCK",
        s"${System.currentTimeMillis()} held-by-test"))
      val ex = intercept[ManifestTable.ConcurrentPublishException] {
        ManifestTable.publish(spark, root, Seq((2L, 2L)).toDF("v", "i"))
      }
      assert(ex.getMessage.contains("single-writer"))
      // make the same lock STALE (crashed publisher) -> taken over
      val (_, tag) = store.get(s"$root/.PUBLISH_LOCK").get
      assert(store.putIfMatch(s"$root/.PUBLISH_LOCK",
        s"${System.currentTimeMillis() - 11 * 60 * 1000} crashed", tag))
      ManifestTable.publish(spark, root, Seq((3L, 3L)).toDF("v", "i"))
      import spark.implicits._
      val vs = ManifestTable.read(spark, root)
        .select($"v").as[Long].collect().toSeq
      assert(vs == Seq(3L), vs)
    }
  }

  test("exactly ONE of N waiters takes over a stale lock (the If-Match " +
      "tag moves on the first takeover)") {
    withStore { (base, store) =>
      val root = s"$base/t3"
      new java.io.File(root).mkdirs()
      assert(store.putIfAbsent(s"$root/.PUBLISH_LOCK", "0 crashed-long-ago"))
      import spark.implicits._
      ManifestTable.publish(spark, root, Seq((0L, 0L)).toDF("v", "i"))
      // ^ that publish itself took the stale lock over and released it;
      // now race N writers on a fresh stale lock: exactly one publish
      // per round can win the takeover, others must fail loudly
      store.delete(s"$root/.PUBLISH_LOCK")
      assert(store.putIfAbsent(s"$root/.PUBLISH_LOCK", "0 crashed-again"))
      val wins = new java.util.concurrent.atomic.AtomicInteger(0)
      val fails = new java.util.concurrent.atomic.AtomicInteger(0)
      val gate = new java.util.concurrent.CountDownLatch(1)
      val threads = (1 to 6).map { t =>
        new Thread(() => {
          gate.await()
          try {
            ManifestTable.publish(spark, root,
              Seq((t.toLong, t.toLong)).toDF("v", "i"))
            wins.incrementAndGet()
          } catch {
            case _: ManifestTable.ConcurrentPublishException =>
              fails.incrementAndGet()
          }
        })
      }
      threads.foreach(_.start()); gate.countDown()
      threads.foreach(_.join(120000))
      // at least one writer must get through (the takeover), and every
      // thread must end in exactly one bucket — no hangs, no corruption
      assert(wins.get() >= 1, "no writer won the stale-lock takeover")
      assert(wins.get() + fails.get() == 6)
      val cur = ManifestTable.currentVersion(root)
      assert(cur.nonEmpty)
    }
  }

  test("snapshot commits + time travel run unchanged over the " +
      "conditional-PUT backend (reader never sees a torn snapshot)") {
    withStore { (base, store) =>
      val root = s"$base/snap"
      import spark.implicits._
      def part(v: Int) = (1 to 10).map(i => (v.toLong, i.toLong)).toDF("v", "i")
      PartitionedManifest.seed(spark, root,
        part(0).withColumn("bk", org.apache.spark.sql.functions.lit(0))
          .unionByName(part(0).withColumn("bk",
            org.apache.spark.sql.functions.lit(1))), "bk")
      PartitionedManifest.commitSnapshot(spark, root, "bk", Map.empty)
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val bad = new java.util.concurrent.atomic.AtomicReference[String](null)
      val reads = new java.util.concurrent.atomic.AtomicInteger(0)
      val reader = new Thread(() => {
        while (!stop.get()) {
          def scan(): Option[Seq[Long]] =
            try Some(PartitionedManifest
              .readSnapshot(spark, root, "bk", "int")
              .select($"v").distinct().as[Long].collect().toSeq)
            catch { case _: Throwable => None }
          scan().orElse(scan()).orElse(scan()) match {
            case Some(vs) =>
              if (vs.length != 1)
                bad.compareAndSet(null, s"torn snapshot: $vs")
              reads.incrementAndGet()
            case None => bad.compareAndSet(null, "reader failed 3x")
          }
        }
      })
      reader.start()
      for (v <- 1 to 4)
        PartitionedManifest.commitSnapshot(spark, root, "bk",
          Map("0" -> part(v).drop("bk"), "1" -> part(v).drop("bk")))
      stop.set(true); reader.join(60000)
      assert(bad.get() == null, String.valueOf(bad.get()))
      assert(reads.get() > 0)
      val snaps = PartitionedManifest.snapshots(spark, root)
      assert(snaps.length == 2)
      val prev = PartitionedManifest.readSnapshot(spark, root, "bk", "int",
        Some(snaps.head)).select($"v").distinct().as[Long].collect().toSeq
      assert(prev == Seq(3L), prev)
    }
  }

  test("a prefix installed WITH a trailing slash still routes its own " +
      "exact root through the store (no silent rename fallback)") {
    val base = Files.createTempDirectory("graft-ptrslash").toString
    // record which paths the protocol actually routed through the store
    // (the emulation is filesystem-backed, so the FILES look the same
    // either way — only the call trace distinguishes the mediums)
    val touched = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val inner = new EmulatedConditionalPutStore
    val store: graft.engine.PointerStore = new graft.engine.PointerStore {
      def get(path: String) = inner.get(path)
      def putIfAbsent(path: String, content: String) = {
        touched.add(path); inner.putIfAbsent(path, content)
      }
      def putIfMatch(path: String, content: String, tag: String) = {
        touched.add(path); inner.putIfMatch(path, content, tag)
      }
      def delete(path: String): Unit = inner.delete(path)
      def deleteIfMatch(path: String, tag: String) =
        inner.deleteIfMatch(path, tag)
    }
    // trailing slash on the installed prefix; publish at the EXACT root
    ManifestTable.installPointerStore(base + "/", store)
    try {
      import spark.implicits._
      ManifestTable.publish(spark, base, Seq((1L, 1L)).toDF("v", "i"))
      assert(touched.contains(s"$base/MANIFEST"),
        s"exact root under a slash-suffixed prefix bypassed the store: $touched")
      // and the sibling-root boundary still holds
      val sibling = base + "_archive"
      ManifestTable.publish(spark, sibling, Seq((2L, 2L)).toDF("v", "i"))
      assert(!touched.contains(s"$sibling/MANIFEST"),
        "sibling root must NOT be captured by the prefix")
    } finally ManifestTable.removePointerStore(base + "/")
  }
}
