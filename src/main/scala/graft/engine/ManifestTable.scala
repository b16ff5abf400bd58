package graft.engine

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic table publication by MANIFEST-pointer indirection — the
  * copy-on-write publish the w-family's plain-parquet DROP+RENAME swap
  * could not make atomic (SURVEY §7 risk 1; the reference closes the
  * same gap with per-step DB transactions, dbccore.py:857-888; Delta/
  * Iceberg close it with commit logs).
  *
  * Layout: `root/MANIFEST` is a one-line pointer naming the current
  * version directory `root/v{gen}-{uuid8}/` (plain parquet). Readers
  * resolve the pointer, then scan; publishers write a COMPLETE new
  * version directory and swap the pointer with one `rename(2)` — POSIX-
  * atomic, so any reader (this session, another Spark session, another
  * engine entirely) sees the old version or the new one, never a
  * mixture and never a missing table. In-session readers go through a
  * session view re-pointed with a single `CREATE OR REPLACE TEMPORARY
  * VIEW` (one catalog operation, same no-torn-read property).
  *
  * GC keeps the current AND previous version directories (a bounded
  * in-flight-reader horizon, the same contract as Iceberg snapshot
  * expiry: a reader that resolved the pointer more than one publish ago
  * has no liveness guarantee); everything older is deleted.
  *
  * At 100 TB nothing here changes: the version directory is whatever
  * the job wrote (partitioned, bucketed), the pointer is still one
  * file, and the swap is still one rename on the object store /
  * filesystem namespace.
  */
object ManifestTable {

  private val Pointer = "MANIFEST"

  def currentVersion(root: String): Option[String] = {
    val p = Paths.get(root, Pointer)
    if (Files.exists(p)) Some(Files.readString(p).trim) else None
  }

  def currentDataDir(root: String): Option[String] =
    currentVersion(root).map(v => s"$root/$v")

  /** Resolve the pointer once, read that version (cross-session reader
    * path; in-session readers use the published view instead). */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(currentDataDir(root).getOrElse(
      sys.error(s"ManifestTable: no MANIFEST under $root")))

  /** Publish `df` as the next version: full write → atomic pointer swap
    * → keep-2 GC. Returns the new version's data directory. */
  def publish(spark: SparkSession, root: String, df: DataFrame): String = {
    Files.createDirectories(Paths.get(root))
    val prev = currentVersion(root)
    val gen = prev.map(_.drop(1).takeWhile(_.isDigit).toInt).getOrElse(0) + 1
    val ver = f"v$gen%06d-${java.util.UUID.randomUUID.toString.take(8)}"
    val dataDir = s"$root/$ver"
    df.write.mode("error").parquet(dataDir)
    val tmp = Paths.get(root, s".$Pointer.tmp.$ver")
    Files.writeString(tmp, ver + "\n")
    Files.move(tmp, Paths.get(root, Pointer),
      StandardCopyOption.ATOMIC_MOVE)
    gc(root, keep = Set(Some(ver), prev).flatten)
    dataDir
  }

  private def gc(root: String, keep: Set[String]): Unit = {
    val dir = Paths.get(root)
    val versions = Files.list(dir).toArray.map(_.asInstanceOf[Path])
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("v"))
    versions.filterNot(p => keep(p.getFileName.toString)).foreach(deleteTree)
  }

  private def deleteTree(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).toArray.map(_.asInstanceOf[Path]).foreach(deleteTree)
    Files.deleteIfExists(p)
  }

  /** Register the python-step callback that publishes `srcTable`'s rows
    * under `finalName` through the manifest at placeholder `rootKey`:
    * version write → atomic pointer swap → session view re-point (ONE
    * catalog op — in-session readers of `finalName` see old or new,
    * never missing; steady-state republish is a single view replace) →
    * staging-table drop. Replaces the packet's non-atomic
    * `DROP TABLE x; ALTER TABLE x_new RENAME TO x` dance. Idempotent
    * registration (the ScalaSteps map overwrites). */
  /** Standing registrations for the shipped packet corpus' publish
    * steps (idempotent — call before running these packets). */
  def ensurePacketPublishSteps(): Unit = {
    registerPublishStep("test_delete", "02_step.py",
      "del_tbl_rw", "del_tbl", "del_pub")
    registerPublishStep("test_add_column", "03_step.py",
      "evo_tbl_new", "evo_tbl", "evo_pub")
  }

  def registerPublishStep(packet: String, stepFile: String,
      srcTable: String, finalName: String, rootKey: String): Unit =
    ScalaSteps.register(packet, stepFile) { ctx =>
      val spark = ctx.spark
      val root = ctx.placeholders.getOrElse(rootKey,
        sys.error(s"$packet/$stepFile: missing placeholder $rootKey " +
          "(manifest root)"))
      val dataDir = publish(spark, root, spark.table(srcTable))
      // one-time bootstrap: the seeded catalog TABLE under finalName must
      // yield to the view (two ops, in-session only); every later publish
      // is the single CREATE OR REPLACE — the atomic steady state
      spark.sql(s"DROP TABLE IF EXISTS `$finalName`")
      spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW `$finalName` AS " +
        s"SELECT * FROM parquet.`$dataDir`")
      spark.sql(s"DROP TABLE IF EXISTS `$srcTable`")
      ctx.notice("info", s"published $finalName -> $dataDir (manifest swap)")
    }
}
