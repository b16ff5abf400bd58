package graft.engine

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partition-scoped atomic publication: every partition of a table is
  * its own [[ManifestTable]] root —
  *
  * {{{
  *   root/bk=0/MANIFEST        -> names root/bk=0/v000002-xxxx/
  *   root/bk=0/v000002-xxxx/   (parquet, partition column NOT stored)
  *   root/bk=1/MANIFEST        -> ...
  * }}}
  *
  * This is the missing atomicity mode between w02/w05's whole-table
  * manifest (a merge would rewrite the full table per publish — wrong
  * when cost must scale with the delta's partition footprint) and
  * dynamic partition overwrite (delta-scoped, but a concurrent reader
  * of a partition mid-overwrite sees a torn mix of old and new files).
  * Here a publish rewrites ONLY the touched partitions, and each
  * partition flips old→new in one pointer swap: a reader never sees a
  * torn PARTITION. Cross-partition consistency is intentionally not
  * claimed — a multi-partition publish is a sequence of per-partition
  * commits, which is exactly the contract of the merge/SCD2 write path
  * (a single root-level commit over partition manifests is the step
  * from here to a full Iceberg-style table format, noted in SURVEY).
  *
  * The partition column is carried by the DIRECTORY NAME (hive-style
  * `col=value`), never by the data files; readers re-attach it as a
  * literal per partition branch — which also means a `WHERE col = k`
  * filter constant-folds every other branch to an empty relation, so
  * the merge staging scan still reads exactly one partition's files
  * (plan-asserted in PlanAuditSpec).
  *
  * In-session readers go through a session view rebuilt with ONE
  * catalog operation after each publish (the w02 property); fresh
  * engines resolve the per-partition pointers directly via [[read]].
  */
object PartitionedManifest {

  /** One Spark job writes `df` hive-partitioned by `partCol` into a
    * scratch dir; each partition directory is then ADOPTED (one rename,
    * no data copy) as version 1 of its own manifest root. */
  def seed(spark: SparkSession, root: String, df: DataFrame,
      partCol: String): Unit = {
    val scratch = s"$root/.seed-${java.util.UUID.randomUUID.toString.take(8)}"
    df.write.mode("error").partitionBy(partCol).parquet(scratch)
    val fs = new HPath(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new HPath(scratch))
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(s"$partCol="))
    require(parts.nonEmpty, s"seed produced no $partCol=* partitions")
    parts.foreach { p =>
      ManifestTable.adoptVersion(s"$root/${p.getPath.getName}",
        p.getPath.toString)
    }
    fs.delete(new HPath(scratch), true)
  }

  /** Publish one partition's replacement rows (the staged copy-on-write
    * result, WITHOUT the partition column — it lives in the directory
    * name) as that partition's next version: full write → one atomic
    * pointer swap → keep-2 GC, all inherited from [[ManifestTable]]. */
  def publishPartition(spark: SparkSession, root: String, partCol: String,
      value: String, df: DataFrame): String = {
    val data =
      if (df.columns.contains(partCol)) df.drop(partCol) else df
    ManifestTable.publish(spark, s"$root/$partCol=$value", data)
  }

  /** The partition values present under `root`, from the directory
    * names (partition-count-bounded listing). */
  def partitionValues(spark: SparkSession, root: String,
      partCol: String): Seq[String] = {
    val fs = new HPath(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new HPath(root))
      .filter(s => s.isDirectory &&
        s.getPath.getName.startsWith(s"$partCol="))
      .map(_.getPath.getName.stripPrefix(s"$partCol="))
      .sorted.toSeq
  }

  /** Cross-session reader: resolve every partition's pointer ONCE, scan
    * those version directories, re-attach the partition column as a
    * typed literal per branch. Per-partition atomicity: each branch is
    * a complete old or new version, never a mixture. */
  def read(spark: SparkSession, root: String, partCol: String,
      partType: String): DataFrame = {
    val parts = partitionValues(spark, root, partCol)
    require(parts.nonEmpty, s"PartitionedManifest: no $partCol=* under $root")
    parts.map { v =>
      val dir = ManifestTable.currentDataDir(s"$root/$partCol=$v")
        .getOrElse(sys.error(
          s"PartitionedManifest: no MANIFEST under $root/$partCol=$v"))
      spark.read.parquet(dir)
        .withColumn(partCol, lit(v).cast(partType))
    }.reduce(_.unionByName(_))
  }

  /** Rebuild the session view over the current pointers — ONE catalog
    * operation, the same no-torn-read property as w02's view re-point. */
  def refreshView(spark: SparkSession, root: String, view: String,
      partCol: String, partType: String): Unit =
    read(spark, root, partCol, partType).createOrReplaceTempView(view)

  /** Standing registrations for the merge/SCD2 packets' seed and
    * publish steps (idempotent — call before running these packets). */
  def ensurePacketPublishSteps(): Unit = {
    registerSeedStep("test_merge", "01_step.py",
      "mrg_seed", "mrg_tbl", "mrg_src", "bk", "int")
    registerPublishStep("test_merge", "03_step.py",
      "mrg_delta", "mrg_stage_", "mrg_tbl", "mrg_src", "bk", "int")
    registerSeedStep("test_scd2", "01_step.py",
      "scd_seed", "scd_dim", "scd_src", "bk", "int")
    registerPublishStep("test_scd2", "03_step.py",
      "scd_delta", "scd_stage_", "scd_dim", "scd_src", "bk", "int")
  }

  /** Seed step: convert the run_once-created seed TABLE into the
    * per-partition manifest layout under the root placeholder, expose
    * the session view, drop the seed table. Resume-safe: if the seed
    * table is already gone, only the view is rebuilt. */
  def registerSeedStep(packet: String, stepFile: String, seedTable: String,
      view: String, rootKey: String, partCol: String,
      partType: String): Unit =
    ScalaSteps.register(packet, stepFile) { ctx =>
      val spark = ctx.spark
      val root = ctx.placeholders.getOrElse(rootKey,
        sys.error(s"$packet/$stepFile: missing placeholder $rootKey"))
      if (spark.catalog.tableExists(seedTable)) {
        seed(spark, root, spark.table(seedTable), partCol)
        spark.sql(s"DROP TABLE IF EXISTS `$seedTable`")
        ctx.notice("info",
          s"seeded partitioned manifest $view -> $root ($partCol)")
      }
      refreshView(spark, root, view, partCol, partType)
    }

  /** Publish step: for each delta-touched partition (bounded: the
    * delta's partition footprint), publish its staged table as the
    * partition's next version, then rebuild the view once. */
  def registerPublishStep(packet: String, stepFile: String,
      deltaTable: String, stagePrefix: String, view: String,
      rootKey: String, partCol: String, partType: String): Unit =
    ScalaSteps.register(packet, stepFile) { ctx =>
      val spark = ctx.spark
      val root = ctx.placeholders.getOrElse(rootKey,
        sys.error(s"$packet/$stepFile: missing placeholder $rootKey"))
      val touched = spark.table(deltaTable)
        .select(col(partCol).cast("string")).distinct()
        .collect().map(_.getString(0)).sorted
      touched.foreach { v =>
        val dir = publishPartition(spark, root, partCol, v,
          spark.table(s"$stagePrefix$v"))
        ctx.notice("info", s"published $view $partCol=$v -> $dir")
      }
      refreshView(spark, root, view, partCol, partType)
    }
}
