package graft.sql

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

import graft.engine.{ManifestTable, SpecManifest}

/** VERSIONED TABLE SCHEMAS for the SQL surface of the graft table
  * format — the metadata half of `ALTER TABLE` (the Iceberg posture:
  * schema evolution is a metadata operation; data files are never
  * rewritten):
  *
  * {{{
  *   root/_schema.json              the CREATE TABLE schema (version 1)
  *   root/_schemas/schema-00002     #from_gen=G header + schema json
  * }}}
  *
  * Every evolution appends a version stamped with the snapshot
  * GENERATION it takes effect from (`from_gen` = one past the current
  * snapshot's generation at alter time), so:
  *
  *   - LIVE reads always serve the latest schema;
  *   - TIME-TRAVEL reads (`VERSION/TIMESTAMP AS OF`) serve the schema
  *     that was current when the pinned snapshot committed — an added
  *     column does not exist in the past, a dropped one still does
  *     (the w15 contract, carried to the composite-spec SQL tables);
  *   - rollback does NOT revert schema (it commits a new, later
  *     generation — Iceberg's behavior).
  *
  * The READ side needs no backfill: the content-pinned relations
  * declare the catalog schema over the physical files, and the Spark 4
  * parquet reader fills missing columns with NULL and widens
  * int8/16/32→int64, int32→float64, float32→float64 natively
  * (SPARK-40876), so ADD COLUMN / DROP COLUMN / type widening are all
  * O(metadata) at any table size.
  *
  * Reference: packets/test_int4_to_int8/01_step.sql:9 (ADD COLUMN
  * bigint) through 06_step.sql (key swap) — the reference's flagship
  * packet is exactly this migration driven by SQL DDL.
  */
object GraftSchemas {

  private val Dir = "_schemas"

  /** Field-metadata key carrying a RENAMED column's PHYSICAL name (the
    * column name inside the parquet files, i.e. the name at creation
    * time). Absent = logical name IS the physical name. RENAME COLUMN
    * is thereby metadata-only, like every other ALTER: readers declare
    * physical names over the files and alias out; writers rename
    * logical frames to physical before landing bytes. */
  val PhysKey = "graft.physical"

  def physicalName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey)
    else f.name

  /** The schema as the FILES spell it: logical names replaced by their
    * physical names (metadata dropped — physical is self-referential). */
  def physicalSchema(s: StructType): StructType =
    StructType(s.map(f => org.apache.spark.sql.types.StructField(
      physicalName(f), f.dataType, f.nullable)))

  /** True when any field's logical name differs from its physical. */
  def hasRenames(s: StructType): Boolean =
    s.exists(f => physicalName(f) != f.name)

  private def fsOf(spark: SparkSession, root: String) =
    new HPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readText(spark: SparkSession, p: HPath): String = {
    val in = fsOf(spark, p.toString).open(p)
    try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
  }

  /** A snapshot's generation number (`s000123-uuid` → 123). */
  def genOf(snap: String): Int =
    snap.drop(1).takeWhile(_.isDigit).toInt

  /** Whether `root` carries catalog-managed schemas at all (only SQL
    * catalog tables write `_schema.json`; plain Scala-API manifest
    * roots have no schema files and never declare pin schemas). */
  def hasVersions(spark: SparkSession, root: String): Boolean =
    fsOf(spark, root).exists(new HPath(root, "_schema.json"))

  /** All schema versions, oldest first, each with the snapshot
    * generation it takes effect from (the seed schema is effective
    * from generation 0, i.e. always). */
  def versions(spark: SparkSession, root: String)
      : Seq[(Int, StructType)] = {
    val fs = fsOf(spark, root)
    val seed = DataType.fromJson(
      readText(spark, new HPath(root, "_schema.json")))
      .asInstanceOf[StructType]
    val dir = new HPath(root, Dir)
    val later =
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith("schema-")).sorted.toSeq.map { n =>
          val text = readText(spark, new HPath(dir, n))
          val lines = text.linesIterator.toSeq
          val g = lines.head.stripPrefix("#from_gen=").trim.toInt
          (g, DataType.fromJson(lines.tail.mkString("\n"))
            .asInstanceOf[StructType])
        }
    (0, seed) +: later
  }

  /** The CURRENT schema (live reads and writes). */
  def current(spark: SparkSession, root: String): StructType =
    versions(spark, root).last._2

  /** The schema in effect when `snap` committed: the NEWEST version
    * whose from_gen is at or before the snapshot's generation. */
  def forSnapshot(spark: SparkSession, root: String,
      snap: String): StructType = {
    val g = genOf(snap)
    versions(spark, root).filter(_._1 <= g).last._2
  }

  /** Append a schema version effective from the NEXT snapshot
    * generation (live reads switch immediately; already-committed
    * snapshots keep serving their own schema). Returns the version
    * number.
    *
    * `expectedVersions` is the optimistic-concurrency guard (the
    * expectedBase posture of DML commits): the caller states how many
    * schema versions its computed evolution was based on; when a
    * racing ALTER appended one in between, this throws instead of
    * silently discarding the racer's change. */
  def evolve(spark: SparkSession, root: String, newSchema: StructType,
      expectedVersions: Option[Int] = None): Int =
    ManifestTable.withPublishLock(root) {
      val fromGen = SpecManifest.snapshots(spark, root).lastOption
        .map(genOf).getOrElse(0) + 1
      val n = versions(spark, root).length + 1
      expectedVersions.foreach(exp => require(n == exp + 1,
        s"GraftSchemas: concurrent ALTER TABLE detected on $root " +
          s"(schema version moved ${exp} -> ${n - 1} while this " +
          "ALTER was computing) - re-run the statement"))
      ManifestTable.writeOnce(root, f"$Dir/schema-$n%05d",
        s"#from_gen=$fromGen\n" + newSchema.json + "\n")
      n
    }
}
