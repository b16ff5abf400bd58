package graft.engine

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MULTI-COLUMN / HIDDEN partitioning on the manifest pointer model —
  * the Iceberg partition-SPEC contract: a 100 TB table usually keys on
  * (time-bucketed ingest column, hash bucket of the join key), e.g.
  * `(year(o_orderdate), bucket(4, o_custkey))`, and the WRITER derives
  * the partition values from source columns (readers never supply
  * them; a helper turns source predicates into partition filters —
  * hidden partitioning).
  *
  * Layout: one [[ManifestTable]] pointer per LEAF —
  *
  * {{{
  *   root/_spec                    (the serialized partition spec)
  *   root/y=1994/b=2/MANIFEST      -> names root/y=1994/b=2/v000001-x/
  *   root/_snapshots/s000001-x     lines: `y=1994/b=2<TAB>v000001-x`
  * }}}
  *
  * so every single-partition-column guarantee carries over unchanged:
  * a leaf flips old→new in one pointer swap, a multi-leaf delta
  * becomes visible in ONE root snapshot rename, old snapshots stay
  * readable (time travel), and CDC diffs only the leaves whose version
  * directory moved. Reads serve through a content-pinned catalog
  * relation with BOTH partition columns — one plan node, real
  * PartitionFilters pruning on each level (plan-asserted in w22).
  *
  * Scope: seed / snapshot-commit / merge-on-read commit / read /
  * readLeaf / time-travel (by snapshot and by timestamp) / CDC /
  * hidden-pruning (helper and transparent rule) / spec EVOLUTION /
  * optimistic leaf fold-down / zone-map analyze / tags / rollback /
  * age-based expiry / orphan cleanup, plus the graft-spec-table sink
  * and the graft-cdc `spec` source option — full parity with the
  * single-column [[PartitionedManifest]] surface.
  */
object SpecManifest {

  /** Partition transforms (the Iceberg set, minus the ones the corpus
    * does not exercise). All derived values render as STRINGS — they
    * live in directory names. */
  sealed trait Transform { def render: String }
  case object Identity extends Transform { val render = "identity" }
  /** Murmur3-hash bucket (Spark's `hash`, seed 42 — stable across a
    * Spark major; a cross-engine reader re-derives through Spark). */
  final case class Bucket(n: Int) extends Transform {
    require(n > 0); val render = s"bucket[$n]"
  }
  /** Numeric width-truncate: v - (v mod w). */
  final case class Truncate(w: Long) extends Transform {
    require(w > 0); val render = s"truncate[$w]"
  }
  case object Day extends Transform { val render = "day" }
  case object Month extends Transform { val render = "month" }
  case object Year extends Transform { val render = "year" }

  object Transform {
    def parse(s: String): Transform = s match {
      case "identity" => Identity
      case "day" => Day
      case "month" => Month
      case "year" => Year
      case b if b.startsWith("bucket[") =>
        Bucket(b.stripPrefix("bucket[").stripSuffix("]").toInt)
      case t if t.startsWith("truncate[") =>
        Truncate(t.stripPrefix("truncate[").stripSuffix("]").toLong)
      case other => sys.error(s"SpecManifest: unknown transform $other")
    }
  }

  /** One spec field: partition column `name` derived from source
    * column `source` via `transform`. */
  final case class PartField(name: String, source: String,
      transform: Transform) {
    def derive(c: Column): Column = transform match {
      case Identity => c.cast("string")
      case Bucket(n) => pmod(hash(c), lit(n)).cast("string")
      case Truncate(w) => (c - pmod(c, lit(w))).cast("long").cast("string")
      case Day => date_format(c, "yyyy-MM-dd")
      case Month => date_format(c, "yyyy-MM")
      case Year => date_format(c, "yyyy")
    }
    def derived: Column = derive(col(source)).as(name)
  }

  final case class PartitionSpec(fields: Seq[PartField]) {
    require(fields.nonEmpty && fields.map(_.name).distinct.size ==
      fields.size, "SpecManifest: spec fields must be uniquely named")
    def names: Seq[String] = fields.map(_.name)
    def render: String = fields.map(f =>
      s"${f.name}\t${f.source}\t${f.transform.render}").mkString("\n")
    /** One-line render safe for a table-property value (identifier
      * charset + `[]:;` only). */
    def renderCompact: String = fields.map(f =>
      s"${f.name}:${f.source}:${f.transform.render}").mkString(";")
  }

  object PartitionSpec {
    def parse(s: String): PartitionSpec = PartitionSpec(
      s.linesIterator.filter(_.nonEmpty).map { l =>
        val Array(n, src, t) = l.split("\t", 3)
        PartField(n, src, Transform.parse(t))
      }.toSeq)
  }

  /** Inverse of [[PartitionSpec.renderCompact]]. */
  def parseCompact(s: String): PartitionSpec = PartitionSpec(
    s.split(";").toSeq.filter(_.nonEmpty).map { f =>
      val Array(n, src, t) = f.split(":", 3)
      PartField(n, src, Transform.parse(t))
    })

  private val SnapDir = "_snapshots"
  private val SpecFile = "_spec"
  private val SpecsDir = "_specs"

  private def fsOf(spark: SparkSession, root: String) =
    new HPath(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def checkValue(v: String): String = {
    require(v.nonEmpty && v.length <= 255 && v.forall(c =>
      c > ' ' && c <= '~' && c != '\'' && c != '"' && c != '\\' &&
        c != '/' && c != '`'),
      s"SpecManifest: unsupported partition value '$v'")
    v
  }

  /** `y=1994/b=2` — the snapshot-file key AND the leaf's relative
    * path. */
  private def leafPath(spec: PartitionSpec, values: Seq[String]): String = {
    require(values.length == spec.fields.length,
      s"SpecManifest: expected ${spec.fields.length} values, got $values")
    spec.fields.zip(values).map { case (f, v) =>
      s"${f.name}=${checkValue(v)}" }.mkString("/")
  }

  /** The stored spec (readers' authority — a caller-supplied spec must
    * match it, or two writers could disagree on the table's shape). */
  def readSpec(spark: SparkSession, root: String): PartitionSpec = {
    val fs = fsOf(spark, root)
    val in = fs.open(new HPath(root, SpecFile))
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    PartitionSpec.parse(text)
  }

  /** All spec versions, oldest first — v1 is the seed-time `_spec`;
    * [[evolveSpec]] appends under `_specs/`. */
  def specVersions(spark: SparkSession, root: String): Seq[PartitionSpec] = {
    val fs = fsOf(spark, root)
    val dir = new HPath(root, SpecsDir)
    val later =
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith("spec-")).sorted.toSeq.map { n =>
          val in = fs.open(new HPath(dir, n))
          val text = try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8) finally in.close()
          PartitionSpec.parse(text)
        }
    readSpec(spark, root) +: later
  }

  /** PARTITION SPEC EVOLUTION (the Iceberg contract): change how NEW
    * data partitions — e.g. bucket(4) → bucket(8) as the table grows —
    * WITHOUT rewriting a byte of what exists. Old leaves keep their
    * old layout (and stay mergeable/compactable under their own spec);
    * commits of NEW leaves use the evolved spec; [[read]] serves the
    * union with the current spec's fields re-DERIVED from source
    * columns, and the transparent hidden-partition rule prunes each
    * layout generation through its own spec.
    *
    * Name discipline: a field NAME never changes meaning across
    * versions — a field whose (source, transform) differs from any
    * prior same-named field must take a FRESH name (Iceberg's
    * spec-field identity rule; leaf directory names stay unambiguous
    * forever). Returns the new spec's version number. */
  def evolveSpec(spark: SparkSession, root: String,
      newSpec: PartitionSpec): Int = ManifestTable.withPublishLock(root) {
    val versions = specVersions(spark, root)
    require(newSpec != versions.last,
      "SpecManifest: the new spec is already current")
    val priorMeaning: Map[String, (String, String)] =
      versions.flatMap(_.fields)
        .map(f => f.name -> (f.source, f.transform.render)).toMap
    newSpec.fields.foreach { f =>
      priorMeaning.get(f.name).foreach { case (src, tr) =>
        require(src == f.source && tr == f.transform.render,
          s"SpecManifest: field '${f.name}' already means $src/$tr - " +
            "a changed source or transform needs a FRESH field name")
      }
    }
    val gen = versions.length + 1
    ManifestTable.writeOnce(root, f"$SpecsDir/spec-$gen%05d",
      newSpec.render + "\n")
    gen
  }

  /** The spec version a leaf was written under, recovered from its
    * path's field names (unambiguous by [[evolveSpec]]'s name rule;
    * newest match wins for identical name sequences). */
  private def specForLeaf(versions: Seq[PartitionSpec],
      leafKey: String): PartitionSpec = {
    val names = leafKey.split("/").toSeq.map(_.split("=", 2)(0))
    versions.reverse.find(_.names == names).getOrElse(sys.error(
      s"SpecManifest: no spec version matches leaf $leafKey " +
        s"(names $names)"))
  }

  private def checkSpec(spark: SparkSession, root: String,
      spec: PartitionSpec): Unit = {
    val versions = specVersions(spark, root)
    require(versions.contains(spec),
      s"SpecManifest: spec mismatch under $root - stored " +
        s"[${versions.map(_.render.replace("\n", "; ")).mkString(" | ")}]" +
        s", got [${spec.render.replace("\n", "; ")}]")
  }

  /** All leaf keys present on disk (depth = spec arity; partition-count
    * bounded metadata listing). */
  def leafKeys(spark: SparkSession, root: String,
      spec: PartitionSpec): Seq[Seq[String]] = {
    val fs = fsOf(spark, root)
    def walk(dir: HPath, depth: Int): Seq[(HPath, Seq[String])] = {
      val want = s"${spec.fields(depth).name}="
      fs.listStatus(dir)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(want))
        .toSeq.flatMap { s =>
          val v = s.getPath.getName.stripPrefix(want)
          if (depth == spec.fields.length - 1) Seq((s.getPath, Seq(v)))
          else walk(s.getPath, depth + 1).map { case (p, vs) =>
            (p, v +: vs) }
        }
    }
    walk(new HPath(root), 0).map(_._2).sortBy(_.mkString("/"))
  }

  /** Leaf keys across EVERY spec generation, each with its OWNING spec
    * — an evolved table keeps its old-generation leaves on disk, so
    * maintenance passes (orphan sweeps, rollback guards, ANALYZE) must
    * enumerate them all, not just the current spec's ([[leafKeys]]
    * matches directory names by ONE spec's field names and would skip
    * old layouts entirely). Distinct leaves by construction:
    * [[evolveSpec]]'s field-identity rule keeps every generation's
    * directory names unambiguous. */
  def allLeaves(spark: SparkSession, root: String)
      : Seq[(PartitionSpec, Seq[String])] =
    specVersions(spark, root).flatMap { sp =>
      leafKeys(spark, root, sp).map(vs => (sp, vs))
    }

  /** SEED: derive the partition columns, write the whole frame
    * hive-partitioned by ALL spec fields in ONE rebalanced job, adopt
    * each leaf directory as version 1 of its own pointer root (renames,
    * zero bytes rewritten), store the spec, and commit snapshot 1. */
  def seed(spark: SparkSession, root: String, df: DataFrame,
      spec: PartitionSpec): String = {
    val scratch = s"$root/.seed-${java.util.UUID.randomUUID.toString.take(8)}"
    val tagged = spec.fields.foldLeft(df)((d, f) =>
      d.withColumn(f.name, f.derived))
    tagged.hint("rebalance", spec.names.map(col): _*)
      .write.mode("error").partitionBy(spec.names: _*).parquet(scratch)
    val fs = fsOf(spark, root)
    // adopt every scratch leaf in place
    def leaves(dir: HPath, depth: Int): Seq[(HPath, Seq[String])] = {
      val want = s"${spec.fields(depth).name}="
      fs.listStatus(dir)
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(want))
        .toSeq.flatMap { s =>
          val v = s.getPath.getName.stripPrefix(want)
          if (depth == spec.fields.length - 1) Seq((s.getPath, Seq(v)))
          else leaves(s.getPath, depth + 1).map { case (p, vs) =>
            (p, v +: vs) }
        }
    }
    val found = leaves(new HPath(scratch), 0)
    require(found.nonEmpty, "SpecManifest: seed produced no partitions")
    found.foreach { case (src, values) =>
      ManifestTable.adoptVersion(s"$root/${leafPath(spec, values)}",
        src.toString)
    }
    fs.delete(new HPath(scratch), true)
    ManifestTable.writeOnce(root, SpecFile, spec.render + "\n")
    commitSnapshot(spark, root, spec, Map.empty)
  }

  def currentSnapshot(spark: SparkSession, root: String): Option[String] = {
    val fs = fsOf(spark, root)
    val p = new HPath(root, "MANIFEST")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  def snapshots(spark: SparkSession, root: String): Seq[String] = {
    val fs = fsOf(spark, root)
    val dir = new HPath(root, SnapDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(_.startsWith("s")).sorted.toSeq
  }

  /** Snapshot content: leaf key (relative path) → version dir name. */
  def snapshotMapping(spark: SparkSession, root: String,
      snap: String): Seq[(String, String)] = {
    val fs = fsOf(spark, root)
    val in = fs.open(new HPath(s"$root/$SnapDir/$snap"))
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    text.linesIterator.filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l => val Array(k, d) = l.split("\t", 2); (k, d) }.toSeq
  }

  /** Commit a snapshot over leaf-keyed updates (values = the leaf's
    * full replacement rows WITHOUT the partition columns): one
    * hive-partitioned scratch write for the whole delta, per-leaf
    * pointer adoption with kept-snapshot GC protection, one atomic
    * root snapshot swap — [[PartitionedManifest.commitSnapshot]]
    * generalized to composite keys. */
  /** Thrown when a [[commitSnapshot]] conflict guard trips: another
    * committer landed between the caller's read and its commit, so the
    * caller's replacement frames were computed from a stale base —
    * re-read and retry (the Iceberg/Delta optimistic-concurrency
    * posture; copy-on-write writers MUST use the guard or a racing
    * commit's rows silently vanish under theirs). */
  final class ConcurrentCommitException(msg: String)
    extends RuntimeException(msg)

  def commitSnapshot(spark: SparkSession, root: String,
      spec: PartitionSpec, updates: Map[Seq[String], DataFrame],
      keepSnapshots: Int = 2,
      expectedBase: Option[Option[String]] = None): String = {
    // Map-of-frames spelling delegates to the one-pass tagged core:
    // each leaf's frame gets its leaf values attached as literal
    // string columns, and the union is staged in ONE partitionBy job
    val tagged: Option[DataFrame] = updates.headOption.map { h =>
      val dataCols = h._2.columns.toSeq.filterNot(spec.names.contains)
      updates.map { case (vs, df) =>
        val d = spec.names.foldLeft(df)((x, n) =>
          if (x.columns.contains(n)) x.drop(n) else x)
        spec.fields.zip(vs).foldLeft(d.select(dataCols.map(col): _*)) {
          case (x, (f, v)) => x.withColumn(f.name, lit(v))
        }
      }.reduce(_.unionByName(_))
    }
    commitSnapshotTagged(spark, root, spec, tagged,
      updates.keys.toSeq, keepSnapshots, expectedBase)
  }

  /** One-pass variant of [[commitSnapshot]] for callers whose
    * replacement rows all come from ONE frame: `data` carries the leaf
    * data columns PLUS the spec partition columns (string-typed, as
    * [[PartField.derive]] renders them — derived for rows routed by
    * value, literal for rows pinned to a physical leaf), and `touched`
    * lists every leaf this commit replaces. The per-leaf-Map spelling
    * evaluates each leaf's frame as its own union arm, so L leaves
    * re-scan a shared source L times (O(L·N) — the w29 INSERT profile:
    * 28 arms × a 15 MB checkpoint = 420 MB read, 35 s of CPU for one
    * staging write); here the source is scanned ONCE and the
    * partitionBy write routes rows to their leaf dirs (guide §1.2,
    * §2.4). A touched leaf with no rows in `data` publishes an empty
    * version, exactly as an empty per-leaf frame did. */
  def commitSnapshotTagged(spark: SparkSession, root: String,
      spec: PartitionSpec, data: Option[DataFrame],
      touched: Seq[Seq[String]],
      keepSnapshots: Int = 2,
      expectedBase: Option[Option[String]] = None): String = {
    require(keepSnapshots >= 2, "keepSnapshots must be >= 2")
    ManifestTable.withPublishLock(root) {
      // CONFLICT GUARD, first thing under the lock: the caller states
      // which snapshot its replacement frames were computed from
      expectedBase.foreach { expected =>
        val cur = currentSnapshot(spark, root)
        if (cur != expected)
          throw new ConcurrentCommitException(
            s"SpecManifest: a concurrent commit moved $root from " +
              s"$expected to $cur - recompute against the new base " +
              "and retry")
      }
      val fs = fsOf(spark, root)
      // create-table-on-first-commit: a fresh root adopts the writer's
      // spec as v1 (the streaming sink's bootstrap path); an existing
      // root validates the spec against the stored versions as always
      if (!fs.exists(new HPath(root, SpecFile)))
        ManifestTable.writeOnce(root, SpecFile, spec.render + "\n")
      checkSpec(spark, root, spec)
      val base: Map[String, String] = currentSnapshot(spark, root) match {
        case Some(s) => snapshotMapping(spark, root, s).toMap
        case None =>
          leafKeys(spark, root, spec).map { vs =>
            val lp = leafPath(spec, vs)
            lp -> new HPath(ManifestTable.currentDataDir(s"$root/$lp")
              .getOrElse(sys.error(s"no MANIFEST under $root/$lp")))
              .getName
          }.toMap
      }
      // spec evolution: creating a NEW leaf is reserved to the CURRENT
      // spec (old layouts stay mergeable but never grow new leaves)
      val versions = specVersions(spark, root)
      if (spec != versions.last) {
        val fresh = touched.map(vs => leafPath(spec, vs))
          .filterNot(lp => base.contains(lp) ||
            ManifestTable.currentVersion(s"$root/$lp").isDefined)
        require(fresh.isEmpty,
          s"SpecManifest: new leaves (${fresh.mkString(",")}) must use " +
            "the CURRENT spec version")
      }
      // kept snapshots' dirs per leaf — the per-leaf GC protection
      val protectByLeaf: Map[String, Set[String]] =
        protectedDirsByLeaf(spark, root, keepSnapshots)
      val written: Map[String, String] =
        if (data.isEmpty || touched.isEmpty) Map.empty
        else {
          val df = data.get
          val dataCols = df.columns.toSeq
            .filterNot(spec.names.contains)
          val scratch =
            s"$root/.commit-${java.util.UUID.randomUUID.toString.take(8)}"
          df.select((dataCols ++ spec.names).map(col): _*)
            .hint("rebalance", spec.names.map(col): _*)
            .write.mode("error").partitionBy(spec.names: _*)
            .parquet(scratch)
          // per-leaf pointer adoption is independent fs work —
          // overlap it (guide §2.6)
          try Par.map(touched.sortBy(_.mkString("/"))) { vs =>
            val lp = leafPath(spec, vs)
            val src = new HPath(s"$scratch/$lp")
            // chain expansion: a protected MOR layer keeps its bases
            val protect = PartitionedManifest.expandMorProtect(spark,
              s"$root/$lp", protectByLeaf.getOrElse(lp, Set.empty))
            val dir =
              if (fs.exists(src))
                ManifestTable.adoptVersion(s"$root/$lp", src.toString,
                  protect)
              else // all-empty leaf update: publish its empty version
                ManifestTable.publish(spark, s"$root/$lp",
                  df.select(dataCols.map(col): _*).limit(0),
                  protect)
            lp -> new HPath(dir).getName
          }.toMap
          finally fs.delete(new HPath(scratch), true)
        }
      writeSnapshotLocked(spark, root, (base ++ written).toSeq.sortBy(_._1),
        keepSnapshots)
    }
  }

  /** Version dirs the kept snapshots (+ tags + branch heads + current)
    * reference, per leaf — the GC protection base every commit path
    * shares (callers expand through MOR chains at the leaf root).
    * Branch heads matter doubly: their STAGED dirs have no live
    * pointer protecting them. */
  private def protectedDirsByLeaf(spark: SparkSession, root: String,
      keepSnapshots: Int): Map[String, Set[String]] =
    (currentSnapshot(spark, root).toSeq ++
      tags(spark, root).values ++
      branches(spark, root).values.map(_._1) ++
      snapshots(spark, root).takeRight(keepSnapshots)).distinct
      .flatMap(sn => snapshotMapping(spark, root, sn))
      .groupBy(_._1).map { case (k, ds) => k -> ds.map(_._2).toSet }

  /** Write + atomically publish a snapshot file carrying `mapping`,
    * then trim past the keep-N horizon. Caller holds the root publish
    * lock. Shared tail of [[commitSnapshot]], [[commitMerge]],
    * [[compactLeaves]], [[rollback]] and (with `advanceRoot=false`)
    * [[commitSnapshotToBranch]]. */
  private def writeSnapshotLocked(spark: SparkSession, root: String,
      mapping: Seq[(String, String)], keepSnapshots: Int,
      advanceRoot: Boolean = true,
      operation: String = "commit"): String = {
    require(mapping.nonEmpty, "SpecManifest: nothing to commit")
    val fs = fsOf(spark, root)
    fs.mkdirs(new HPath(root, SnapDir))
    val gen = snapshots(spark, root).lastOption
      .map(_.drop(1).takeWhile(_.isDigit).toInt).getOrElse(0) + 1
    val snap = f"s$gen%06d-${java.util.UUID.randomUUID.toString.take(8)}"
    // operation + parent headers feed the snapshots/history inspection
    // tables (see [[PartitionedManifest.snapshotsMetadata]])
    val parent = currentSnapshot(spark, root)
    val body = s"#committed_ms=${System.currentTimeMillis()}\n" +
      s"#operation=$operation\n" +
      parent.map(p => s"#parent=$p\n").getOrElse("") +
      mapping.map { case (k, d) => s"$k\t$d" }.mkString("\n") + "\n"
    ManifestTable.writeOnce(root, s"$SnapDir/$snap", body)
    // a BRANCH commit advances only its branch pointer, never the root
    if (advanceRoot) ManifestTable.swapRootPointer(root, snap, operation)
    // TAGGED snapshots and BRANCH HEADS survive the keep-N trim; so
    // does main's CURRENT snapshot (branch commits interleave in the
    // shared generation order, so takeRight(N) alone could slide past
    // the root pointer's own commit)
    val keep = snapshots(spark, root).takeRight(keepSnapshots).toSet +
      snap ++ tags(spark, root).values ++
      branches(spark, root).values.map(_._1) ++
      currentSnapshot(spark, root)
    snapshots(spark, root).filterNot(keep).foreach(s =>
      fs.delete(new HPath(root, s"$SnapDir/$s"), false))
    snap
  }

  private val RefsDir = "_refs"

  private def checkRefName(name: String): String = {
    require(name.nonEmpty && name.length <= 128 && name.forall(c =>
      c.isLetterOrDigit || c == '.' || c == '_' || c == '-'),
      s"SpecManifest: unsupported ref name '$name' - letters, digits, " +
        "dot, underscore, dash only (ref names are file names)")
    name
  }

  /** Tag a committed snapshot with an IMMUTABLE name (defaults to the
    * current snapshot) — pins it outside the keep-N horizon exactly
    * like [[PartitionedManifest.tagSnapshot]]: create-once ref
    * (conditional PUT on object stores — racing taggers of one name
    * cannot both win), honored by snapshot trims and per-leaf GC
    * protection. Returns the tagged snapshot id. */
  def tagSnapshot(spark: SparkSession, root: String, name: String,
      snapshot: Option[String] = None): String = {
    checkRefName(name)
    ManifestTable.withPublishLock(root) {
      val snap = snapshot.orElse(currentSnapshot(spark, root)).getOrElse(
        sys.error(s"SpecManifest: no snapshot committed under $root"))
      require(snapshots(spark, root).contains(snap),
        s"SpecManifest: cannot tag unknown/expired snapshot $snap")
      ManifestTable.writeOnce(root, s"$RefsDir/$name", snap + "\n")
      snap
    }
  }

  /** All named refs: tag name → snapshot id. */
  def tags(spark: SparkSession, root: String): Map[String, String] = {
    val fs = fsOf(spark, root)
    val dir = new HPath(root, RefsDir)
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir).filter(s => s.isFile &&
        !s.getPath.getName.startsWith(".")).map { s =>
      val in = fs.open(s.getPath)
      val snap = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim finally in.close()
      s.getPath.getName -> snap
    }.toMap
  }

  /** Drop a tag. The snapshot it pinned re-enters the keep-N horizon
    * at the NEXT commit (trims are commit-time activities). */
  def dropTag(spark: SparkSession, root: String, name: String): Unit =
    fsOf(spark, root).delete(
      new HPath(root, s"$RefsDir/${checkRefName(name)}"), false)

  /** Resolve a ref: a tag name, a branch name (its head), a literal
    * snapshot id, or None for the current snapshot. */
  def resolveRef(spark: SparkSession, root: String,
      ref: Option[String]): Option[String] = ref match {
    case None => currentSnapshot(spark, root)
    case Some(r) => tags(spark, root).get(r)
      .orElse(branches(spark, root).get(r).map(_._1))
      .orElse(Some(r))
  }

  // ---------------------------------------------------------------------
  // BRANCHES + WRITE-AUDIT-PUBLISH on the composite layout — the same
  // contract as [[PartitionedManifest]]'s: branch commits STAGE leaf
  // version dirs (leaf pointers never move — live readers cannot see
  // the batch), auditors read the branch head like any snapshot, and a
  // validated head FAST-FORWARDS into main in one metadata operation.
  // Branch files are mutable `head<TAB>forkBase` pointers under
  // _branches/, updated atomically under the root publish lock.

  private val BranchesDir = "_branches"

  /** All branches: name → (head snapshot, fork-base snapshot). */
  def branches(spark: SparkSession, root: String)
      : Map[String, (String, String)] = {
    val fs = fsOf(spark, root)
    val dir = new HPath(root, BranchesDir)
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir).filter(s => s.isFile &&
        !s.getPath.getName.startsWith(".")).map { s =>
      val in = fs.open(s.getPath)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim finally in.close()
      val Array(head, base) = text.split("\t", 2)
      s.getPath.getName -> (head, base)
    }.toMap
  }

  /** Create a branch at a kept snapshot (default: current). */
  def createBranch(spark: SparkSession, root: String, name: String,
      from: Option[String] = None): String = {
    checkRefName(name)
    ManifestTable.withPublishLock(root) {
      val snap = from.flatMap(r => resolveRef(spark, root, Some(r)))
        .orElse(currentSnapshot(spark, root)).getOrElse(sys.error(
          s"SpecManifest: no snapshot committed under $root"))
      require(snapshots(spark, root).contains(snap),
        s"SpecManifest: cannot branch from unknown/expired snapshot $snap")
      require(!branches(spark, root).contains(name),
        s"SpecManifest: branch '$name' already exists")
      ManifestTable.swapRefPointer(root, s"$BranchesDir/$name",
        s"$snap\t$snap\n")
      snap
    }
  }

  /** Drop a branch. Its head re-enters the keep-N horizon at the next
    * commit (nothing is deleted here). */
  def dropBranch(spark: SparkSession, root: String, name: String): Unit =
    ManifestTable.withPublishLock(root) {
      fsOf(spark, root).delete(
        new HPath(root, s"$BranchesDir/${checkRefName(name)}"), false)
    }

  /** Commit to a BRANCH: leaf version dirs are STAGED (leaf pointers
    * never move — live readers cannot see branch data), the snapshot
    * file lands in the shared history, and only the branch pointer
    * advances. Branch commits may touch EXISTING leaves only. */
  def commitSnapshotToBranch(spark: SparkSession, root: String,
      spec: PartitionSpec, updates: Map[Seq[String], DataFrame],
      branch: String, keepSnapshots: Int = 2): String = {
    require(keepSnapshots >= 2, "keepSnapshots must be >= 2")
    require(updates.nonEmpty, "branch commit needs updates")
    checkSpec(spark, root, spec)
    ManifestTable.withPublishLock(root) {
      val (head, base) = branches(spark, root).getOrElse(branch,
        sys.error(s"SpecManifest: no branch '$branch'"))
      val baseMapping = snapshotMapping(spark, root, head).toMap
      val touchedPaths = updates.keys.toSeq.sortBy(_.mkString("/"))
        .map(vs => vs -> leafPath(spec, vs))
      val unknown = touchedPaths.collect {
        case (_, lp) if !baseMapping.contains(lp) => lp }
      require(unknown.isEmpty,
        s"SpecManifest: branch commit may only touch existing leaves " +
          s"(new: ${unknown.mkString(",")}) - create leaves on main first")
      val fs = fsOf(spark, root)
      val scratch =
        s"$root/.branch-${java.util.UUID.randomUUID.toString.take(8)}"
      val dataCols = updates.head._2.columns.toSeq
        .filterNot(spec.names.contains)
      updates.map { case (vs, df) =>
        val d = spec.names.foldLeft(df)((x, n) =>
          if (x.columns.contains(n)) x.drop(n) else x)
        spec.fields.zip(vs).foldLeft(d.select(dataCols.map(col): _*)) {
          case (x, (f, v)) => x.withColumn(f.name, lit(v))
        }
      }.reduce(_.unionByName(_))
        .hint("rebalance", spec.names.map(col): _*)
        .write.mode("error").partitionBy(spec.names: _*).parquet(scratch)
      try {
        val staged: Map[String, String] = touchedPaths.map {
          case (vs, lp) =>
            val src = new HPath(s"$scratch/$lp")
            val dir =
              if (fs.exists(src))
                ManifestTable.stageVersion(s"$root/$lp", src.toString)
              else {
                // an all-empty leaf update still stages its empty version
                val tmp = s"$root/$lp/.stage-" +
                  java.util.UUID.randomUUID.toString.take(8)
                updates(vs).select(dataCols.map(col): _*).limit(0)
                  .write.parquet(tmp)
                ManifestTable.stageVersion(s"$root/$lp", tmp)
              }
            lp -> new HPath(dir).getName
        }.toMap
        val snap = writeSnapshotLocked(spark, root,
          (baseMapping ++ staged).toSeq.sortBy(_._1), keepSnapshots,
          advanceRoot = false, operation = "branch-commit")
        ManifestTable.swapRefPointer(root, s"$BranchesDir/$branch",
          s"$snap\t$base\n")
        snap
      } finally fs.delete(new HPath(scratch), true)
    }
  }

  /** PUBLISH a branch: fast-forward main to the branch head in one
    * metadata operation (repoint the diverged leaves, swap the root
    * pointer — the staged dirs simply become live). Fails loudly if
    * main advanced since the fork (recreate + replay instead). After
    * publishing, the branch is synced (base = head). */
  def fastForward(spark: SparkSession, root: String,
      spec: PartitionSpec, branch: String): String = {
    checkSpec(spark, root, spec)
    ManifestTable.withPublishLock(root) {
      val (head, base) = branches(spark, root).getOrElse(branch,
        sys.error(s"SpecManifest: no branch '$branch'"))
      val cur = currentSnapshot(spark, root).getOrElse(sys.error(
        s"SpecManifest: no snapshot committed under $root"))
      if (head == cur) head
      else {
        require(cur == base,
          s"SpecManifest: main advanced since branch '$branch' forked " +
            s"($base -> $cur) - a fast-forward would drop main's " +
            "commits; recreate the branch from current and replay")
        val fs = fsOf(spark, root)
        snapshotMapping(spark, root, head).foreach { case (lp, d) =>
          val pr = s"$root/$lp"
          if (!ManifestTable.currentVersion(pr).contains(d)) {
            require(fs.exists(new HPath(s"$pr/$d")),
              s"SpecManifest: branch head dir $pr/$d is gone")
            ManifestTable.repointVersion(pr, d)
          }
        }
        ManifestTable.swapRootPointer(root, head, "fast-forward")
        ManifestTable.swapRefPointer(root, s"$BranchesDir/$branch",
          s"$head\t$head\n")
        head
      }
    }
  }

  /** ROLLBACK to a kept snapshot (or tag): METADATA-ONLY — each leaf
    * repoints at the target's (still-present, GC-protected) version
    * dir and the restored mapping lands as a NEW forward commit, so
    * history is append-only and CDC sees the restore as a diff.
    * Leaves created after the target fail the rollback loudly
    * (live-pointer readers would otherwise diverge from snapshot
    * readers). Returns the new snapshot name. */
  def rollback(spark: SparkSession, root: String, spec: PartitionSpec,
      toSnap: String, keepSnapshots: Int = 2): String = {
    require(keepSnapshots >= 2, "keepSnapshots must be >= 2")
    checkSpec(spark, root, spec)
    ManifestTable.withPublishLock(root) {
      val snap = resolveRef(spark, root, Some(toSnap)).get
      val target = snapshotMapping(spark, root, snap).toMap
      require(target.nonEmpty, s"SpecManifest: empty rollback target $snap")
      // guard across EVERY spec generation: an old-generation leaf
      // created between the target and a later evolution would escape a
      // current-spec-only check, restoring a mapping that omits it while
      // its live pointer remains (exactly the live-pointer/snapshot
      // divergence this require() exists to prevent)
      val extra = allLeaves(spark, root)
        .map { case (sp, vs) => leafPath(sp, vs) }
        .filterNot(target.contains)
      require(extra.isEmpty,
        s"SpecManifest: leaves ${extra.mkString(",")} were created " +
          s"after $snap - rollback cannot restore their absence for " +
          "live-pointer readers; remove them first")
      val fs = fsOf(spark, root)
      target.toSeq.sortBy(_._1).foreach { case (lp, d) =>
        val pr = s"$root/$lp"
        if (!ManifestTable.currentVersion(pr).contains(d)) {
          require(fs.exists(new HPath(s"$pr/$d")),
            s"SpecManifest: rollback target dir $pr/$d is gone")
          ManifestTable.repointVersion(pr, d)
        }
      }
      writeSnapshotLocked(spark, root, target.toSeq.sortBy(_._1),
        keepSnapshots, operation = "rollback")
    }
  }

  /** AGE-BASED snapshot expiry —
    * [[PartitionedManifest.expireSnapshots]] on the composite layout:
    * metadata-only, O(#snapshots); newest `keepLast`, tags, and the
    * current pointer always survive; leaf version GC stays lazy.
    * Returns the expired names. */
  def expireSnapshots(spark: SparkSession, root: String,
      olderThanMs: Long, keepLast: Int = 2): Seq[String] = {
    require(keepLast >= 2, "keepLast must be >= 2 (current + previous)")
    ManifestTable.withPublishLock(root) {
      val fs = fsOf(spark, root)
      val all = snapshots(spark, root)
      val protect = all.takeRight(keepLast).toSet ++
        tags(spark, root).values ++
        branches(spark, root).values.map(_._1) ++
        currentSnapshot(spark, root)
      val expired = all.filterNot(protect).filter { sn =>
        committedMsOf(spark, root, sn).exists(_ < olderThanMs)
      }
      expired.foreach(sn =>
        fs.delete(new HPath(root, s"$SnapDir/$sn"), false))
      expired
    }
  }

  /** ORPHAN cleanup — [[PartitionedManifest.cleanOrphans]] on the
    * composite layout: under the root and every LEAF root, delete
    * dot-prefixed scratch dirs (crashed lock-free writers) and version
    * dirs no kept snapshot, MOR chain, or live pointer references,
    * behind the same grace window. Returns the deleted paths. */
  def cleanOrphans(spark: SparkSession, root: String,
      spec: PartitionSpec, graceMs: Long = 24L * 3600 * 1000)
      : Seq[String] = ManifestTable.withPublishLock(root) {
    checkSpec(spark, root, spec)
    val fs = fsOf(spark, root)
    val cutoff = System.currentTimeMillis() - graceMs
    // the sweep set spans EVERY spec generation: on an evolved table,
    // old-generation leaves (e.g. y=…/b=… after evolving to b8) still
    // hold live data and can still strand .mor-*/.fold-* scratch and
    // unreferenced version dirs — a current-spec-only enumeration would
    // leak them forever
    val sweepLeaves = allLeaves(spark, root)
      .map { case (sp, vs) => leafPath(sp, vs) }.distinct
    val referencedByLeaf: Map[String, Set[String]] = {
      val fromSnaps = snapshots(spark, root)
        .flatMap(sn => snapshotMapping(spark, root, sn))
      val fromPointers = sweepLeaves.flatMap { lp =>
        ManifestTable.currentVersion(s"$root/$lp").map(lp -> _)
      }
      (fromSnaps ++ fromPointers).groupBy(_._1).map { case (lp, ds) =>
        lp -> ds.map(_._2).toSet }
    }
    val deleted = scala.collection.mutable.ListBuffer.empty[String]
    fs.listStatus(new HPath(root)).foreach { st =>
      val name = st.getPath.getName
      if (st.isDirectory && name.startsWith(".") &&
          st.getModificationTime < cutoff) {
        fs.delete(st.getPath, true)
        deleted += st.getPath.toString
      }
    }
    sweepLeaves.foreach { lp =>
      val pr = s"$root/$lp"
      val referenced = PartitionedManifest.expandMorProtect(spark, pr,
        referencedByLeaf.getOrElse(lp, Set.empty))
      fs.listStatus(new HPath(pr)).foreach { st =>
        val name = st.getPath.getName
        val stale = st.getModificationTime < cutoff
        if (st.isDirectory && stale &&
            (name.startsWith(".") ||
              (name.startsWith("v") && name.drop(1).headOption
                .exists(_.isDigit) && !referenced.contains(name)))) {
          fs.delete(st.getPath, true)
          deleted += st.getPath.toString
        }
      }
    }
    deleted.sorted.toSeq
  }

  private def hash8(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(8)

  /** Read a snapshot (default: current) through a content-pinned
    * catalog relation carrying ALL spec fields as partition columns —
    * one plan node, PartitionFilters pruning on every level. The pin
    * carries the zone-map property, so file skipping composes below
    * partition pruning here too.
    *
    * Merge-on-read leaves (bounded by [[compactLeaves]] cadence) each
    * resolve their delta chain and union on top of the pinned pure
    * subset — the common all-pure case keeps its ONE plan node. */
  def read(spark: SparkSession, root: String, spec: PartitionSpec,
      snapshot: Option[String] = None,
      dataSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val versions = specVersions(spark, root)
    require(versions.contains(spec) && spec == versions.last,
      s"SpecManifest: read serves the CURRENT spec under $root - " +
        s"current is [${versions.last.render.replace("\n", "; ")}]")
    val snap = snapshot.orElse(currentSnapshot(spark, root)).getOrElse(
      sys.error(s"SpecManifest: no snapshot committed under $root"))
    val mapping = snapshotMapping(spark, root, snap)
    require(mapping.nonEmpty, s"SpecManifest: empty snapshot $snap")
    val (morLs, pureLs) = mapping.partition { case (k, d) =>
      PartitionedManifest.isMorDir(spark, s"$root/$k/$d") }
    // files spell RENAMED columns by their PHYSICAL (creation-time)
    // names: serve physically, alias to the logical names at the end
    val physDecl = dataSchema.map(graft.sql.GraftSchemas.physicalSchema)
    val served = if (versions.size == 1) {
      val pureDf =
        if (pureLs.isEmpty) None
        else Some(servePin(spark, root, spec, pureLs, physDecl))
      // K hot MOR leaves serve through ONE grouped resolution (plan
      // width scales with chain depth, never K) with the spec fields
      // recovered from the leaf directory paths
      val morDf =
        if (morLs.isEmpty) None
        else Some(alignMaybe(PartitionedManifest.resolveMorGrouped(spark,
          morLs.map { case (k, d) => (s"$root/$k", d) }, spec.names,
          None), physDecl, spec.names))
      (pureDf.toSeq ++ morDf.toSeq).reduce(_.unionByName(_))
    } else {
      // EVOLVED table: each layout generation serves through its OWN
      // pin (so the hidden-partition rule prunes each through its own
      // spec); the output shape is data columns + the CURRENT spec's
      // fields. A current field a generation ALSO partitions on keeps
      // its stored partition column (a filter on it still prunes that
      // pin); a field the generation predates is re-DERIVED from its
      // source column (row-level only there — the hidden rule prunes
      // it through the source predicate instead). Partition values
      // are layout, never data, so readers get one stable shape.
      val pins = pureLs
        .groupBy { case (k, _) => specForLeaf(versions, k) }.toSeq
        .sortBy(_._1.names.mkString("/"))
        .map { case (sp, ls) =>
          val df = servePin(spark, root, sp, ls, physDecl)
          val missing = spec.fields.filterNot(sp.fields.contains)
          val dropNames = sp.names
            .filterNot(n => spec.fields.exists(f =>
              f.name == n && sp.fields.contains(f)))
          missing.foldLeft(df.drop(dropNames: _*))((d, f) =>
            d.withColumn(f.name, f.derived))
        }
      // MOR leaves group per GENERATION (one grouped resolution per
      // spec version with chains, arms = generations × depth); the
      // stored partition fields drop and the CURRENT spec's fields
      // re-derive from source columns, like the pure pins above
      val mors = morLs
        .groupBy { case (k, _) => specForLeaf(versions, k) }.toSeq
        .sortBy(_._1.names.mkString("/"))
        .map { case (sp, ls) =>
          val df = alignMaybe(PartitionedManifest.resolveMorGrouped(spark,
            ls.map { case (k, d) => (s"$root/$k", d) }, sp.names, None)
            .drop(sp.names: _*), physDecl, Seq.empty)
          spec.fields.foldLeft(df)((x, f) =>
            x.withColumn(f.name, f.derived))
        }
      (pins ++ mors).reduce(_.unionByName(_))
    }
    dataSchema match {
      case Some(ds) if graft.sql.GraftSchemas.hasRenames(ds) =>
        served.select(ds.map(f =>
          col(graft.sql.GraftSchemas.physicalName(f)).as(f.name)) ++
          spec.names.map(col): _*)
      case _ => served
    }
  }

  /** Align a frame to a DECLARED data schema when one is given (the
    * SQL catalog's evolved-schema reads): missing columns serve as
    * typed NULLs, physically narrower columns widen — the row-level
    * twin of the declared-schema parquet pin, for the MOR-resolved
    * subsets that don't serve through a pin. `keep` columns (partition
    * fields) pass through untouched. */
  private def alignMaybe(df: DataFrame,
      declared: Option[org.apache.spark.sql.types.StructType],
      keep: Seq[String]): DataFrame = declared match {
    case None => df
    case Some(schema) =>
      df.select(schema.fields.toSeq.map { f =>
        if (!df.columns.contains(f.name))
          lit(null).cast(f.dataType).as(f.name)
        else if (df.schema(f.name).dataType == f.dataType) col(f.name)
        else col(f.name).cast(f.dataType).as(f.name)
      } ++ keep.map(col): _*)
  }

  /** The pin's name: content hash of the leaf mapping plus (when the
    * caller declares one) the served schema — an ALTER TABLE must
    * never reuse a pin built for the previous schema. */
  private def pinName(root: String, mapping: Seq[(String, String)],
      declared: Option[org.apache.spark.sql.types.StructType]): String =
    s"graft_sm_${hash8(root)}_" + hash8(
      mapping.map { case (k, d) => s"$k\t$d" }.mkString("\n") +
        declared.map(s => "\n#schema=" + s.json).getOrElse(""))

  /** The PURE subset of a snapshot's leaves served through one
    * content-pinned partitioned relation (see [[read]]). With a
    * DECLARED schema the pin serves it directly: the Spark 4 parquet
    * reader null-fills missing columns and widens
    * int8/16/32→int64/float64, float32→float64 (SPARK-40876), so
    * schema evolution stays metadata-only down to the scan. */
  private def servePin(spark: SparkSession, root: String,
      spec: PartitionSpec, mapping: Seq[(String, String)],
      declared: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame = {
    val table = pinName(root, mapping, declared)
    if (!spark.catalog.tableExists(table)) {
      val dataSchema = declared.getOrElse(PartitionedManifest
        .footerSchema(spark, s"$root/${mapping.head._1}/${mapping.head._2}"))
      val cols = dataSchema.map(f => s"`${f.name}` ${f.dataType.sql}")
        .mkString(", ")
      val partCols = spec.names.map(n => s"`$n` string").mkString(", ")
      // graft.spec: HiddenPartitionRule derives partition filters from
      // bare source-column equalities over this relation (transparent
      // hidden partitioning); graft.zonemaps: file skipping below.
      // Pin names are content-derived, so a RACING reader creating the
      // same pin built the identical table — losing the create race is
      // benign (the partition adds below are idempotent either way)
      try spark.sql(s"CREATE TABLE `$table` ($cols, $partCols) " +
        s"USING parquet PARTITIONED BY (${spec.names.map(n => s"`$n`")
          .mkString(", ")}) LOCATION '$root' " +
        s"TBLPROPERTIES ('${graft.plans.ZoneMaps.Prop}'='true', " +
        s"'${graft.plans.HiddenPartitions.Prop}'=" +
        s"'${spec.renderCompact}')")
      catch {
        case _: org.apache.spark.sql.catalyst.analysis
          .TableAlreadyExistsException => ()
      }
      val adds = mapping.map { case (k, d) =>
        val specClause = k.split("/").map { seg =>
          val Array(n, v) = seg.split("=", 2)
          s"`$n`='$v'"
        }.mkString(", ")
        s"PARTITION ($specClause) LOCATION '$root/$k/$d'"
      }
      spark.sql(s"ALTER TABLE `$table` ADD IF NOT EXISTS " +
        adds.mkString(" "))
      // drop pins of expired snapshots for this root (keep-N bounded).
      // A snapshot with merge-on-read leaves serves its PURE SUBSET
      // through the pin, so that subset's pin counts as valid too —
      // an EVOLVED table serves one pin per spec generation, so each
      // generation's pure group is valid as well — and a SQL table
      // serves through declared-schema pins, so each group is valid
      // under no declaration, the CURRENT schema, and the schema in
      // effect at that snapshot (time travel).
      val prefix = s"graft_sm_${hash8(root)}_"
      val versions = specVersions(spark, root)
      val declaredVariants: String => Seq[Option[
          org.apache.spark.sql.types.StructType]] =
        if (!graft.sql.GraftSchemas.hasVersions(spark, root)) _ => Seq(None)
        else { sn => Seq(None,
          Some(graft.sql.GraftSchemas.physicalSchema(
            graft.sql.GraftSchemas.current(spark, root))),
          Some(graft.sql.GraftSchemas.physicalSchema(
            graft.sql.GraftSchemas.forSnapshot(spark, root, sn))))
        }
      val valid = snapshots(spark, root).flatMap { sn =>
        val m = snapshotMapping(spark, root, sn)
        val pure = m.filterNot { case (k, d) =>
          PartitionedManifest.isMorDir(spark, s"$root/$k/$d") }
        val groups = pure.groupBy { case (k, _) =>
          specForLeaf(versions, k) }.values.toSeq
        for {
          x <- Seq(m, pure) ++ groups if x.nonEmpty
          dv <- declaredVariants(sn)
        } yield pinName(root, x, dv)
      }.toSet + table
      val db = spark.catalog.currentDatabase
      spark.sharedState.externalCatalog.listTables(db)
        .filter(t => t.startsWith(prefix) && !valid.contains(t))
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    }
    graft.plans.ZoneMaps.install(spark)
    graft.plans.HiddenPartitions.install(spark)
    spark.table(table)
  }

  /** HIDDEN partitioning's read-side half: given source-column
    * equality predicates, derive the matching partition values and add
    * the partition filters the user never had to know about — e.g.
    * `o_custkey = 42` also prunes to `b = <bucket(42)>`. Returns the
    * filtered frame (source predicates still applied row-level). */
  def hiddenPrune(spark: SparkSession, df: DataFrame,
      spec: PartitionSpec, equalities: Map[String, Any]): DataFrame = {
    val withPart = spec.fields.filter(f => equalities.contains(f.source))
      .foldLeft(df) { case (d, f) =>
        // derive the partition value of the LITERAL through the same
        // transform expression the writer used (one local row, no job)
        val v = spark.range(1)
          .select(f.derive(lit(equalities(f.source))).as("v"))
          .head().getString(0)
        d.where(col(f.name) === v)
      }
    equalities.foldLeft(withPart) { case (d, (c, v)) =>
      d.where(col(c) === lit(v))
    }
  }

  /** Row-level CDC between two kept snapshots: leaf-dir diff first
    * (untouched leaves are never listed, planned, or read), then an
    * exceptAll multiset diff over only the changed leaves, with every
    * partition value recovered from the directory path. */
  def changesBetween(spark: SparkSession, root: String,
      spec: PartitionSpec, fromSnap: String, toSnap: String,
      changeCol: String = "_change_type"): DataFrame = {
    checkSpec(spark, root, spec)
    val from = snapshotMapping(spark, root, fromSnap).toMap
    val to = snapshotMapping(spark, root, toSnap).toMap
    val changed = (from.keySet ++ to.keySet)
      .filter(k => from.get(k) != to.get(k)).toSeq.sorted
    // per-leaf MOR-resolving reads (a changed leaf may be a delta
    // chain on either side); partition values come from the leaf key.
    // Across spec evolutions changed leaves may carry different field
    // names — the diff emits the union, absent fields as NULL.
    val allNames: Seq[String] = changed
      .flatMap(_.split("/").map(_.split("=", 2)(0))).distinct
    def side(m: Map[String, String]): Option[DataFrame] = {
      val leaves = changed.flatMap(k => m.get(k).map(d => (k, d)))
      if (leaves.isEmpty) None
      else Some(leaves
        // one group per field-name layout (spec generation): pure dirs
        // read as ONE relation, MOR chains resolve through the grouped
        // resolver — plan width is generations × chain depth, never
        // the changed-leaf count
        .groupBy { case (k, _) =>
          k.split("/").toSeq.map(_.split("=", 2)(0)) }
        .toSeq.sortBy(_._1.mkString("/"))
        .map { case (names, ls) =>
          val (mor, pure) = ls.partition { case (k, d) =>
            PartitionedManifest.isMorDir(spark, s"$root/$k/$d") }
          val parts =
            (if (pure.isEmpty) Nil
             else Seq(PartitionedManifest.readDirsWithFields(spark,
               pure.map { case (k, d) => s"$root/$k/$d" }, names))) ++
            (if (mor.isEmpty) Nil
             else Seq(PartitionedManifest.resolveMorGrouped(spark,
               mor.map { case (k, d) => (s"$root/$k", d) }, names,
               None)))
          val df = parts.reduce(_.unionByName(_))
          val dataCols = df.columns.toSeq.filterNot(names.contains)
          allNames.filterNot(names.contains)
            .foldLeft(df)((x, n) =>
              x.withColumn(n, lit(null).cast("string")))
            .select((dataCols.map(col) ++ allNames.map(col)): _*)
        }.reduce(_.unionByName(_)))
    }
    (side(from), side(to)) match {
      case (None, None) =>
        read(spark, root, spec, Some(toSnap)).limit(0)
          .withColumn(changeCol, lit(""))
      case (f, t) =>
        val fDf = f.orElse(t.map(_.limit(0))).get
        val tDf = t.orElse(f.map(_.limit(0))).get
        PartitionedManifest.multisetDiff(tDf, fDf, changeCol)
    }
  }

  // ---------------------------------------------------------------------
  // MERGE-ON-READ on the composite spec — the same `_mor.tsv` delta-
  // chain contract as [[PartitionedManifest]] (see its section comment),
  // keyed per LEAF: a merge commit writes ONLY the delta under each
  // touched leaf and becomes visible in one root snapshot swap, so
  // bytes written scale with the DELTA, never the leaf — the posture a
  // 100 TB table partitioned on (day, bucket(id)) needs for CDC-style
  // upsert streams into hot (today's) leaves. Readers (read /
  // changesBetween / readLeaf) resolve chains through the shared
  // resolver; [[compactLeaves]] is the fold-down that converges MOR
  // leaves back to pure data dirs.

  /** One leaf's current LOGICAL content (no partition columns) —
    * MOR-resolving; the single-leaf reader merge builders use instead
    * of a raw parquet read of the live version dir. */
  def readLeaf(spark: SparkSession, root: String, spec: PartitionSpec,
      values: Seq[String]): DataFrame = {
    val lp = leafPath(spec, values)
    val dir = ManifestTable.currentVersion(s"$root/$lp").getOrElse(
      sys.error(s"SpecManifest: no MANIFEST under $root/$lp"))
    PartitionedManifest.resolveVersionData(spark, s"$root/$lp", dir, None)
  }

  /** A leaf's PHYSICAL data schema: its live chain's bottom (pure)
    * parquet footer — what [[commitMerge]] validates upserts against.
    * Callers choosing between delta-layering and copy-on-write check
    * it against the catalog schema (a schema-evolved leaf must fold or
    * rewrite before new-shape deltas can layer on it). One footer read
    * per call. */
  def leafBottomSchema(spark: SparkSession, root: String,
      spec: PartitionSpec, values: Seq[String])
      : org.apache.spark.sql.types.StructType = {
    val lp = leafPath(spec, values)
    val dir = ManifestTable.currentVersion(s"$root/$lp").getOrElse(
      sys.error(s"SpecManifest: no MANIFEST under $root/$lp"))
    val bottom = PartitionedManifest.morChain(spark, s"$root/$lp", dir).last
    PartitionedManifest.footerSchema(spark, s"$root/$lp/$bottom")
  }

  /** The key columns of a leaf's LIVE delta chain (None = pure leaf) —
    * callers picking between delta-layering and copy-on-write check
    * compatibility here (chains are uniformly keyed by construction). */
  def leafChainKeys(spark: SparkSession, root: String,
      spec: PartitionSpec, values: Seq[String]): Option[Seq[String]] = {
    val lp = leafPath(spec, values)
    ManifestTable.currentVersion(s"$root/$lp").flatMap(d =>
      PartitionedManifest.chainKeys(spark, s"$root/$lp", d))
  }

  /** MERGE-ON-READ commit over leaf-keyed `upserts` (full-data-schema
    * replacement rows, keyed by `keyCols`) and `deletes` (key rows):
    * each touched leaf gets a new version dir holding only the delta
    * files and a `_mor.tsv` naming its base; one atomic root snapshot
    * covers the whole delta, so CDC and time travel see a MOR commit
    * exactly like any other. Same contract as
    * [[PartitionedManifest.commitMerge]]: leaves must exist, upsert
    * schemas must match the data schema, per leaf the upsert and
    * delete key sets must be disjoint. Returns the snapshot name.
    *
    * CONCURRENCY: like the single-column twin, the delta parquet is
    * staged with NO lock held; under the lock each leaf binds its
    * delta to the FRESH live version as the chain base, so racing
    * merge committers both land (newest layer wins per key) and
    * serialize only on the metadata tail. `onBeforeLock` is the test
    * seam between the two phases. */
  def commitMerge(spark: SparkSession, root: String,
      spec: PartitionSpec, keyCols: Seq[String],
      upserts: Map[Seq[String], DataFrame] = Map.empty,
      deletes: Map[Seq[String], DataFrame] = Map.empty,
      keepSnapshots: Int = 2,
      onBeforeLock: () => Unit = () => ()): String = {
    require(keepSnapshots >= 2, "keepSnapshots must be >= 2")
    checkSpec(spark, root, spec)
    require(keyCols.nonEmpty && !keyCols.exists(spec.names.contains),
      "commitMerge: keyCols must be data columns, not partition fields")
    val touched = (upserts.keySet ++ deletes.keySet).toSeq
      .sortBy(_.mkString("/"))
    require(touched.nonEmpty, "commitMerge needs upserts or deletes")
    val fs = fsOf(spark, root)
    // ---- LOCK-FREE phase: validate optimistically, stage the delta --
    val snap0 = Dbg.t("cm.snap0")(currentSnapshot(spark, root)).getOrElse(sys.error(
      s"SpecManifest: commitMerge needs a committed snapshot under " +
        s"$root - seed first"))
    val base0 = Dbg.t("cm.mapping")(snapshotMapping(spark, root, snap0)).toMap
    val touchedPaths = touched.map(vs => vs -> leafPath(spec, vs))
    val unknown0 = touchedPaths.collect {
      case (_, lp) if !base0.contains(lp) => lp }
    require(unknown0.isEmpty,
      "SpecManifest: merge-on-read may only touch existing leaves " +
        s"(new: ${unknown0.mkString(",")}) - create leaves through " +
        "commitSnapshot")
    // data-schema authority: each touched leaf's chain BOTTOM (a pure
    // dir by construction — MOR layers hold no data files). EVERY
    // touched leaf must agree: on a mixed-shape table (partial
    // copy-on-write rewrites after an ALTER) a delta matching leaf #1
    // must not layer onto a differently-shaped leaf #2.
    def bottomSchema(lp: String, live: String) = {
      val bottom =
        PartitionedManifest.morChain(spark, s"$root/$lp", live).last
      PartitionedManifest.footerSchema(spark, s"$root/$lp/$bottom")
    }
    val schema = Dbg.t("cm.bottomSchema0")(bottomSchema(touchedPaths.head._2,
      base0(touchedPaths.head._2)))
    // independent per-leaf footer reads (~25 ms each) — overlap them
    Dbg.t("cm.bottomSchemaRest")(Par.map(touchedPaths.tail) { case (_, lp) =>
      val sc = bottomSchema(lp, base0(lp))
      require(sc.map(f => (f.name, f.dataType)) ==
          schema.map(f => (f.name, f.dataType)),
        s"commitMerge: leaf $lp file schema " +
          s"(${sc.fieldNames.mkString(",")}) differs from leaf " +
          s"${touchedPaths.head._2}'s " +
          s"(${schema.fieldNames.mkString(",")}) - mixed-shape " +
          "leaves cannot share one delta; rewrite the stale leaves " +
          "first (copy-on-write DML does this automatically)")
    })
    keyCols.foreach(k => require(schema.fieldNames.contains(k),
      s"commitMerge: unknown key column '$k'"))
    def dataOnly(df: DataFrame): DataFrame =
      spec.names.foldLeft(df)((x, n) =>
        if (x.columns.contains(n)) x.drop(n) else x)
    upserts.foreach { case (vs, df) =>
      val cols = dataOnly(df).schema.map(f => (f.name, f.dataType))
      require(cols == schema.map(f => (f.name, f.dataType)).toSeq,
        s"commitMerge: leaf ${vs.mkString("/")} upsert schema " +
          s"(${cols.map(_._1).mkString(",")}) does not match the " +
          s"data schema (${schema.fieldNames.mkString(",")})")
    }
    deletes.foreach { case (vs, df) =>
      val cols = dataOnly(df).columns.toSeq.sorted
      require(cols == keyCols.sorted,
        s"commitMerge: leaf ${vs.mkString("/")} delete frame must " +
          s"carry exactly the key columns ${keyCols.mkString(",")} " +
          s"(got ${cols.mkString(",")})")
    }
    // staging: ONE write job for every leaf's upserts and one for all
    // deletes — each per-leaf frame tagged with its touched-leaf
    // ordinal, unioned, written `partitionBy` the tag into a root
    // scratch, then RENAMED into the per-leaf stage dirs (driver fs
    // ops). A tiny parquet write has ~0.1-0.3 s fixed cost (job
    // launch, committer, footers), so L per-leaf writes collapsing to
    // 2 jobs is the dominant saving on multi-leaf merges (guide §2.4:
    // two operations keyed the same way share one job; measured in
    // OPTIMIZATION_r19.md). The per-leaf up/del overlap checks batch
    // into ONE intersect the same way (the tag keeps it per-leaf;
    // intersect, not an equi-join, so NULL keys still compare).
    val Tag = "_graft_stage_leaf" // _graft_ prefix reserved repo-wide
    val idxOf: Map[Seq[String], Int] =
      touchedPaths.map(_._1).zipWithIndex.toMap
    // a union of L per-leaf delta frames carries the SUM of their
    // partitions (union concatenates); for a multi-leaf merge of tiny
    // deltas that is L× the task count — and L× the files per tag —
    // that the widest constituent needed. Coalesce back to the SESSION
    // SHUFFLE PARALLELISM: scale-free (no shuffle, no size guess, a
    // no-op for any union already narrower), and every later chain
    // resolution reads fewer footers. A delta wider than the session
    // conf is deliberately narrowed to it — the session parallelism
    // is the cluster-sized write bound.
    def taggedUnion(m: Map[Seq[String], DataFrame],
        sel: DataFrame => DataFrame): Option[DataFrame] = {
      val frames = touchedPaths.flatMap { case (vs, _) =>
        m.get(vs).map(df => sel(dataOnly(df))
          .withColumn(Tag, lit(idxOf(vs).toString)))
      }
      // coalesce to the session's shuffle parallelism: a no-op when
      // the union is already narrower, and no .rdd probe (which would
      // eagerly materialize any shuffle stage a caller's frame holds)
      frames.reduceOption(_.unionByName(_)).map(u =>
        if (frames.lengthCompare(1) <= 0) u
        else u.coalesce(spark.sessionState.conf.numShufflePartitions))
    }
    val upAll = taggedUnion(upserts,
      _.select(schema.fieldNames.toSeq.map(col): _*))
    val delAll = taggedUnion(deletes,
      _.select(keyCols.map(col): _*)).map(_.distinct())
    def scratchWrite(df: Option[DataFrame], what: String)
        : Option[String] = df.map { d =>
      val p = s"$root/.morstage-$what-" +
        java.util.UUID.randomUUID.toString.take(8)
      d.write.partitionBy(Tag).parquet(p)
      p
    }
    // the two staging writes are INDEPENDENT jobs (different frames,
    // different scratch roots) — submit both so the second's tasks
    // back-fill cores freed by the first's tail (guide §2.6)
    val Seq(scratchUp, scratchDel) = Par.map(Seq(
      ("cm.scratchUp", upAll, "up"), ("cm.scratchDel", delAll, "del"))) {
      case (tag, df, what) => Dbg.t(tag)(scratchWrite(df, what))
    }
    // the up/del disjointness contract checks against the WRITTEN
    // scratches (explicit schema, so an all-empty side still reads):
    // one cheap scan of materialized delta bytes instead of
    // re-evaluating both tagged unions a second time
    for (us <- scratchUp; ds <- scratchDel) Dbg.t("cm.overlap") {
      val u = spark.read.schema(upAll.get.schema).parquet(us)
      val d = spark.read.schema(delAll.get.schema).parquet(ds)
      val overlap = u.select((keyCols :+ Tag).map(col): _*)
        .intersect(d.select((keyCols :+ Tag).map(col): _*))
        .select(col(Tag)).distinct().collect()
        .map(r => touchedPaths(r.getString(0).toInt)._2)
      if (overlap.nonEmpty) {
        (scratchUp.toSeq ++ scratchDel.toSeq).foreach(p =>
          try fs.delete(new HPath(p), true)
          catch { case _: java.io.IOException => () })
        require(overlap.isEmpty,
          s"commitMerge: leaf(s) ${overlap.sorted.mkString(",")} have " +
            "keys in BOTH upserts and deletes - an upsert already " +
            "replaces; a delete already removes")
      }
    }
    val staged: Seq[(String, String)] =
      try touchedPaths.zipWithIndex.map { case ((vs, lp), i) =>
        val pr = s"$root/$lp"
        val stage =
          s"$pr/.mor-${java.util.UUID.randomUUID.toString.take(8)}"
        fs.mkdirs(new HPath(s"$stage/_delta"))
        // a leaf whose frame produced no rows writes no scratch
        // subdir; the resolver probes each _delta subdir with
        // fs.exists, so absent == empty (same read semantics)
        def adopt(scratch: Option[String], sub: String): Unit =
          scratch.foreach { sc =>
            val src = new HPath(s"$sc/$Tag=$i")
            if (fs.exists(src))
              fs.rename(src, new HPath(s"$stage/_delta/$sub"))
          }
        adopt(scratchUp, "upserts")
        adopt(scratchDel, "deletes")
        lp -> stage
      } finally (scratchUp.toSeq ++ scratchDel.toSeq).foreach(p =>
        try fs.delete(new HPath(p), true)
        catch { case _: java.io.IOException => () })
    onBeforeLock()
    // ---- LOCKED phase: metadata only — bind each delta to its FRESH
    // chain base, adopt, snapshot ----
    def dropStaged(): Unit = staged.foreach { case (_, st) =>
      try fs.delete(new HPath(st), true)
      catch { case _: java.io.IOException => () }
    }
    try Dbg.t("cm.locked")(ManifestTable.withPublishLock(root) {
      val snap = currentSnapshot(spark, root).get
      val base = snapshotMapping(spark, root, snap).toMap
      val unknown = staged.collect {
        case (lp, _) if !base.contains(lp) => lp }
      require(unknown.isEmpty,
        "SpecManifest: merge-on-read may only touch existing leaves " +
          s"(new: ${unknown.mkString(",")})")
      // a schema-changing commit that landed mid-staging invalidates
      // the staged frames' shape — fail loudly, never adopt a stale
      // shape (mirrors PartitionedManifest.commitMerge). EVERY staged
      // leaf's FRESH chain bottom is checked, not just the first: a
      // racing partial rewrite can reshape any one of them.
      staged.foreach { case (lp, _) =>
        val live = ManifestTable.currentVersion(s"$root/$lp").getOrElse(
          sys.error(s"SpecManifest: no MANIFEST under $root/$lp"))
        val curSchema = bottomSchema(lp, live)
        require(curSchema.map(f => (f.name, f.dataType)) ==
            schema.map(f => (f.name, f.dataType)),
          s"commitMerge: leaf $lp's schema evolved while the delta " +
            "was staging - restage against the current schema")
      }
      val protectByLeaf = protectedDirsByLeaf(spark, root, keepSnapshots)
      val written: Map[String, String] = Par.map(staged) { case (lp, stage) =>
        val pr = s"$root/$lp"
        val baseDir = ManifestTable.currentVersion(pr).getOrElse(
          sys.error(s"SpecManifest: no MANIFEST under $pr"))
        // uniform chain keys (see PartitionedManifest.commitMerge)
        PartitionedManifest.chainKeys(spark, pr, baseDir).foreach(bk =>
          require(bk == keyCols,
            s"commitMerge: leaf $lp has a delta chain keyed by " +
              s"(${bk.mkString(",")}) - a merge keyed by " +
              s"(${keyCols.mkString(",")}) cannot layer on it; " +
              "compactLeaves() first or reuse the chain's keys"))
        ManifestTable.writeOnce(stage, PartitionedManifest.MorFile,
          s"#keys=${keyCols.mkString(",")}\nbase=$baseDir\n")
        val protect = PartitionedManifest.expandMorProtect(spark, pr,
          protectByLeaf.getOrElse(lp, Set.empty))
        lp -> new HPath(ManifestTable.adoptVersion(pr, stage, protect))
          .getName
      }.toMap
      writeSnapshotLocked(spark, root,
        (base ++ written).toSeq.sortBy(_._1), keepSnapshots,
        operation = "merge")
    }) catch {
      case e: Throwable => dropStaged(); throw e
    }
  }

  /** Collect file-level min/max zone maps for `cols` on every LIVE
    * leaf version dir — [[PartitionedManifest.analyzeFileStats]] on
    * the composite layout. The content-pinned read relations already
    * carry the zone-map property, so after ANALYZE a PLAIN
    * `read(…).where(range)` prunes files below partition pruning with
    * no helper call (the w21 contract on spec tables). Idempotent per
    * version dir; merge-on-read leaves refuse loudly (fold first —
    * an empty sidecar would silently drop their content on skip).
    * Returns the number of version dirs newly analyzed. */
  def analyzeFileStats(spark: SparkSession, root: String,
      spec: PartitionSpec, cols: Seq[String]): Int = {
    checkSpec(spark, root, spec)
    // every generation's leaves: an evolved table's old-layout leaves
    // hold live data too — skipping them would leave zone maps
    // uncollected there while the returned count suggests full coverage
    allLeaves(spark, root).map { case (sp, vs) =>
      val lp = leafPath(sp, vs)
      val dir = ManifestTable.currentDataDir(s"$root/$lp").getOrElse(
        sys.error(s"SpecManifest: no MANIFEST under $root/$lp"))
      require(!PartitionedManifest.isMorDir(spark, dir),
        s"SpecManifest: leaf $lp is merge-on-read at $dir - analyze " +
          "after compactLeaves() folds the delta chain down")
      if (FileStats.collect(spark, dir, cols) >= 0) 1 else 0
    }.sum
  }

  /** AS-OF time travel: the LATEST kept snapshot committed at or
    * before `tsMs` ([[PartitionedManifest.snapshotAsOf]] on the
    * composite layout); compose with [[read]]'s snapshot parameter.
    * None if every kept snapshot is newer (the retention horizon has
    * moved past the asked instant — never silently serves younger
    * data). */
  def snapshotAsOf(spark: SparkSession, root: String,
      tsMs: Long): Option[String] =
    snapshots(spark, root).reverse.find(sn =>
      committedMsOf(spark, root, sn).exists(_ <= tsMs))

  /** A snapshot's commit wall-clock from its #committed_ms header. */
  def committedMsOf(spark: SparkSession, root: String,
      snap: String): Option[Long] = {
    val fs = fsOf(spark, root)
    val in = fs.open(new HPath(s"$root/$SnapDir/$snap"))
    val text = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    text.linesIterator.find(_.startsWith("#committed_ms="))
      .map(_.stripPrefix("#committed_ms=").trim.toLong)
  }

  /** FILE-LEVEL metadata table —
    * [[PartitionedManifest.filesMetadata]] on the composite layout:
    * one row per data file in a snapshot (default current), partition
    * = the leaf's relative path. Listings + sidecars only, zero data
    * bytes. */
  def filesMetadata(spark: SparkSession, root: String,
      spec: PartitionSpec, snapshot: Option[String] = None): DataFrame = {
    import spark.implicits._
    checkSpec(spark, root, spec)
    val snap = snapshot.orElse(currentSnapshot(spark, root)).getOrElse(
      sys.error(s"SpecManifest: no snapshot committed under $root"))
    snapshotMapping(spark, root, snap).flatMap { case (lp, d) =>
      PartitionedManifest.filesOfVersion(spark, s"$root/$lp/$d", lp, d)
    }.toDF()
  }

  /** SNAPSHOT inspection table — the snapshot-file layout is shared
    * with the single-column format, so this delegates to
    * [[PartitionedManifest.snapshotsMetadata]] (entries = leaf
    * count). */
  def snapshotsMetadata(spark: SparkSession, root: String): DataFrame =
    PartitionedManifest.snapshotsMetadata(spark, root)

  /** HISTORY inspection table — every root pointer movement incl.
    * rollbacks and fast-forwards; delegates to
    * [[PartitionedManifest.historyMetadata]]. */
  def historyMetadata(spark: SparkSession, root: String): DataFrame =
    PartitionedManifest.historyMetadata(spark, root)

  /** Fold every merge-on-read leaf back down to a pure data dir — the
    * spec table's compaction pass, OPTIMISTIC like
    * [[PartitionedManifest.compact]]: the read-set (leaf → live
    * version dir) snapshots under the root lock, the resolve-and-
    * rewrite job runs with NO lock held (a minutes-long fold never
    * stalls an ingest commit), and the lock is re-acquired only to
    * validate pointer identity per leaf; leaves a concurrent commit
    * touched mid-rewrite retry with a fresh read-set up to
    * `maxAttempts`. Returns (last snapshot, folded leaf paths). */
  def compactLeaves(spark: SparkSession, root: String,
      spec: PartitionSpec, keepSnapshots: Int = 2, maxAttempts: Int = 3,
      onBeforeValidate: () => Unit = () => ()): (String, Seq[String]) = {
    require(keepSnapshots >= 2, "keepSnapshots must be >= 2")
    checkSpec(spark, root, spec)
    val fs = fsOf(spark, root)
    def selectReadSet(among: Option[Set[String]]): Map[String, String] = {
      val snap = currentSnapshot(spark, root).getOrElse(
        sys.error(s"SpecManifest: no snapshot committed under $root"))
      snapshotMapping(spark, root, snap)
        .filter { case (k, _) => among.forall(_.contains(k)) }
        .filter { case (k, d) =>
          PartitionedManifest.isMorDir(spark, s"$root/$k/$d") }
        .toMap
    }
    val done = scala.collection.mutable.ListBuffer.empty[String]
    var lastSnap: Option[String] = None
    var candidates =
      ManifestTable.withPublishLock(root)(selectReadSet(None))
    var attempt = 0
    while (candidates.nonEmpty && attempt < maxAttempts) {
      attempt += 1
      // EXPENSIVE phase, NO lock held: resolve each candidate chain
      // and write the pure replacement into a staged dir under its
      // leaf (a GC'd read-set dir fails loudly → re-select and retry)
      val staged: Option[Map[String, String]] =
        try Some(Par.map(candidates.toSeq) { case (lp, d) =>
          val pr = s"$root/$lp"
          val tmp = s"$pr/.fold-${java.util.UUID.randomUUID.toString.take(8)}"
          PartitionedManifest.resolveVersionData(spark, pr, d, None)
            .write.mode("error").parquet(tmp)
          lp -> new HPath(ManifestTable.stageVersion(pr, tmp)).getName
        }.toMap)
        catch { case scala.util.control.NonFatal(_) => None }
      onBeforeValidate()
      staged match {
        case None =>
          candidates = ManifestTable.withPublishLock(root)(
            selectReadSet(Some(candidates.keySet)))
        case Some(st) =>
          candidates = ManifestTable.withPublishLock(root) {
            // CHEAP phase, lock held: pointer identity IS validity
            val (clean, dirty) = candidates.partition { case (lp, d) =>
              ManifestTable.currentVersion(s"$root/$lp").contains(d)
            }
            if (clean.nonEmpty) {
              clean.keys.foreach(lp =>
                ManifestTable.repointVersion(s"$root/$lp", st(lp)))
              val snap = currentSnapshot(spark, root).get
              val base = snapshotMapping(spark, root, snap).toMap
              lastSnap = Some(writeSnapshotLocked(spark, root,
                (base ++ clean.keys.map(lp => lp -> st(lp))).toSeq
                  .sortBy(_._1), keepSnapshots,
                operation = "compact"))
              done ++= clean.keys
            }
            // staged dirs for invalidated leaves are orphans: drop them
            dirty.keys.foreach(lp =>
              fs.delete(new HPath(s"$root/$lp/${st(lp)}"), true))
            selectReadSet(Some(dirty.keySet))
          }
      }
    }
    (lastSnap.orElse(currentSnapshot(spark, root)).getOrElse(""),
      done.sorted.toSeq)
  }

  /** CLUSTERED / Z-ORDER `OPTIMIZE` on the composite-spec layout —
    * [[PartitionedManifest.compact]]'s `clusterBy`/`clusterZOrder`
    * rewrite carried to spec tables (the declared 100 TB shape): every
    * live leaf is rewritten into `clusterFiles` (or size-derived)
    * internally-sorted files, lexicographic on `clusterBy` or
    * Morton-interleaved (`zOrder=true`, exactly two columns), so
    * zone-map file skipping gets DISJOINT ranges to prune against.
    *
    * CONVERGENT: each rewritten version dir is stamped with the layout
    * marker ([[PartitionedManifest.ClusterMarker]]); a leaf already
    * carrying exactly this layout is skipped, so repeated identical
    * calls rewrite nothing. A merge-on-read leaf always re-selects —
    * its delta chain is new unclustered data, and the rewrite is its
    * fold-down. `schema` (the catalog's current PHYSICAL schema, when
    * the table is catalog-managed) converges stale-shaped leaves onto
    * the current shape as they rewrite.
    *
    * Same two-phase optimistic loop as [[compactLeaves]]: the
    * expensive clustered write runs with NO lock held; under the lock
    * pointer identity validates the read-set, clean leaves repoint,
    * dirty ones retry. Returns (snapshot, rewritten leaf paths). */
  def rewriteLayout(spark: SparkSession, root: String,
      spec: PartitionSpec, clusterBy: Seq[String], clusterFiles: Int = 0,
      targetBytes: Long = 128L << 20, zOrder: Boolean = false,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      leafWhere: Option[String] = None,
      keepSnapshots: Int = 2,
      maxAttempts: Int = 3,
      onBeforeValidate: () => Unit = () => ()): (String, Seq[String]) = {
    require(keepSnapshots >= 2, "keepSnapshots must be >= 2")
    require(clusterBy.nonEmpty, "rewriteLayout: empty cluster columns")
    require(!zOrder || clusterBy.length == 2,
      "rewriteLayout: zOrder interleaves exactly two columns")
    require(!clusterBy.exists(spec.names.contains),
      "rewriteLayout: cluster columns must be data columns, not " +
        "partition fields")
    checkSpec(spark, root, spec)
    val fs = fsOf(spark, root)
    /** Leaves admitted by `leafWhere` — a SQL predicate over the
      * PARTITION FIELD names, evaluated driver-side over the leaf
      * tuples (values are the directory-name STRINGS; leaf-count
      * bounded). The 100 TB posture: layout maintenance runs
      * incrementally per partition predicate ("y = '2025'"), never
      * the whole table per call — Iceberg's rewrite_data_files
      * `where`. */
    def admitted(keys: Iterable[String]): Set[String] = leafWhere match {
      case None => keys.toSet
      case Some(w) =>
        // a spec-evolved table keeps OLD-layout leaves (fewer
        // field=value segments than the current spec); a predicate
        // over the current field names cannot judge them — skip them
        // rather than crash, matching the "old layouts stay
        // mergeable" posture (a call without `where` still rewrites
        // everything)
        val rows = keys.toSeq
          .filter(_.split("/").length == spec.names.length)
          .map { lp =>
            val vs = lp.split("/").toSeq.map(_.split("=", 2)(1))
            org.apache.spark.sql.Row.fromSeq(vs :+ lp)
          }
        val sch = org.apache.spark.sql.types.StructType(
          (spec.names :+ "_graft_leaf").map(n =>
            org.apache.spark.sql.types.StructField(n,
              org.apache.spark.sql.types.StringType)))
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
          sch).filter(expr(w)).collect()
          .map(_.getString(spec.names.length)).toSet
    }
    def selectReadSet(among: Option[Set[String]]): Map[String, String] = {
      val snap = currentSnapshot(spark, root).getOrElse(
        sys.error(s"SpecManifest: no snapshot committed under $root"))
      val mapping = snapshotMapping(spark, root, snap)
        .filter { case (k, _) => among.forall(_.contains(k)) }
      val keep = admitted(mapping.map(_._1))
      mapping
        .filter { case (k, _) => keep.contains(k) }
        .filter { case (k, d) =>
          PartitionedManifest.isMorDir(spark, s"$root/$k/$d") ||
            !PartitionedManifest.isClusteredAs(spark, s"$root/$k/$d",
              clusterBy, clusterFiles, zOrder)
        }
        .toMap
    }
    val done = scala.collection.mutable.ListBuffer.empty[String]
    var lastSnap: Option[String] = None
    var candidates =
      ManifestTable.withPublishLock(root)(selectReadSet(None))
    var attempt = 0
    while (candidates.nonEmpty && attempt < maxAttempts) {
      attempt += 1
      // EXPENSIVE phase, NO lock: resolve each candidate (folding any
      // MOR chain down) and write its clustered replacement staged
      // under the leaf
      val staged: Option[Map[String, String]] =
        try Some(Par.map(candidates.toSeq) { case (lp, d) =>
          val pr = s"$root/$lp"
          val df = PartitionedManifest.resolveVersionData(spark, pr, d,
            schema)
          val bytes = PartitionedManifest.morChain(spark, pr, d)
            .map(x => fs.getContentSummary(new HPath(s"$pr/$x"))
              .getLength).sum
          val nf =
            if (clusterFiles > 0) clusterFiles
            else math.max(1,
              math.ceil(bytes.toDouble / targetBytes).toInt)
          val tmp =
            s"$pr/.optimize-${java.util.UUID.randomUUID.toString.take(8)}"
          PartitionedManifest.clusterFrame(df, clusterBy, nf, zOrder,
            s"leaf $lp").write.mode("error").parquet(tmp)
          // the layout marker rides into the version dir: repeated
          // identical calls then select nothing
          ManifestTable.writeOnce(tmp, PartitionedManifest.ClusterMarker,
            PartitionedManifest.clusterMarkerBody(clusterBy,
              clusterFiles, zOrder))
          lp -> new HPath(ManifestTable.stageVersion(pr, tmp)).getName
        }.toMap)
        catch {
          case e: PartitionedManifest.LayoutValidationException => throw e
          case scala.util.control.NonFatal(_) => None
        }
      onBeforeValidate()
      staged match {
        case None =>
          candidates = ManifestTable.withPublishLock(root)(
            selectReadSet(Some(candidates.keySet)))
        case Some(st) =>
          candidates = ManifestTable.withPublishLock(root) {
            val (clean, dirty) = candidates.partition { case (lp, d) =>
              ManifestTable.currentVersion(s"$root/$lp").contains(d)
            }
            if (clean.nonEmpty) {
              clean.keys.foreach(lp =>
                ManifestTable.repointVersion(s"$root/$lp", st(lp)))
              val snap = currentSnapshot(spark, root).get
              val base = snapshotMapping(spark, root, snap).toMap
              lastSnap = Some(writeSnapshotLocked(spark, root,
                (base ++ clean.keys.map(lp => lp -> st(lp))).toSeq
                  .sortBy(_._1), keepSnapshots,
                operation = "rewrite_layout"))
              done ++= clean.keys
            }
            dirty.keys.foreach(lp =>
              fs.delete(new HPath(s"$root/$lp/${st(lp)}"), true))
            selectReadSet(Some(dirty.keySet))
          }
      }
    }
    (lastSnap.orElse(currentSnapshot(spark, root)).getOrElse(""),
      done.sorted.toSeq)
  }
}
