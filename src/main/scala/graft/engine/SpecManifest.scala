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
  * Scope: the spec surface is seed / snapshot-commit / read /
  * time-travel / CDC / hidden-pruning. Tags, branches, MOR and
  * compaction stay on the single-column [[PartitionedManifest]] for
  * now — the pointer primitives are shared, so extending them here is
  * mechanical.
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

  private def checkSpec(spark: SparkSession, root: String,
      spec: PartitionSpec): Unit = {
    val stored = readSpec(spark, root)
    require(stored == spec,
      s"SpecManifest: spec mismatch under $root - stored " +
        s"[${stored.render.replace("\n", "; ")}], got " +
        s"[${spec.render.replace("\n", "; ")}]")
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
  def commitSnapshot(spark: SparkSession, root: String,
      spec: PartitionSpec, updates: Map[Seq[String], DataFrame],
      keepSnapshots: Int = 2): String = {
    require(keepSnapshots >= 2, "keepSnapshots must be >= 2")
    checkSpec(spark, root, spec)
    ManifestTable.withPublishLock(root) {
      val fs = fsOf(spark, root)
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
      // kept snapshots' dirs per leaf — the per-leaf GC protection
      val protectByLeaf: Map[String, Set[String]] =
        (currentSnapshot(spark, root).toSeq ++
          snapshots(spark, root).takeRight(keepSnapshots)).distinct
          .flatMap(sn => snapshotMapping(spark, root, sn))
          .groupBy(_._1).map { case (k, ds) => k -> ds.map(_._2).toSet }
      val written: Map[String, String] =
        if (updates.isEmpty) Map.empty
        else {
          val scratch =
            s"$root/.commit-${java.util.UUID.randomUUID.toString.take(8)}"
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
            .write.mode("error").partitionBy(spec.names: _*)
            .parquet(scratch)
          try updates.keys.toSeq.sortBy(_.mkString("/")).map { vs =>
            val lp = leafPath(spec, vs)
            val src = new HPath(s"$scratch/$lp")
            val protect = protectByLeaf.getOrElse(lp, Set.empty)
            val dir =
              if (fs.exists(src))
                ManifestTable.adoptVersion(s"$root/$lp", src.toString,
                  protect)
              else // all-empty leaf update: publish its empty version
                ManifestTable.publish(spark, s"$root/$lp",
                  updates(vs).select(dataCols.map(col): _*).limit(0),
                  protect)
            lp -> new HPath(dir).getName
          }.toMap
          finally fs.delete(new HPath(scratch), true)
        }
      val mapping = (base ++ written).toSeq.sortBy(_._1)
      require(mapping.nonEmpty, "SpecManifest: nothing to commit")
      fs.mkdirs(new HPath(root, SnapDir))
      val gen = snapshots(spark, root).lastOption
        .map(_.drop(1).takeWhile(_.isDigit).toInt).getOrElse(0) + 1
      val snap = f"s$gen%06d-${java.util.UUID.randomUUID.toString.take(8)}"
      val body = s"#committed_ms=${System.currentTimeMillis()}\n" +
        mapping.map { case (k, d) => s"$k\t$d" }.mkString("\n") + "\n"
      ManifestTable.writeOnce(root, s"$SnapDir/$snap", body)
      ManifestTable.swapRootPointer(root, snap)
      val keep = snapshots(spark, root).takeRight(keepSnapshots).toSet + snap
      snapshots(spark, root).filterNot(keep).foreach(s =>
        fs.delete(new HPath(root, s"$SnapDir/$s"), false))
      snap
    }
  }

  private def hash8(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(8)

  /** Read a snapshot (default: current) through a content-pinned
    * catalog relation carrying ALL spec fields as partition columns —
    * one plan node, PartitionFilters pruning on every level. The pin
    * carries the zone-map property, so file skipping composes below
    * partition pruning here too. */
  def read(spark: SparkSession, root: String, spec: PartitionSpec,
      snapshot: Option[String] = None): DataFrame = {
    checkSpec(spark, root, spec)
    val snap = snapshot.orElse(currentSnapshot(spark, root)).getOrElse(
      sys.error(s"SpecManifest: no snapshot committed under $root"))
    val mapping = snapshotMapping(spark, root, snap)
    require(mapping.nonEmpty, s"SpecManifest: empty snapshot $snap")
    val table = s"graft_sm_${hash8(root)}_" + hash8(
      mapping.map { case (k, d) => s"$k\t$d" }.mkString("\n"))
    if (!spark.catalog.tableExists(table)) {
      val dataSchema = spark.read
        .parquet(s"$root/${mapping.head._1}/${mapping.head._2}").schema
      val cols = dataSchema.map(f => s"`${f.name}` ${f.dataType.sql}")
        .mkString(", ")
      val partCols = spec.names.map(n => s"`$n` string").mkString(", ")
      // graft.spec: HiddenPartitionRule derives partition filters from
      // bare source-column equalities over this relation (transparent
      // hidden partitioning); graft.zonemaps: file skipping below
      spark.sql(s"CREATE TABLE `$table` ($cols, $partCols) " +
        s"USING parquet PARTITIONED BY (${spec.names.map(n => s"`$n`")
          .mkString(", ")}) LOCATION '$root' " +
        s"TBLPROPERTIES ('${graft.plans.ZoneMaps.Prop}'='true', " +
        s"'${graft.plans.HiddenPartitions.Prop}'=" +
        s"'${spec.renderCompact}')")
      val adds = mapping.map { case (k, d) =>
        val specClause = k.split("/").map { seg =>
          val Array(n, v) = seg.split("=", 2)
          s"`$n`='$v'"
        }.mkString(", ")
        s"PARTITION ($specClause) LOCATION '$root/$k/$d'"
      }
      spark.sql(s"ALTER TABLE `$table` ADD IF NOT EXISTS " +
        adds.mkString(" "))
      // drop pins of expired snapshots for this root (keep-N bounded)
      val prefix = s"graft_sm_${hash8(root)}_"
      val valid = snapshots(spark, root).map { sn =>
        prefix + hash8(snapshotMapping(spark, root, sn)
          .map { case (k, d) => s"$k\t$d" }.mkString("\n"))
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
    def side(m: Map[String, String]): Option[DataFrame] = {
      val dirs = changed.flatMap(k => m.get(k).map(d => s"$root/$k/$d"))
      if (dirs.isEmpty) None
      else {
        val df = spark.read.parquet(dirs: _*)
        Some(spec.fields.foldLeft(df) { (d, f) =>
          d.withColumn(f.name, regexp_extract(col("_metadata.file_path"),
            java.util.regex.Pattern.quote(s"/${f.name}=") + "([^/]+)/", 1))
        }.select((df.columns.map(col) ++ spec.names.map(col)): _*))
      }
    }
    (side(from), side(to)) match {
      case (None, None) =>
        read(spark, root, spec, Some(toSnap)).limit(0)
          .withColumn(changeCol, lit(""))
      case (f, t) =>
        val fDf = f.orElse(t.map(_.limit(0))).get
        val tDf = t.orElse(f.map(_.limit(0))).get
        tDf.exceptAll(fDf).withColumn(changeCol, lit("insert"))
          .unionByName(
            fDf.exceptAll(tDf).withColumn(changeCol, lit("delete")))
    }
  }
}
