package graft.sql

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.SpecManifest

/** SQL-ADDRESSABLE MAINTENANCE of graft tables — Iceberg's stored-
  * procedure posture (`CALL catalog.system.<proc>(…)`), on Spark 4's
  * native `ProcedureCatalog` support, so a pure-SQL session can run
  * the whole table lifecycle without the Scala API:
  *
  * {{{
  *   CALL g.system.compact('db.t')            -- fold MOR delta chains
  *   CALL g.system.expire_snapshots('db.t', <older_than_ms>, <keep>)
  *   CALL g.system.clean_orphans('db.t', <grace_ms>)
  *   CALL g.system.tag('db.t', 'audited')
  *   CALL g.system.rollback('db.t', 'audited')
  *   CALL g.system.create_branch('db.t', 'wap')
  *   CALL g.system.fast_forward('db.t', 'wap')
  *   CALL g.system.analyze('db.t', 'k,v')     -- zone-map collection
  * }}}
  *
  * Every procedure resolves the table against the CALLING catalog's
  * warehouse and delegates to the same [[SpecManifest]] maintenance
  * entry points the Scala API uses — one implementation, two front
  * doors. Each returns a one-column `result` relation describing what
  * happened (folded leaves, expired snapshots, deleted orphans, …);
  * maintenance is metadata-bounded, so the result is always small.
  *
  * The reference routes maintenance through plain SQL statements too
  * (the VACUUM/ANALYZE classifier, db_converter.py:22-31).
  */
object GraftProcedures {

  /** One procedure: parameters are positional and required; `fn` gets
    * (session, table root, remaining args) and returns result lines. */
  private final case class GP(name: String, desc: String,
      params: Seq[(String, DataType)],
      fn: (SparkSession, String, Seq[Any]) => Seq[String],
      defaults: Map[String, String] = Map.empty)

  private def spec(s: SparkSession, root: String) =
    SpecManifest.specVersions(s, root).last

  private val all: Seq[GP] = Seq(
    GP("compact",
      "fold every merge-on-read delta chain back to pure data dirs",
      Seq("table" -> StringType),
      (s, root, _) => {
        // honor the table's retention property: trimming past the
        // default 2 here would destroy the replay window a restarting
        // CDC stream needs (every DML/MERGE/sink commit threads it)
        val (_, folded) = SpecManifest.compactLeaves(s, root,
          spec(s, root), keepSnapshots = GraftProps.keepSnapshots(root))
        if (folded.isEmpty) Seq("no merge-on-read leaves")
        else folded.map(lp => s"folded $lp")
      }),
    GP("rewrite_layout",
      "clustered / z-order OPTIMIZE: rewrite every leaf into sorted " +
        "files ('sort' lexicographic, 'zorder' Morton-interleaved); " +
        "files > 0 pins the per-leaf file count, else target_mb sizes " +
        "it; repeated identical calls rewrite nothing",
      Seq("table" -> StringType, "mode" -> StringType,
        "columns" -> StringType, "files" -> LongType,
        "target_mb" -> LongType, "where" -> StringType),
      (s, root, args) => {
        val mode = args(0).asInstanceOf[String].toLowerCase
        require(mode == "sort" || mode == "zorder",
          s"rewrite_layout: mode must be 'sort' or 'zorder', got " +
            s"'$mode'")
        val cols = args(1).asInstanceOf[String].split(",").toSeq
          .map(_.trim).filter(_.nonEmpty)
        require(cols.nonEmpty, "rewrite_layout: empty column list")
        val files = args(2).asInstanceOf[Long].toInt
        val targetMb = args(3).asInstanceOf[Long]
        require(files > 0 || targetMb > 0,
          "rewrite_layout: give files > 0 or target_mb > 0")
        // '' = every leaf; otherwise a predicate over the PARTITION
        // FIELD names selecting the leaves to rewrite (the 100 TB
        // incremental-maintenance shape: one partition per call)
        val where = Option(args(4).asInstanceOf[String]).map(_.trim)
          .filter(_.nonEmpty)
        // catalog-managed tables converge stale-shaped leaves onto the
        // CURRENT physical schema as they rewrite
        val phys =
          if (!GraftSchemas.hasVersions(s, root)) None
          else Some(GraftSchemas.physicalSchema(
            GraftSchemas.current(s, root)))
        val (_, rewritten) = SpecManifest.rewriteLayout(s, root,
          spec(s, root), cols, clusterFiles = files,
          targetBytes = targetMb << 20, zOrder = mode == "zorder",
          schema = phys, leafWhere = where,
          keepSnapshots = GraftProps.keepSnapshots(root))
        if (rewritten.isEmpty) Seq("no leaves need this layout")
        else rewritten.map(lp => s"rewrote $lp")
      }, defaults = Map("where" -> "''")),
    GP("expire_snapshots",
      "expire kept snapshots older than a wall-clock instant",
      Seq("table" -> StringType, "older_than_ms" -> LongType,
        "keep_last" -> LongType),
      (s, root, args) => {
        val expired = SpecManifest.expireSnapshots(s, root,
          olderThanMs = args(0).asInstanceOf[Long],
          keepLast = args(1).asInstanceOf[Long].toInt)
        if (expired.isEmpty) Seq("nothing to expire")
        else expired.map(sn => s"expired $sn")
      }),
    GP("clean_orphans",
      "delete scratch and unreferenced version dirs past a grace window",
      Seq("table" -> StringType, "grace_ms" -> LongType),
      (s, root, args) => {
        val deleted = SpecManifest.cleanOrphans(s, root, spec(s, root),
          graceMs = args(0).asInstanceOf[Long])
        if (deleted.isEmpty) Seq("no orphans")
        else deleted.map(p => s"deleted $p")
      }),
    GP("tag", "tag the current snapshot with an immutable name",
      Seq("table" -> StringType, "name" -> StringType),
      (s, root, args) => Seq("tagged " + SpecManifest.tagSnapshot(
        s, root, args(0).asInstanceOf[String]))),
    GP("drop_tag", "drop a tag",
      Seq("table" -> StringType, "name" -> StringType),
      (s, root, args) => {
        SpecManifest.dropTag(s, root, args(0).asInstanceOf[String])
        Seq(s"dropped tag ${args(0)}")
      }),
    GP("rollback",
      "metadata-only rollback to a kept snapshot, tag or branch",
      Seq("table" -> StringType, "ref" -> StringType),
      (s, root, args) => Seq("rolled back as " + SpecManifest.rollback(
        s, root, spec(s, root), args(0).asInstanceOf[String]))),
    GP("create_branch",
      "create a write-audit-publish branch at the current snapshot",
      Seq("table" -> StringType, "name" -> StringType),
      (s, root, args) => Seq("branched at " + SpecManifest.createBranch(
        s, root, args(0).asInstanceOf[String]))),
    GP("fast_forward",
      "publish a branch: fast-forward main to its head",
      Seq("table" -> StringType, "branch" -> StringType),
      (s, root, args) => Seq("fast-forwarded to " +
        SpecManifest.fastForward(s, root, spec(s, root),
          args(0).asInstanceOf[String]))),
    GP("drop_branch", "drop a branch",
      Seq("table" -> StringType, "name" -> StringType),
      (s, root, args) => {
        SpecManifest.dropBranch(s, root, args(0).asInstanceOf[String])
        Seq(s"dropped branch ${args(0)}")
      }),
    GP("analyze",
      "collect file-level zone maps for a comma-separated column list",
      Seq("table" -> StringType, "columns" -> StringType),
      (s, root, args) => {
        val cols = args(0).asInstanceOf[String].split(",").toSeq
          .map(_.trim).filter(_.nonEmpty)
        require(cols.nonEmpty, "analyze: empty column list")
        val n = SpecManifest.analyzeFileStats(s, root, spec(s, root),
          cols)
        Seq(s"analyzed $n version dir(s) for ${cols.mkString(",")}")
      }))

  def names: Seq[String] = all.map(_.name)

  def load(name: String, catalog: GraftCatalog): UnboundProcedure =
    all.find(_.name == name).map(gp => unbound(gp, catalog)).getOrElse(
      sys.error(s"GraftCatalog: unknown procedure '$name' " +
        s"(${names.mkString(", ")})"))

  private def unbound(gp: GP, catalog: GraftCatalog): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = gp.name
      override def description(): String = gp.desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = gp.name
          override def description(): String = gp.desc
          override def isDeterministic: Boolean = false
          override def parameters(): Array[ProcedureParameter] =
            gp.params.map { case (n, t) =>
              val b = ProcedureParameter.in(n, t)
              gp.defaults.get(n).foreach(b.defaultValue)
              b.build()
            }.toArray
          override def call(input: InternalRow): util.Iterator[Scan] = {
            val spark = SparkSession.active
            val args = gp.params.zipWithIndex.map {
              case ((_, StringType), i) =>
                input.getUTF8String(i).toString
              case ((_, LongType), i) => input.getLong(i)
              case ((p, t), _) => sys.error(
                s"GraftProcedures: unhandled parameter type $t for $p")
            }
            val root =
              catalog.rootOfTableName(args.head.asInstanceOf[String])
            val body = gp.fn(spark, root, args.tail)
            // every result relation ends with the table's snapshot id
            // AFTER the call, so packet steps can assert on it (and a
            // snapshot-creating procedure exposes the one it made)
            val lines = body ++ SpecManifest
              .currentSnapshot(spark, root).map(sn => s"snapshot $sn")
            val scan: Scan = new LocalScan {
              override def readSchema(): StructType =
                new StructType().add("result", StringType)
              override def rows(): Array[InternalRow] = lines.map(l =>
                new GenericInternalRow(Array[Any](
                  UTF8String.fromString(l))): InternalRow).toArray
            }
            util.List.of(scan).iterator()
          }
        }
    }
}
