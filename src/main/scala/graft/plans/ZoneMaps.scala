package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.types._

import graft.engine.FileStats

/** Zone maps on the DEFAULT read path: w13 built file-level min/max
  * sidecars (`_filestats.tsv` per immutable version directory) served
  * through an explicit `scanWithFileSkipping` API; this module makes
  * every ordinary range query over a manifest-served relation consult
  * them automatically — `spark.table(pin).where(col BETWEEN lo AND hi)`
  * plans only the surviving files, no special call required (the Delta
  * data-skipping / Iceberg manifest-stats posture: stats pruning is a
  * property of the TABLE, not of one API).
  *
  * Mechanism (all public Spark APIs):
  *   - manifest-synced catalog tables (and the content-pinned read
  *     relations) carry `TBLPROPERTIES('graft.zonemaps'='true')`;
  *   - [[ZoneMapRule]], an optimizer rule in the LAST batch
  *     (`spark.experimental.extraOptimizations` — after
  *     PruneFileSourcePartitions, so partition pruning is untouched),
  *     wraps each such relation's [[FileIndex]] in a
  *     [[ZoneMapFileIndex]];
  *   - `FileSourceScanExec` hands its pushed data filters to
  *     `FileIndex.listFiles(partitionFilters, dataFilters)` — the
  *     wrapper extracts per-column range bounds and drops whole files
  *     whose recorded [min,max] cannot intersect them. The row-level
  *     predicate still runs, so skipping is pure IO elision.
  *
  * Conservative by construction (the w13 contract): no sidecar, no
  * stat for the column, unusable stats, type mismatch, or any
  * non-range predicate shape → the file is KEPT. An all-null file is
  * skippable by any range bound (ranges are null-rejecting).
  *
  * At 100 TB this is the read-path half of clustering: w19's clustered
  * OPTIMIZE gives files disjoint spans, and every range query then
  * pays only the intersecting files — with partition pruning above it
  * and row-group pushdown below, all three pruning tiers compose on a
  * plain `spark.table(...).where(...)`.
  */
object ZoneMaps {

  /** Table property marking a relation as zone-map-served. */
  val Prop = "graft.zonemaps"

  /** Register [[ZoneMapRule]] on the session (idempotent). Runs in the
    * "User Provided Optimizers" batch — strictly after partition
    * pruning. The manifest read paths call this on every serve, so any
    * session that reads a manifest table gets file skipping with zero
    * configuration. */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(ZoneMapRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ ZoneMapRule
  }

  // sidecar cache, keyed by version directory: version dirs are
  // immutable once written, so a PRESENT sidecar can be cached forever.
  // A missing sidecar is NOT cached — ANALYZE may add one later, and a
  // stale "no stats" entry would silently disable skipping for the
  // session.
  private val statsCache = new ConcurrentHashMap[String,
    Map[String, Map[String, FileStats.ColStat]]]()

  private[graft] def statsFor(spark: SparkSession, versionDir: String)
      : Option[Map[String, Map[String, FileStats.ColStat]]] = {
    val hit = statsCache.get(versionDir)
    if (hit != null) Some(hit)
    else FileStats.statsFor(spark, versionDir) match {
      case Some(m) => statsCache.putIfAbsent(versionDir, m); Some(m)
      case None => None
    }
  }

  /** Per-column conjunctive bounds extracted from pushed data filters.
    * Numeric and string bounds are tracked separately and only applied
    * against stats of the matching type. */
  final case class Bounds(nlo: Option[Double] = None,
      nhi: Option[Double] = None, slo: Option[String] = None,
      shi: Option[String] = None) {
    def withNlo(v: Double): Bounds =
      copy(nlo = Some(nlo.fold(v)(math.max(_, v))))
    def withNhi(v: Double): Bounds =
      copy(nhi = Some(nhi.fold(v)(math.min(_, v))))
    def withSlo(v: String): Bounds =
      copy(slo = Some(slo.fold(v)(o => if (o > v) o else v)))
    def withShi(v: String): Bounds =
      copy(shi = Some(shi.fold(v)(o => if (o < v) o else v)))
  }

  private def numLit(v: Any, dt: DataType): Option[Double] = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType =>
      Some(v.toString.toDouble)
    // parquet footers record DATE as INT32 days and TIMESTAMP as INT64
    // micros — exactly the catalyst literal representations
    case DateType => Some(v.asInstanceOf[Int].toDouble)
    case TimestampType | TimestampNTZType =>
      Some(v.asInstanceOf[Long].toDouble)
    case _ => None // decimals are stored UNSCALED in footers: never
    // compare a scaled literal against them (conservative keep)
  }

  private def strLit(v: Any, dt: DataType): Option[String] = dt match {
    case StringType => Option(v).map(_.toString)
    case _ => None
  }

  private def isPlainNumeric(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
        DoubleType => true
    case _ => false
  }

  /** The column under a comparison side: a bare attribute, or an
    * attribute under a NUMERIC-to-numeric cast — safe because both the
    * bound and the stats are compared through Double, and
    * double-rounding is monotone (x >= y ⇒ toDouble(x) >= toDouble(y)),
    * so a rounded comparison can only KEEP more, never wrongly skip. */
  private def attrOf(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case c: Cast => c.child match {
      case a: AttributeReference
          if isPlainNumeric(a.dataType) && isPlainNumeric(c.dataType) =>
        Some(a)
      case _ => None
    }
    case _ => None
  }

  /** Extract per-column bounds from conjunctive pushed filters. Only
    * >, >=, <, <=, = against a literal and IN/InSet over literals
    * contribute (an IN-list becomes its [min,max] hull — conservative);
    * everything else is ignored. Strict bounds are treated as
    * inclusive — never skips too much. */
  private[graft] def extractBounds(filters: Seq[Expression])
      : Map[String, Bounds] = {
    var out = Map.empty[String, Bounds]
    def upd(name: String)(f: Bounds => Bounds): Unit =
      out = out.updated(name, f(out.getOrElse(name, Bounds())))
    def lo(a: AttributeReference, v: Any, dt: DataType): Unit = {
      numLit(v, dt).foreach(d => upd(a.name)(_.withNlo(d)))
      strLit(v, dt).foreach(s => upd(a.name)(_.withSlo(s)))
    }
    def hi(a: AttributeReference, v: Any, dt: DataType): Unit = {
      numLit(v, dt).foreach(d => upd(a.name)(_.withNhi(d)))
      strLit(v, dt).foreach(s => upd(a.name)(_.withShi(s)))
    }
    filters.foreach {
      case GreaterThanOrEqual(l, Literal(v, t)) =>
        attrOf(l).foreach(lo(_, v, t))
      case GreaterThan(l, Literal(v, t)) => attrOf(l).foreach(lo(_, v, t))
      case LessThanOrEqual(l, Literal(v, t)) =>
        attrOf(l).foreach(hi(_, v, t))
      case LessThan(l, Literal(v, t)) => attrOf(l).foreach(hi(_, v, t))
      case EqualTo(l, Literal(v, t)) =>
        attrOf(l).foreach { a => lo(a, v, t); hi(a, v, t) }
      case GreaterThanOrEqual(Literal(v, t), r) =>
        attrOf(r).foreach(hi(_, v, t))
      case GreaterThan(Literal(v, t), r) => attrOf(r).foreach(hi(_, v, t))
      case LessThanOrEqual(Literal(v, t), r) =>
        attrOf(r).foreach(lo(_, v, t))
      case LessThan(Literal(v, t), r) => attrOf(r).foreach(lo(_, v, t))
      case EqualTo(Literal(v, t), r) =>
        attrOf(r).foreach { a => lo(a, v, t); hi(a, v, t) }
      // IN-list as min/max-of-literals bounds (still conservative: a
      // file intersecting the hull is kept even if it straddles a gap
      // between list values). Null literals never match affirmatively
      // and are skipped; a list with non-literal members derives
      // nothing.
      case In(e, list) if list.nonEmpty &&
          list.forall(_.isInstanceOf[Literal]) =>
        attrOf(e).foreach { a =>
          val lits = list.collect { case Literal(v, t) if v != null =>
            (v, t) }
          val nums = lits.map { case (v, t) => numLit(v, t) }
          val strs = lits.map { case (v, t) => strLit(v, t) }
          if (lits.nonEmpty && nums.forall(_.isDefined)) {
            val f = nums.flatten
            upd(a.name)(_.withNlo(f.min)); upd(a.name)(_.withNhi(f.max))
          } else if (lits.nonEmpty && strs.forall(_.isDefined)) {
            val f = strs.flatten
            upd(a.name)(_.withSlo(f.min)); upd(a.name)(_.withShi(f.max))
          }
        }
      // prefix predicate (LIKE 'abc%'): any match lies in
      // [prefix, prefixWithLastCharIncremented] — the upper bound is
      // INCLUSIVE of strings like prefix+"￿"+…, so it stays
      // conservative; a prefix ending in Char.MaxValue keeps only the
      // lower bound
      case StartsWith(l, Literal(v, StringType)) if v != null =>
        attrOf(l).foreach { a =>
          val p = v.toString
          if (p.nonEmpty) {
            upd(a.name)(_.withSlo(p))
            if (p.last != Char.MaxValue)
              upd(a.name)(_.withShi(
                p.init + (p.last + 1).toChar))
          }
        }
      // post-OptimizeIn shape of a large IN: values are in the
      // internal representation of the (possibly cast) child's type
      case InSet(e, hset) if hset.nonEmpty =>
        attrOf(e).foreach { a =>
          val dt = e.dataType
          val vs = hset.toSeq.filter(_ != null)
          val nums = vs.map(numLit(_, dt))
          val strs = vs.map(strLit(_, dt))
          if (vs.nonEmpty && nums.forall(_.isDefined)) {
            val f = nums.flatten
            upd(a.name)(_.withNlo(f.min)); upd(a.name)(_.withNhi(f.max))
          } else if (vs.nonEmpty && strs.forall(_.isDefined)) {
            val f = strs.flatten
            upd(a.name)(_.withSlo(f.min)); upd(a.name)(_.withShi(f.max))
          }
        }
      case _ => ()
    }
    out
  }

  /** Can any row of a file with stats `cs` satisfy `b`? Null literals
    * never reach here (catalyst folds `col > null` away). */
  private[graft] def mayMatch(cs: FileStats.ColStat, b: Bounds): Boolean =
    (cs.min, cs.max) match {
      case (None, None) =>
        // all-null file: a range bound is null-rejecting — skippable
        // (only evaluated when at least one bound exists)
        b.nlo.isEmpty && b.nhi.isEmpty && b.slo.isEmpty && b.shi.isEmpty
      case (Some(mn), Some(mx))
          if cs.typ == "long" || cs.typ == "double" =>
        try
          b.nlo.forall(lo => mx.toDouble >= lo) &&
            b.nhi.forall(hi => mn.toDouble <= hi)
        catch { case _: NumberFormatException => true }
      case (Some(mn), Some(mx)) if cs.typ == "string" =>
        b.slo.forall(lo => mx >= lo) && b.shi.forall(hi => mn <= hi)
      case _ => true
    }
}

/** [[FileIndex]] wrapper applying zone-map file skipping to the pushed
  * data filters; everything else delegates. Installed by
  * [[ZoneMapRule]] on relations whose catalog table carries
  * `graft.zonemaps=true`. */
class ZoneMapFileIndex(spark: SparkSession, val delegate: FileIndex)
    extends FileIndex {

  override def rootPaths: Seq[HPath] = delegate.rootPaths
  override def inputFiles: Array[String] = delegate.inputFiles
  override def refresh(): Unit = delegate.refresh()
  override def sizeInBytes: Long = delegate.sizeInBytes
  override def partitionSchema: StructType = delegate.partitionSchema
  override def metadataOpsTimeNs: Option[Long] = delegate.metadataOpsTimeNs

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val dirs = delegate.listFiles(partitionFilters, dataFilters)
    val bounds = ZoneMaps.extractBounds(dataFilters)
    if (bounds.isEmpty) dirs
    else dirs.map { pd =>
      val kept = pd.files.filter { f =>
        val versionDir = f.getPath.getParent.toString
        ZoneMaps.statsFor(spark, versionDir) match {
          case Some(byFile) => byFile.get(f.getPath.getName) match {
            case Some(colStats) => bounds.forall { case (c, b) =>
              colStats.get(c).forall(cs => ZoneMaps.mayMatch(cs, b))
            }
            case None => true // file never analyzed: keep
          }
          case None => true // version dir never analyzed: keep
        }
      }
      if (kept.length == pd.files.length) pd else pd.copy(files = kept)
    }
  }
}

/** Optimizer rule (last batch, after partition pruning): wrap eligible
  * relations' file indexes in [[ZoneMapFileIndex]]. Idempotent — an
  * already-wrapped relation no longer matches. */
object ZoneMapRule extends Rule[LogicalPlan] {
  private def eligible(l: LogicalRelation): Boolean =
    l.catalogTable.exists(
      _.properties.get(ZoneMaps.Prop).contains("true")) &&
      (l.relation match {
        case r: HadoopFsRelation =>
          !r.location.isInstanceOf[ZoneMapFileIndex]
        case _ => false
      })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case l: LogicalRelation if eligible(l) =>
      val r = l.relation.asInstanceOf[HadoopFsRelation]
      l.copy(relation = r.copy(
        location = new ZoneMapFileIndex(r.sparkSession, r.location))(
        r.sparkSession))
  }
}
