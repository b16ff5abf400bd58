package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.SpecManifest
import graft.engine.SpecManifest.{Bucket, Day, Identity, Month, PartitionSpec, Transform, Truncate, Year}

/** HIDDEN partitioning made transparent (the Iceberg read contract): a
  * query filtering on a SOURCE column — `WHERE o_custkey = 42` — prunes
  * to the derived partition directory without the user (or the helper
  * API) naming the bucket. Spec-pinned relations carry their partition
  * spec as a table property; [[HiddenPartitionRule]] (same last-batch
  * registration as [[ZoneMapRule]]) finds source-column equality
  * conjuncts above such a relation, evaluates the field's transform on
  * the LITERAL driver-side (the same expression the writer used), and
  * conjoins the matching partition-column equality. FileSourceStrategy
  * then splits it into a real PartitionFilter at physical planning, so
  * the scan lists only the derived leaf directories.
  *
  * Three conjunct shapes derive (each top-level, against literals):
  *
  *   - EQUALITY — any transform: `o_custkey = 42` prunes to its bucket.
  *   - IN-LIST — any transform: each literal derives its partition
  *     value, the field prunes to the derived value SET (the catalog
  *     packets' dominant filter shape; a bucket field prunes to at most
  *     |list| buckets). One underivable or null literal drops the whole
  *     derivation.
  *   - INCLUSIVE RANGES — ORDER-PRESERVING transforms only (the Iceberg
  *     range-projection contract): `o_orderdate BETWEEN a AND b`
  *     projects through day/month/year (derived strings are fixed-width
  *     and lexicographically ordered), truncate and numeric identity
  *     (compared through a bigint cast of the partition value — string
  *     compare of numerics breaks across digit counts), and string
  *     identity. Strict bounds project inclusively (many source values
  *     share one partition value — never skips too much). Ranges on a
  *     BUCKET field derive nothing: hashes are order-destroying.
  *
  * Conservative otherwise: an OR branch derives nothing; a transform
  * evaluation that cannot be reproduced exactly adds NO predicate.
  * Added predicates are checked for semantic presence first, so the
  * rule is idempotent under the fixed-point batch. */
object HiddenPartitions {

  /** Table property carrying the compact spec render. */
  val Prop = "graft.spec"

  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations
        .contains(HiddenPartitionRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ HiddenPartitionRule
  }

  /** Derive the partition value of `transform` applied to a literal —
    * EXACTLY the writer's expression semantics or None (no predicate).
    * Mirrors [[SpecManifest.PartField.derive]]. Identity only covers
    * types whose cast-to-string render is reproducible here (string,
    * integral, boolean, date); floats/decimals/timestamps derive
    * nothing — a subtly-different render would build a FALSE predicate
    * that silently prunes everything. */
  private[plans] def deriveValue(t: Transform, v: Any,
      dt: DataType): Option[String] = t match {
    case Identity => (v, dt) match {
      case (null, _) => None
      case (u: UTF8String, _) => Some(u.toString)
      case (b: Byte, ByteType) => Some(b.toString)
      case (s: Short, ShortType) => Some(s.toString)
      case (i: Int, IntegerType) => Some(i.toString)
      case (l: Long, LongType) => Some(l.toString)
      case (b: Boolean, BooleanType) => Some(b.toString)
      // catalyst dates are epoch DAYS; the writer's cast-to-string is
      // the ISO render, never the day count
      case (days: Int, DateType) =>
        Some(java.time.LocalDate.ofEpochDay(days.toLong).toString)
      case _ => None
    }
    case Bucket(n) =>
      // Spark's hash(): Murmur3 with seed 42; pmod like the writer
      val h = Murmur3Hash(Seq(Literal(v, dt)), 42).eval(null)
        .asInstanceOf[Int]
      Some((((h % n) + n) % n).toString)
    case Truncate(w) => v match {
      case l: Long => Some((l - (((l % w) + w) % w)).toString)
      case i: Int => Some((i - (((i % w) + w) % w)).toString)
      case _ => None
    }
    case Day | Month | Year =>
      val ld: Option[java.time.LocalDate] = (v, dt) match {
        case (days: Int, DateType) =>
          Some(java.time.LocalDate.ofEpochDay(days.toLong))
        case (micros: Long, TimestampType | TimestampNTZType) =>
          Some(java.time.Instant.ofEpochSecond(
            Math.floorDiv(micros, 1000000L),
            Math.floorMod(micros, 1000000L) * 1000L)
            .atZone(java.time.ZoneOffset.UTC).toLocalDate)
        case _ => None
      }
      ld.map { d =>
        t match {
          case Day => f"${d.getYear}%04d-${d.getMonthValue}%02d-" +
            f"${d.getDayOfMonth}%02d"
          case Month => f"${d.getYear}%04d-${d.getMonthValue}%02d"
          case _ => f"${d.getYear}%04d"
        }
      }
  }
}

/** See [[HiddenPartitions]]. */
object HiddenPartitionRule extends Rule[LogicalPlan] with PredicateHelper {

  private def specOf(l: LogicalRelation): Option[PartitionSpec] =
    l.catalogTable.flatMap(_.properties.get(HiddenPartitions.Prop))
      .map(SpecManifest.parseCompact)

  private def strLit(s: String): Literal =
    Literal(UTF8String.fromString(s), StringType)

  /** Is a range on the source monotone through the transform, compared
    * the way the derived predicate compares? Day/Month/Year and STRING
    * identity order lexicographically (fixed-width renders); Truncate
    * and NUMERIC identity order numerically (compared through a bigint
    * cast of the partition value). Bucket destroys order. */
  private def lexRange(t: Transform): Boolean = t match {
    case Day | Month | Year => true
    case _ => false
  }
  private def numRange(t: Transform): Boolean = t match {
    case Truncate(_) | Identity => true
    case _ => false
  }

  /** Derive a partition predicate implied by ONE leaf comparison for
    * ONE spec field, or None. */
  private def deriveLeaf(fld: graft.engine.SpecManifest.PartField,
      partAttr: Attribute, e: Expression): Option[Expression] = {
    {
      def derive(v: Any, dt: DataType): Option[String] =
        HiddenPartitions.deriveValue(fld.transform, v, dt)
          // the derived value compared the way the transform orders:
          // lexicographic on the string partition value, or numeric
          // through a bigint cast of it (see [[lexRange]]/[[numRange]])
          def bound(v: Any, dt: DataType, lo: Boolean)
              : Option[Expression] =
            derive(v, dt).flatMap { s =>
              if (lexRange(fld.transform))
                Some(if (lo) GreaterThanOrEqual(partAttr, strLit(s))
                     else LessThanOrEqual(partAttr, strLit(s)))
              else if (numRange(fld.transform))
                s.toLongOption.map { n =>
                  val castPart = Cast(partAttr, LongType)
                  if (lo) GreaterThanOrEqual(castPart, Literal(n, LongType))
                  else LessThanOrEqual(castPart, Literal(n, LongType))
                }
              // string identity: lexicographic on the value itself,
              // but only when the SOURCE is a string (numeric renders
              // break across digit counts)
              else None
            }
          def strIdentityBound(v: Any, dt: DataType, lo: Boolean)
              : Option[Expression] = (fld.transform, dt) match {
            // string identity: the value IS the partition value; date
            // identity renders ISO yyyy-MM-dd — both fixed-shape and
            // lexicographically ordered
            case (Identity, StringType) | (Identity, DateType) =>
              derive(v, dt).map { s =>
                if (lo) GreaterThanOrEqual(partAttr, strLit(s))
                else LessThanOrEqual(partAttr, strLit(s))
              }
            case _ => None
          }
          e match {
            // EQUALITY — any transform
            case EqualTo(a: AttributeReference, Literal(v, t))
                if a.name == fld.source && v != null =>
              derive(v, t).map(s => EqualTo(partAttr, strLit(s)))
            case EqualTo(Literal(v, t), a: AttributeReference)
                if a.name == fld.source && v != null =>
              derive(v, t).map(s => EqualTo(partAttr, strLit(s)))
            // IN-LIST — any transform; every literal must derive (a
            // null literal never matches affirmatively and is skipped)
            case In(a: AttributeReference, list)
                if a.name == fld.source && list.nonEmpty &&
                  list.forall(_.isInstanceOf[Literal]) =>
              val lits = list.collect {
                case Literal(v, t) if v != null => (v, t) }
              val vals = lits.map { case (v, t) => derive(v, t) }
              if (lits.nonEmpty && vals.forall(_.isDefined))
                Some(In(partAttr, vals.flatten.distinct.map(strLit)))
              else None
            // a large IN is already an InSet by the time the last
            // optimizer batch runs (OptimizeIn) — same derivation over
            // the internal-typed value set
            case InSet(a: AttributeReference, hset)
                if a.name == fld.source && hset.nonEmpty =>
              val vals = hset.toSeq.filter(_ != null)
                .map(v => derive(v, a.dataType))
              if (vals.nonEmpty && vals.forall(_.isDefined))
                Some(In(partAttr, vals.flatten.distinct.sorted.map(strLit)))
              else None
            // INCLUSIVE RANGE PROJECTION — order-preserving transforms
            // only; strict bounds project inclusively (conservative)
            case GreaterThanOrEqual(a: AttributeReference, Literal(v, t))
                if a.name == fld.source && v != null =>
              bound(v, t, lo = true).orElse(strIdentityBound(v, t, true))
            case GreaterThan(a: AttributeReference, Literal(v, t))
                if a.name == fld.source && v != null =>
              bound(v, t, lo = true).orElse(strIdentityBound(v, t, true))
            case LessThanOrEqual(a: AttributeReference, Literal(v, t))
                if a.name == fld.source && v != null =>
              bound(v, t, lo = false).orElse(strIdentityBound(v, t, false))
            case LessThan(a: AttributeReference, Literal(v, t))
                if a.name == fld.source && v != null =>
              bound(v, t, lo = false).orElse(strIdentityBound(v, t, false))
            // flipped literal-first comparisons
            case GreaterThanOrEqual(Literal(v, t), a: AttributeReference)
                if a.name == fld.source && v != null =>
              bound(v, t, lo = false).orElse(strIdentityBound(v, t, false))
            case GreaterThan(Literal(v, t), a: AttributeReference)
                if a.name == fld.source && v != null =>
              bound(v, t, lo = false).orElse(strIdentityBound(v, t, false))
            case LessThanOrEqual(Literal(v, t), a: AttributeReference)
                if a.name == fld.source && v != null =>
              bound(v, t, lo = true).orElse(strIdentityBound(v, t, true))
            case LessThan(Literal(v, t), a: AttributeReference)
                if a.name == fld.source && v != null =>
              bound(v, t, lo = true).orElse(strIdentityBound(v, t, true))
            case _ => None
          }
    }
  }

  /** RECURSIVE inclusive projection of a whole predicate tree onto the
    * partition fields (Iceberg's Projections.inclusive): a leaf
    * comparison derives the conjunction of every field's implication;
    * AND projects partially (either side's derivation is sound alone);
    * OR projects only when BOTH branches derive (a row satisfying the
    * original satisfies one branch, hence that branch's derivation,
    * hence the derived OR); anything else derives nothing. */
  private def projectPred(spec: PartitionSpec,
      fieldAttr: Map[String, Attribute],
      e: Expression): Option[Expression] = e match {
    case And(l, r) =>
      (projectPred(spec, fieldAttr, l), projectPred(spec, fieldAttr, r))
      match {
        case (Some(a), Some(b)) => Some(And(a, b))
        case (a, b) => a.orElse(b)
      }
    case Or(l, r) =>
      for {
        a <- projectPred(spec, fieldAttr, l)
        b <- projectPred(spec, fieldAttr, r)
      } yield Or(a, b)
    case leaf =>
      spec.fields.flatMap(fld => fieldAttr.get(fld.name)
        .flatMap(pa => deriveLeaf(fld, pa, leaf)))
        .reduceOption(And)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, l: LogicalRelation) if specOf(l).isDefined =>
      val spec = specOf(l).get
      val fieldAttr: Map[String, Attribute] = spec.fields.flatMap(fld =>
        l.output.find(_.name == fld.name).map(fld.name -> _)).toMap
      val conjuncts = splitConjunctivePredicates(cond)
      projectPred(spec, fieldAttr, cond) match {
        case Some(derived) =>
          // add only the MISSING conjuncts of the derivation: an
          // And-shaped derived compared whole against the split
          // conjuncts would never match, and the fixed-point batch
          // would re-add it every iteration up to the iteration cap —
          // a planning-time explosion (duplicated predicate trees),
          // caught by the sf1 bench regression
          val parts = splitConjunctivePredicates(derived)
            .filterNot(p => conjuncts.exists(_.semanticEquals(p)))
          if (parts.isEmpty) f
          else Filter((conjuncts ++ parts).reduce(And), l)
        case None => f
      }
  }
}
