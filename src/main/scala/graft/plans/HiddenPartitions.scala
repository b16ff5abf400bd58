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
  * Conservative: only top-level equality conjuncts against literals
  * derive anything (an OR branch or a range on a bucketed column prunes
  * nothing — correct, bucket hashes are order-destroying); Day/Month/
  * Year derive for date/timestamp literals in UTC (the engine pins
  * spark.sql.session.timeZone=UTC); a transform evaluation that cannot
  * be reproduced exactly adds NO predicate. Added predicates are
  * checked for semantic presence first, so the rule is idempotent
  * under the fixed-point batch. */
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
    * Mirrors [[SpecManifest.PartField.derive]]. */
  private[plans] def deriveValue(t: Transform, v: Any,
      dt: DataType): Option[String] = t match {
    case Identity => Option(v).map {
      case u: UTF8String => u.toString
      case x => x.toString
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

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, l: LogicalRelation) if specOf(l).isDefined =>
      val spec = specOf(l).get
      val conjuncts = splitConjunctivePredicates(cond)
      def litOf(src: String): Option[(Any, DataType)] =
        conjuncts.collectFirst {
          case EqualTo(a: AttributeReference, Literal(v, t))
              if a.name == src && v != null => (v, t)
          case EqualTo(Literal(v, t), a: AttributeReference)
              if a.name == src && v != null => (v, t)
        }
      val derived = spec.fields.flatMap { fld =>
        for {
          partAttr <- l.output.find(_.name == fld.name)
          (v, dt) <- litOf(fld.source)
          s <- HiddenPartitions.deriveValue(fld.transform, v, dt)
          pred = EqualTo(partAttr,
            Literal(UTF8String.fromString(s), StringType))
          if !conjuncts.exists(_.semanticEquals(pred))
        } yield pred
      }
      if (derived.isEmpty) f
      else Filter((conjuncts ++ derived).reduce(And), l)
  }
}
