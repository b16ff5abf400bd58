package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.FileStats.ColStat
import graft.plans.ZoneMaps

/** Pure-function contracts of the default-read-path zone maps: bound
  * extraction is narrow and explicit, matching is conservative — every
  * doubtful case KEEPS the file (skipping may elide IO, never rows). */
class ZoneMapsSpec extends AnyFunSuite {

  private val k = AttributeReference("k", LongType)()
  private val s = AttributeReference("s", StringType)()

  test("extractBounds: attr-vs-literal in both orders, strict treated " +
      "as inclusive, conjuncts intersect") {
    val b = ZoneMaps.extractBounds(Seq(
      GreaterThanOrEqual(k, Literal(10L)),
      LessThan(k, Literal(100L)),
      LessThanOrEqual(Literal(20L), k))) // 20 <= k → lo=20
    assert(b("k").nlo.contains(20.0) && b("k").nhi.contains(100.0))
  }

  test("extractBounds: equality pins both ends; strings tracked " +
      "separately; decimals and non-range shapes ignored") {
    val d = AttributeReference("d", DecimalType(10, 2))()
    val b = ZoneMaps.extractBounds(Seq(
      EqualTo(k, Literal(42L)),
      GreaterThanOrEqual(s, Literal.create("mm", StringType)),
      EqualTo(d, Literal(Decimal("1.23"), DecimalType(10, 2))),
      IsNotNull(k)))
    assert(b("k").nlo.contains(42.0) && b("k").nhi.contains(42.0))
    assert(b("s").slo.contains("mm") && b("s").shi.isEmpty)
    assert(!b.contains("d"), "unscaled decimal stats must never be " +
      "compared against scaled literals")
  }

  test("extractBounds: a numeric-widening cast over the column still " +
      "yields a bound; any other cast is ignored") {
    val i = AttributeReference("i", IntegerType)()
    val b = ZoneMaps.extractBounds(Seq(
      GreaterThanOrEqual(Cast(i, DoubleType), Literal(3.5)),
      LessThan(Cast(s, IntegerType), Literal(7))))
    assert(b("i").nlo.contains(3.5))
    assert(!b.contains("s"))
  }

  test("extractBounds: IN-lists become their [min,max] hull (In and " +
      "post-OptimizeIn InSet), null members are skipped, mixed or " +
      "non-literal lists derive nothing") {
    val b = ZoneMaps.extractBounds(Seq(
      In(k, Seq(Literal(30L), Literal(12L), Literal(25L)))))
    assert(b("k").nlo.contains(12.0) && b("k").nhi.contains(30.0))
    // a null member never matches affirmatively: hull of the rest
    val b2 = ZoneMaps.extractBounds(Seq(
      In(k, Seq(Literal(5L), Literal.create(null, LongType)))))
    assert(b2("k").nlo.contains(5.0) && b2("k").nhi.contains(5.0))
    // string IN
    val b3 = ZoneMaps.extractBounds(Seq(In(s,
      Seq(Literal.create("pq", StringType), Literal.create("ab", StringType)))))
    assert(b3("s").slo.contains("ab") && b3("s").shi.contains("pq"))
    // InSet carries internal-typed values
    val b4 = ZoneMaps.extractBounds(Seq(
      InSet(k, Set[Any](7L, 90L, 41L))))
    assert(b4("k").nlo.contains(7.0) && b4("k").nhi.contains(90.0))
    // a non-literal member: no bound (conservative)
    val b5 = ZoneMaps.extractBounds(Seq(In(k, Seq(Literal(1L), s))))
    assert(!b5.contains("k"))
  }

  test("extractBounds: a string prefix (LIKE 'p%') bounds to " +
      "[p, p-with-last-char-incremented], conservative at the edges") {
    val b = ZoneMaps.extractBounds(Seq(
      StartsWith(s, Literal.create("mm", StringType))))
    assert(b("s").slo.contains("mm") && b("s").shi.contains("mn"))
    // prefix ending at Char.MaxValue: only the lower bound
    val b2 = ZoneMaps.extractBounds(Seq(
      StartsWith(s, Literal.create("a" + Char.MaxValue, StringType))))
    assert(b2("s").slo.contains("a" + Char.MaxValue) &&
      b2("s").shi.isEmpty)
    // empty prefix: nothing derived
    val b3 = ZoneMaps.extractBounds(Seq(
      StartsWith(s, Literal.create("", StringType))))
    assert(!b3.contains("s"))
  }

  test("mayMatch: numeric in/out, all-null skip, unusable stats and " +
      "type mismatches keep") {
    val lo10hi20 = ZoneMaps.Bounds(nlo = Some(10.0), nhi = Some(20.0))
    assert(ZoneMaps.mayMatch(ColStat("long", Some("15"), Some("30")),
      lo10hi20))
    assert(!ZoneMaps.mayMatch(ColStat("long", Some("21"), Some("30")),
      lo10hi20))
    assert(!ZoneMaps.mayMatch(ColStat("long", Some("1"), Some("9")),
      lo10hi20))
    // all-null file: no row satisfies any range bound
    assert(!ZoneMaps.mayMatch(ColStat("long", None, None), lo10hi20))
    // unusable stats ("?") and unsupported types: keep
    assert(ZoneMaps.mayMatch(ColStat("long", Some("?"), Some("?")),
      lo10hi20))
    assert(ZoneMaps.mayMatch(ColStat("unsupported", Some("?"), Some("?")),
      lo10hi20))
    // numeric bounds against string stats: keep (cannot conclude)
    assert(ZoneMaps.mayMatch(ColStat("string", Some("a"), Some("b")),
      lo10hi20))
    // string bounds against string stats
    val sb = ZoneMaps.Bounds(slo = Some("mm"), shi = Some("pp"))
    assert(ZoneMaps.mayMatch(ColStat("string", Some("na"), Some("zz")), sb))
    assert(!ZoneMaps.mayMatch(ColStat("string", Some("qq"), Some("zz")),
      sb))
  }
}
