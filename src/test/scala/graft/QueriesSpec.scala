package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Executes every declared operator query on the sf0.001 fixtures.
  * The DuckDB hash-match runs driver-side (Verify + oracle); this suite
  * guards that each plan analyzes, executes, and stays deterministic.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  // queries that legitimately return 0 rows on the tiny fixture
  private val mayBeEmpty = Set("q11_except", "q13_not_exists_anti_join")

  SparkEntry.specs.foreach { q =>
    test(q.name) {
      val df = q.run(spark, dir)
      val n = df.count()
      if (!mayBeEmpty(q.name)) assert(n > 0, s"${q.name} returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("oracleSql keys are a subset of queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}

object TestSpark {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
