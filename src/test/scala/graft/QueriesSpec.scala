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

  test("c19 stat deltas render exact values (shared-text twin-bug guard)") {
    // shared-text oracle: both engines run the same SQL, so a wrong delta
    // formula would hash-match — pin computed values here instead
    val rows = SparkEntry.queries("c19_dba_stat_delta")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4), r.getString(5)))).toMap
    assert(rows("public.lineitem") == ((10572L, 600L, false, "hot")))
    assert(rows("analytics.events") == ((20000L, 0L, false, "hot")))
    // created after the snapshot: full counters count as the delta
    assert(rows("analytics.embeddings") == ((5000L, 50L, true, "hot")))
    // byte-identical snapshots pin the quiet/zero-delta branch
    assert(rows("public.customer") == ((0L, 0L, false, "quiet")))
    assert(rows("analytics.documents") == ((100L, 80L, false, "quiet")))
  }

  test("c14 clone script renders exact statements (shared-text twin-bug guard)") {
    // the DuckDB oracle runs the SAME SQL text, so a rendering bug would
    // hash-match on both sides — pin exact statements here instead
    val cdms = SparkEntry.queries("c14_dba_clone_schema")(spark, dir)
      .collect().map(_.getString(2)).toSet
    assert(cdms.contains("CREATE SCHEMA analytics_clone"))
    assert(cdms.contains(
      "CREATE UNLOGGED TABLE analytics_clone.events (LIKE analytics.events INCLUDING ALL)"))
    assert(cdms.contains(
      "ALTER SEQUENCE analytics_clone.events_id_seq OWNED BY analytics_clone.events.event_id"))
    assert(cdms.contains(
      "ALTER TABLE analytics_clone.events ALTER COLUMN event_id SET DEFAULT " +
        "nextval('analytics_clone.events_id_seq'::regclass)"))
    assert(cdms.contains(
      "ALTER TABLE analytics_clone.documents ADD CONSTRAINT documents_event_fkey " +
        "FOREIGN KEY (event_ref) REFERENCES analytics_clone.events(event_id) ON DELETE CASCADE"))
    // cross-schema FK stays untouched (REFERENCES rewrite is template-scoped)
    assert(cdms.contains(
      "ALTER TABLE analytics_clone.events ADD CONSTRAINT events_user_fkey " +
        "FOREIGN KEY (user_id) REFERENCES customer(c_custkey) ON DELETE CASCADE"))
    // privilege char → name chains, canonical acl order, PUBLIC quirk
    assert(cdms.contains(
      "GRANT INSERT, SELECT, UPDATE, DELETE, TRUNCATE, REFERENCES, TRIGGER " +
        "ON TABLE analytics_clone.events TO postgres"))
    assert(cdms.contains(
      "GRANT SELECT, UPDATE, USAGE ON SEQUENCE analytics_clone.events_id_seq TO postgres"))
    assert(cdms.contains("GRANT USAGE, CREATE ON SCHEMA analytics_clone TO postgres"))
    assert(cdms.contains("GRANT USAGE ON SCHEMA analytics_clone TO \"PUBLIC\""))
    assert(cdms.contains(
      "GRANT EXECUTE ON FUNCTION analytics_clone.fn_doc_quality(doc_id bigint) TO report_ro"))
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
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
