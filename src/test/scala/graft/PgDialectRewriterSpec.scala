package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.PgDialectRewriter.{rewrite, sqlPatternToRegex}
import graft.sources.PgCatalog

/** The verbatim-PG-dialect path: reference step files run BYTE-IDENTICAL
  * through the source rewriter against the synthesized catalog. */
class PgDialectRewriterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private def run(sql: String) = {
    PgCatalog.ensureFunctionsRegistered(spark)
    spark.sql(rewrite(sql))
  }

  test("postfix casts: PG numeric→int ROUNDS where Spark CAST truncates") {
    assert(run("SELECT 3.92::integer AS x").head.getInt(0) == 4)
    assert(run("SELECT 3.2::int2 AS x").head.getShort(0) == 3.toShort)
    assert(run("SELECT '90'::int2 AS x").head.getShort(0) == 90.toShort)
    assert(run("SELECT (1+2)::bigint AS x").head.getLong(0) == 3L)
    assert(run("SELECT 7::numeric / 2 AS x").head.getDouble(0) == 3.5)
    // drop-casts: regclass/name/"char" leave the value unchanged
    assert(run("SELECT 'abc'::name AS x").head.getString(0) == "abc")
    assert(run("SELECT 'r'::\"char\" AS x").head.getString(0) == "r")
    assert(run("SELECT 16384::regclass AS x").head.getInt(0) == 16384)
    // regtype literal folds to the type oid
    assert(run("SELECT 'pg_catalog.name'::regtype AS x").head.getInt(0) == 19)
  }

  test("SQL-pattern substring with #\"…#\" capture → regexp_extract, " +
      "NULL on no-match like PG") {
    assert(sqlPatternToRegex("%fillfactor=#\"__#\"%", "#")
      == "^.*fillfactor=(..).*$")
    val r = run("SELECT coalesce(substring('fillfactor=90' from " +
      "'%fillfactor=#\"__#\"%' for '#')::int2, 100) AS f, " +
      "coalesce(substring('nothing' from " +
      "'%fillfactor=#\"__#\"%' for '#')::int2, 100) AS g").head
    assert(r.getInt(0) == 90 && r.getInt(1) == 100)
    // plain substring stays untouched
    assert(run("SELECT substring('abcdef', 2, 3) AS s").head.getString(0)
      == "bcd")
    // numeric FROM/FOR keeps PG's virtual-position semantics:
    // from 0 for 4 = positions 1..3 (3 chars), not Spark's 4
    assert(run("SELECT substring('abcdef' FROM 0 FOR 4) AS s")
      .head.getString(0) == "abc")
    assert(run("SELECT substring('abcdef' FROM 2 FOR 3) AS s")
      .head.getString(0) == "bcd")
    assert(run("SELECT substring('abcdef' FROM 0) AS s")
      .head.getString(0) == "abcdef")
  }

  test("ANY/ALL over ARRAY[…], regex matches, IS NOT DISTINCT FROM, " +
      "power, scalar wrap, string_agg, generate_series") {
    assert(run("SELECT 'r' = ANY (ARRAY['r'::\"char\", 'i'::\"char\"]) AS x")
      .head.getBoolean(0))
    assert(run("SELECT 'x' <> ALL (ARRAY['a', 'b']) AS x").head.getBoolean(0))
    assert(run("SELECT 'pg_toast_7' ~ '^pg_toast' AS a, " +
      "'public' !~ '^pg_toast'::text AS b").head ==
      org.apache.spark.sql.Row(true, true))
    assert(run("SELECT NULL IS NOT DISTINCT FROM NULL AS x")
      .head.getBoolean(0))
    assert(run("SELECT (1024^2) AS x").head.getDouble(0) == 1048576.0)
    assert(run("SELECT (SELECT pg_get_constraintdef(18002)) AS d")
      .head.getString(0) == "PRIMARY KEY (o_orderkey)")
    assert(run("SELECT string_agg(c, ',') AS s FROM (VALUES ('a'), ('b')) " +
      "AS t(c)").head.getString(0) == "a,b")
    assert(run("SELECT generate_series(1, 3) AS i").count() == 3L)
  }

  test("catalog-backed functions agree with the fixture arithmetic") {
    PgCatalog.ensureFunctionsRegistered(spark)
    val r = spark.sql("""SELECT pg_table_size(16384) AS t,
      pg_indexes_size(16384) AS i, pg_total_relation_size(16384) AS tot,
      pg_get_indexdef(17003) AS d1,
      pg_get_indexdef(17001, 4, TRUE) AS d3,
      current_setting('block_size') AS bs""").head
    assert(r.getLong(0) == 12000L * 8192)
    assert(r.getLong(1) == (4500L + 8000L) * 8192)
    assert(r.getLong(2) == (12000L + 4500 + 8000) * 8192)
    assert(r.getString(3).startsWith("CREATE UNIQUE INDEX orders_pkey"))
    assert(r.getString(4) == "l_linenumber")
    assert(r.getString(5) == "8192")
  }

  test("dba_top_tables/01_step.sql runs BYTE-IDENTICAL and returns the " +
      "fixture's tables largest-first") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/packets/dba_top_tables/01_step.sql"))
    val out = run(sql).collect()
    // 9 tables since events_archive (the round-14 indexless fixture
    // table) joined the catalog
    assert(out.length == 9, s"${out.length} rows")
    // largest total = lineitem (12000 heap + 12500 index pages)
    val top = run(sql).head
    assert(top.getString(1) == "lineitem", top.toString)
    assert(top.getString(4) ==
      graft.functions.PgStringFns.sizePretty((12000L + 12500L) * 8192))
    val cols = run(sql).columns.toSeq
    assert(cols == Seq("nspname", "relname", "size", "idxs_size", "total",
      "n_live_tup", "n_dead_tup", "n_tup_ins", "n_tup_upd"), cols)
  }

  test("alert_bloat/01_step.sql runs BYTE-IDENTICAL: the two " +
      "deliberately-bloated btree indexes and only they cross the gates") {
    val sql = java.nio.file.Files.readString(java.nio.file.Paths.get(
      "/root/reference/packets/alert_bloat/01_step.sql"))
    val out = run(sql).collect()
    val names = out.map(_.getString(2)).toSet
    assert(names == Set("lineitem_shipdate_idx", "events_ts_idx"), names)
    val byName = out.map(r => r.getString(2) -> r).toMap
    // lineitem_shipdate_idx: nulldatawidth 3.92 ROUNDS to 4 under the PG
    // numeric→int cast (a bare Spark cast would truncate to 3 and shift
    // the estimate) → inner width 15.92, expected =
    // ceil(600572*15.92/8168 + 1) = 1172 pages, bloat = 6828*100/8000
    val li = byName("lineitem_shipdate_idx")
    assert(li.getDouble(3) == 85.35, li.toString)
    assert(li.getString(4) ==
      graft.functions.PgStringFns.sizePretty(8192L * (8000 - 1172)))
    assert(li.getInt(7) == 100) // no fillfactor option → default 100
    val ev = byName("events_ts_idx")
    assert(ev.getDouble(3) == 80.19, ev.toString)
    assert(ev.getInt(7) == 70) // fillfactor=70 extracted from reloptions
  }

  test("round-14 rules: pinned now()/pg_backend_pid(), xid/mxid age " +
      "wraparound, two-arg age → interval, interval-literal coercion, " +
      "date_trunc('milliseconds')/to_char interval rendering, format → " +
      "format_string, version() whole-item alias") {
    // now() pins to the snapshot instant (deterministic, oracle-replayable)
    assert(run("SELECT now() AS t").head.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-01-01 10:05:00"))
    assert(run("SELECT pg_backend_pid() AS p").head.getInt(0) == 999)
    // age(xid): mod-2^32 distance from pinned xid 9100 — a recent xid
    // ages to a small number, a pre-wrap frozen xid to ~1.5e9
    assert(run("SELECT age(9001) AS age").head.getLong(0) == 99L)
    assert(run("SELECT age(2800000000) AS age").head.getLong(0)
      == 1494976396L)
    assert(run("SELECT mxid_age(4000) AS mxid_age").head.getLong(0)
      == 1000L)
    // whole-item alias: PG names `select age(x)` simply 'age'
    assert(run("SELECT age(9001) FROM (SELECT 1)").columns.head == "age")
    // two-arg age compares against interval literals (PG coerces the
    // string; Spark needs the rewriter's typed INTERVAL)
    val r = run("SELECT age(now(), TIMESTAMP '2023-12-01') > '15 days' " +
      "AS a, age(now(), TIMESTAMP '2023-12-31') > '15 days' AS b").head
    assert(r.getBoolean(0) && !r.getBoolean(1))
    assert(run("SELECT (now() - TIMESTAMP '2024-01-01 10:04:59') >= " +
      "'00:00:00.000001' AS x").head.getBoolean(0))
    // PG interval text rendering at the two verbatim call sites
    assert(run("SELECT date_trunc('milliseconds', now() - " +
      "TIMESTAMP '2024-01-01 10:00:05') AS a").head.getString(0)
      == "00:04:55")
    assert(run("SELECT to_char(now() - TIMESTAMP '2024-01-01 10:00:31', " +
      "'HH12:MI:SS.MS') AS a").head.getString(0) == "12:04:29.000")
    // timestamp-field date_trunc stays Spark-native
    assert(run("SELECT date_trunc('MONTH', TIMESTAMP '2024-03-15') AS m")
      .head.getTimestamp(0) ==
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
    // format → format_string (PG %s = Java %s for the corpus's args)
    assert(run("SELECT format('%s-%s', 1, 'a') AS f").head.getString(0)
      == "1-a")
    assert(run("SELECT version()").columns.head == "version")
  }

  test("int2vector surface: subscripts, ANY(), format %I expansion, " +
      "array_agg(distinct) PG rendering, whole-item function naming") {
    // indkey[N] is a 0-based subscript over the wire-text vector;
    // out-of-range reads NULL exactly like PG
    val r = run("SELECT i.indkey[0] AS k0, i.indkey[1] AS k1, " +
      "i.indkey[3] AS k3 FROM pg_index i WHERE i.indexrelid = 17001").head
    assert(r.getInt(0) == 1 && r.getInt(1) == 4 && r.isNullAt(2), r)
    // attnum = any(indkey) over the vector text
    assert(run("SELECT count(1) AS n FROM pg_index i WHERE " +
      "4 = any(i.indkey)").head.getLong(0) == 2) // lineitem_pkey + composite
    // format with %I expands to quote_ident concat at rewrite time
    assert(run("SELECT format('CREATE INDEX ON %I.%I (%I)', 'public', " +
      "'Orders', 'o_custkey') AS d").head.getString(0)
      == "CREATE INDEX ON public.\"Orders\" (o_custkey)")
    // array_agg(distinct) renders PG's '{a,b}' text over a SORTED set
    assert(run("SELECT array_agg(distinct relname) AS idxs FROM pg_index " +
      "i JOIN pg_class ci ON ci.oid = i.indexrelid WHERE " +
      "i.indrelid = 16385 AND i.indkey = '2'").head.getString(0)
      == "{orders_custkey_idx,orders_custkey_idx2}")
    // PG names an unaliased whole-item call after the FUNCTION — at the
    // top level only (argument/subquery positions keep Spark naming)
    assert(run("SELECT pg_get_indexdef(17003) FROM (SELECT 1)")
      .columns.head == "pg_get_indexdef")
    assert(run("SELECT count(1) FROM pg_index").columns.head == "count")
  }
}
