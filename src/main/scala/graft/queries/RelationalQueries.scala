package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PgFunctions
import graft.sources.Tables

/** The relational operator surface from SURVEY.md §2.2, re-expressed as
  * idiomatic DataFrame programs over the TPC-H-ish parquet fixtures.
  *
  * Each entry cites the reference packet whose SQL motivated it
  * (paths relative to /root/reference). The DuckDB oracle string mirrors
  * the semantics; aliases and ORDER BY are kept identical on both sides.
  *
  * Scale notes (100 TB posture):
  *  - small dims (`nation`, `region`, bucket grids) are explicitly
  *    `broadcast()` so the multiway joins never shuffle the fact table
  *    more than once;
  *  - top-k is always `orderBy(...).limit(k)` which Spark plans as
  *    TakeOrderedAndProject (no global sort materialization);
  *  - aggregates are plain `groupBy` — partial aggregation (map-side
  *    combine) applies; no driver-side `collect` anywhere.
  */
object RelationalQueries {

  private def dec(c: Column): Column = c.cast(QuerySpec.Dec)

  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")
  private def ord(s: SparkSession, dir: String) = Tables.load(s, dir, "orders")
  private def cust(s: SparkSession, dir: String) = Tables.load(s, dir, "customer")
  private def nat(s: SparkSession, dir: String) = Tables.load(s, dir, "nation")
  private def reg(s: SparkSession, dir: String) = Tables.load(s, dir, "region")
  private def sup(s: SparkSession, dir: String) = Tables.load(s, dir, "supplier")
  private def prt(s: SparkSession, dir: String) = Tables.load(s, dir, "part")
  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  val specs: Seq[QuerySpec] = Seq(

    // ---- Aggregation --------------------------------------------------
    // TPC-H Q1 shape; reference agg surface: packets/alert_bloat/01_step.sql:36-61
    QuerySpec("q01_agg_pricing_summary", (s, dir) => {
      import s.implicits._
      li(s, dir)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum(dec($"l_quantity")).cast("double").as("sum_qty"),
          sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .cast("double").as("sum_disc_price"),
          (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }, oracle = Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""), bench = true),

    // ---- Multiway join (6-way catalog joins: alert_bloat/01_step.sql:20-26)
    QuerySpec("q02_join_revenue_by_nation", (s, dir) => {
      import s.implicits._
      cust(s, dir)
        .join(ord(s, dir), $"c_custkey" === $"o_custkey")
        .join(li(s, dir), $"o_orderkey" === $"l_orderkey")
        .join(broadcast(nat(s, dir)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg(s, dir)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(
          sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name", $"n_name")
    }, oracle = Some("""
      SELECT r_name, n_name,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        count(*) AS n_items
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""), bench = true),

    // ---- Left outer join (alert_stat/01_step.sql:9)
    QuerySpec("q03_join_left_outer", (s, dir) => {
      import s.implicits._
      cust(s, dir)
        .join(ord(s, dir).filter($"o_orderstatus" === "P"),
          $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_pending"),
          coalesce(sum(dec($"o_totalprice")).cast("double"), lit(0.0)).as("pending_total"))
        .orderBy($"c_custkey")
    }, oracle = Some("""
      SELECT c_custkey, count(o_orderkey) AS n_pending,
        coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS pending_total
      FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
        ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""")),

    // ---- Nested top-k (dba_top_tables/01_step.sql:29-56: limit 50 → re-sort → limit 30)
    QuerySpec("q04_topk_nested_limit", (s, dir) => {
      import s.implicits._
      ord(s, dir)
        .select($"o_orderkey", $"o_orderdate", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .limit(50)
        .orderBy($"o_orderdate", $"o_orderkey")
        .limit(30)
    }, oracle = Some("""
      SELECT * FROM (
        SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 50)
      ORDER BY o_orderdate, o_orderkey LIMIT 30"""), bench = true),

    // ---- Window: row_number (test_common/02_gen_obj.sql:16-25)
    QuerySpec("q05_window_row_number", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")
      li(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter($"rn" <= 2)
        .select($"l_orderkey", $"l_linenumber", $"rn")
        .orderBy($"l_orderkey", $"l_linenumber")
    }, oracle = Some("""
      SELECT l_orderkey, l_linenumber, rn FROM (
        SELECT l_orderkey, l_linenumber,
          row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber) AS rn
        FROM lineitem) WHERE rn <= 2
      ORDER BY l_orderkey, l_linenumber"""), bench = true),

    // ---- Window: running frame (extension beyond corpus; frames available)
    QuerySpec("q06_window_running_sum", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li(s, dir)
        .withColumn("running_qty", sum(dec($"l_quantity")).over(w).cast("double"))
        .select($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber", $"running_qty")
        .orderBy($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber")
    }, oracle = Some("""
      SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER (
          PARTITION BY l_suppkey
          ORDER BY l_shipdate, l_orderkey, l_linenumber
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      FROM lineitem
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""")),

    // ---- Window: lag/lead (extension)
    QuerySpec("q07_window_lag", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      ord(s, dir)
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"prev_price")
        .orderBy($"o_custkey", $"o_orderkey")
    }, oracle = Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
        lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price
      FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ---- Set ops (test_gens/01_gen_nsp.sql:2-6 UNION; dba_idx_diag/07_step.sql:19 UNION ALL)
    QuerySpec("q08_union_distinct", (s, dir) => {
      import s.implicits._
      cust(s, dir).select($"c_nationkey".as("k"))
        .union(sup(s, dir).select($"s_nationkey".as("k")))
        .distinct()
        .orderBy($"k")
    }, oracle = Some("""
      SELECT c_nationkey AS k FROM customer
      UNION SELECT s_nationkey FROM supplier ORDER BY k""")),

    QuerySpec("q09_union_all_counts", (s, dir) => {
      import s.implicits._
      cust(s, dir).select($"c_nationkey".as("k"))
        .unionAll(sup(s, dir).select($"s_nationkey".as("k")))
        .groupBy($"k").agg(count(lit(1)).as("cnt"))
        .orderBy($"k")
    }, oracle = Some("""
      SELECT k, count(*) AS cnt FROM (
        SELECT c_nationkey AS k FROM customer
        UNION ALL SELECT s_nationkey FROM supplier)
      GROUP BY k ORDER BY k""")),

    QuerySpec("q10_intersect", (s, dir) => {
      import s.implicits._
      cust(s, dir).select($"c_nationkey".as("k"))
        .intersect(sup(s, dir).select($"s_nationkey".as("k")))
        .orderBy($"k")
    }, oracle = Some("""
      SELECT c_nationkey AS k FROM customer
      INTERSECT SELECT s_nationkey FROM supplier ORDER BY k""")),

    QuerySpec("q11_except", (s, dir) => {
      import s.implicits._
      nat(s, dir).select($"n_nationkey".as("k"))
        .except(sup(s, dir).select($"s_nationkey".as("k")))
        .orderBy($"k")
    }, oracle = Some("""
      SELECT n_nationkey AS k FROM nation
      EXCEPT SELECT s_nationkey FROM supplier ORDER BY k""")),

    // ---- Multiset set ops: INTERSECT ALL / EXCEPT ALL — the bag
    // semantics q10/q11 don't cover (per-value multiplicity = min /
    // difference of the two sides' counts). Spark plans both as a
    // count-comparing aggregate, not a distinct — no row explosion,
    // same shuffle shape as a groupBy.
    QuerySpec("q51_multiset_ops", (s, dir) => {
      import s.implicits._
      val a = li(s, dir).filter($"l_quantity" > 45)
        .select($"l_suppkey".as("k"))
      val b = li(s, dir).filter($"l_discount" > 0.05)
        .select($"l_suppkey".as("k"))
      a.intersectAll(b).withColumn("op", lit("intersect"))
        .unionByName(a.exceptAll(b).withColumn("op", lit("except")))
        .orderBy($"op", $"k")
    }, oracle = Some("""
      SELECT k, 'intersect' AS op FROM (
        SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45
        INTERSECT ALL
        SELECT l_suppkey FROM lineitem WHERE l_discount > 0.05)
      UNION ALL
      SELECT k, 'except' AS op FROM (
        SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45
        EXCEPT ALL
        SELECT l_suppkey FROM lineitem WHERE l_discount > 0.05)
      ORDER BY op, k""")),

    // ---- Deterministic argmax: max over a (value, tiebreak) struct.
    // Bare max_by is underdetermined on ties; lexicographic struct max
    // totalizes the choice identically on both engines — one aggregate
    // instead of a window + filter, so map-side partial aggregation
    // applies (the window formulation shuffles every row).
    QuerySpec("q57_argmax_struct", (s, dir) => {
      import s.implicits._
      ord(s, dir).groupBy($"o_custkey")
        .agg(max(struct($"o_totalprice".as("p"), $"o_orderkey".as("k")))
          .as("m"))
        .select($"o_custkey", $"m.k".as("top_order"),
          $"m.p".as("top_price"))
        .orderBy($"o_custkey")
    }, oracle = Some("""
      SELECT o_custkey,
        max(struct_pack(p := o_totalprice, k := o_orderkey)).k AS top_order,
        max(struct_pack(p := o_totalprice, k := o_orderkey)).p AS top_price
      FROM orders GROUP BY o_custkey ORDER BY o_custkey""")),

    // ---- IGNORE NULLS window navigation: the gap-filling idiom
    // (last observation carried forward). Sparse observations — only
    // 'purchase' events carry a meaningful value here — are smeared
    // forward per user with last_value(...) IGNORE NULLS; lead/lag
    // with IGNORE NULLS skip over the gaps entirely. Both engines
    // implement the ANSI semantics; ties broken by event_id for a
    // total frame order.
    QuerySpec("q56_ignore_nulls_window", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      ev(s, dir).filter($"user_id" < 50)
        .select($"user_id", $"event_id", $"ts",
          when($"event_type" === "purchase", $"value").as("v"))
        .select($"user_id", $"event_id",
          last($"v", ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("locf"),
          lag($"v", 1, null, ignoreNulls = true).over(w).as("prev_obs"))
        .orderBy($"user_id", $"event_id")
    }, oracle = Some("""
      WITH base AS (
        SELECT user_id, event_id, ts,
          CASE WHEN event_type = 'purchase' THEN value END AS v
        FROM events WHERE user_id < 50)
      SELECT user_id, event_id,
        last_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
        lag(v, 1 IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, event_id) AS prev_obs
      FROM base ORDER BY user_id, event_id""")),

    // ---- Generator NULL semantics: explode vs explode_outer. The
    // inner generator DROPS rows whose array is empty; the outer form
    // keeps them with NULL — the LEFT JOIN LATERAL distinction, and
    // the difference between losing short docs silently and keeping
    // them auditable in a tokenization pass.
    QuerySpec("q55_explode_outer", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .filter($"doc_id" < 30)
        // plant empty-token docs: text stripped to whitespace
        .select($"doc_id",
          when($"doc_id" % 10 === 0, lit("")).otherwise($"text").as("text"))
        .select($"doc_id",
          array_remove(split(trim($"text"), "\\s+"), "").as("toks"))
      val inner = docs.select($"doc_id", explode($"toks").as("tok"))
        .groupBy($"doc_id").agg(count(lit(1)).as("n"))
      val outer = docs.select($"doc_id", explode_outer($"toks").as("tok"))
        .groupBy($"doc_id").agg(count($"tok").as("n"))
      outer.withColumnRenamed("n", "n_outer")
        .join(inner.withColumnRenamed("n", "n_inner"), Seq("doc_id"), "left")
        .select($"doc_id", $"n_outer", coalesce($"n_inner", lit(-1L)).as("n_inner"))
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH docs AS (
        SELECT doc_id,
          list_filter(string_split_regex(trim(
            CASE WHEN doc_id % 10 = 0 THEN '' ELSE text END), '\s+'),
            t -> t <> '') AS toks
        FROM documents WHERE doc_id < 30),
      inner_g AS (
        SELECT doc_id, count(*) AS n_inner
        FROM (SELECT doc_id, unnest(toks) AS tok FROM docs)
        GROUP BY doc_id),
      outer_g AS (
        SELECT d.doc_id, count(u.tok) AS n_outer
        FROM docs d LEFT JOIN
          (SELECT doc_id, unnest(toks) AS tok FROM docs) u
          ON u.doc_id = d.doc_id
        GROUP BY d.doc_id)
      SELECT o.doc_id, o.n_outer,
        coalesce(i.n_inner, -1) AS n_inner
      FROM outer_g o LEFT JOIN inner_g i ON i.doc_id = o.doc_id
      ORDER BY o.doc_id""")),

    // ---- ANSI-safe error handling: the try_* family. The engine runs
    // ANSI mode (Spark 4 default) where overflow/bad-cast/div-zero
    // THROW — these are the row-local escape hatches that turn each
    // failure into NULL instead of killing a 100 TB job at one bad row.
    // Oracle: TRY_CAST plus CASE twins for the arithmetic (DuckDB
    // errors on int div-zero too).
    QuerySpec("q54_try_functions", (s, dir) => {
      import s.implicits._
      li(s, dir).filter($"l_orderkey" <= 100)
        .select($"l_orderkey", $"l_linenumber".cast("long").as("line_no"),
          $"l_quantity", $"l_partkey")
        .select($"l_orderkey", $"line_no",
          try_divide($"l_quantity", $"line_no" - 1).as("per_prior_line"),
          expr("try_cast(cast(l_partkey * 100000000000L AS string) AS int)")
            .as("overflow_int"),
          expr("try_cast(concat('x', l_partkey) AS bigint)").as("bad_cast"),
          try_element_at(array($"l_quantity"), lit(2)).as("oob"))
        .orderBy($"l_orderkey", $"line_no")
    }, oracle = Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
        CASE WHEN l_linenumber - 1 = 0 THEN NULL
             ELSE l_quantity / (l_linenumber - 1) END AS per_prior_line,
        TRY_CAST(CAST(l_partkey * 100000000000 AS VARCHAR) AS INTEGER)
          AS overflow_int,
        TRY_CAST('x' || CAST(l_partkey AS VARCHAR) AS BIGINT) AS bad_cast,
        CAST(NULL AS DOUBLE) AS oob
      FROM lineitem WHERE l_orderkey <= 100
      ORDER BY l_orderkey, line_no""")),

    // ---- Collation-aware grouping and comparison (Spark 4 collations):
    // case-diverse variants of the region names grouped and filtered
    // under UTF8_LCASE without lower()-mangling the data — the
    // collation lives in the COMPARISON, not the values (DuckDB twin:
    // COLLATE NOCASE). Representative = binary min, deterministic on
    // both engines — and robust to the one variant the engines render
    // differently (initcap title-cases every word, the oracle's
    // ucfirst only the first; both fold into the same NOCASE group and
    // neither can beat the all-caps original at binary min).
    QuerySpec("q53_collation", (s, dir) => {
      import s.implicits._
      val names = Tables.load(s, dir, "region").select($"r_name")
      val variants = names
        .unionByName(names.select(lower($"r_name").as("r_name")))
        .unionByName(names.select(initcap(lower($"r_name")).as("r_name")))
      variants
        .groupBy(collate($"r_name", "UTF8_LCASE").as("k"))
        .agg(min($"r_name").as("name"), count(lit(1)).as("n"),
          max((collate($"r_name", "UTF8_LCASE") === lit("africa"))
            .cast("int")).cast("boolean").as("is_africa"))
        .select($"name", $"n", $"is_africa")
        .orderBy($"name")
    }, oracle = Some("""
      WITH variants AS (
        SELECT r_name FROM region
        UNION ALL SELECT lower(r_name) FROM region
        UNION ALL SELECT upper(substr(lower(r_name), 1, 1)) ||
          substr(lower(r_name), 2) FROM region)
      SELECT min(r_name) AS name, count(*) AS n,
        max(CASE WHEN r_name = 'africa' COLLATE NOCASE
          THEN 1 ELSE 0 END) = 1 AS is_africa
      FROM variants
      GROUP BY r_name COLLATE NOCASE
      ORDER BY name""")),

    // ---- Semi/anti join = EXISTS / NOT EXISTS
    // (alert_check_autovacuum/01_step.sql:5-7; dedup anti-join dbccore.py:942-951)
    QuerySpec("q12_exists_semi_join", (s, dir) => {
      import s.implicits._
      cust(s, dir)
        .join(ord(s, dir).filter($"o_orderstatus" === "F"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }, oracle = Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      ORDER BY c_custkey""")),

    QuerySpec("q13_not_exists_anti_join", (s, dir) => {
      import s.implicits._
      cust(s, dir)
        .join(ord(s, dir), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    }, oracle = Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      ORDER BY c_custkey""")),

    // ---- Scalar subquery (alert_bloat/01_step.sql:14)
    QuerySpec("q14_scalar_subquery", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT p_partkey, p_name, p_retailprice FROM part
        WHERE p_retailprice > (
          SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM part)
        ORDER BY p_partkey""")
    }, oracle = Some("""
      SELECT p_partkey, p_name, p_retailprice FROM part
      WHERE p_retailprice > (
        SELECT CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM part)
      ORDER BY p_partkey""")),

    // ---- LATERAL join (dba_idx_diag/06_step.sql:30-41)
    QuerySpec("q15_lateral_topn_per_group", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
        FROM nation n
        JOIN LATERAL (
          SELECT c_custkey, c_name, c_acctbal FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        ORDER BY n.n_name, t.c_custkey""")
    }, oracle = Some("""
      SELECT n.n_name, t.c_custkey, t.c_name, t.c_acctbal
      FROM nation n
      JOIN LATERAL (
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t ON true
      ORDER BY n.n_name, t.c_custkey""")),

    // ---- Null-safe equality (dba_locks/01_step.sql:11-19 IS NOT DISTINCT FROM)
    QuerySpec("q16_null_safe_eq_join", (s, dir) => {
      import s.implicits._
      val a = nat(s, dir).select($"n_nationkey".as("a_key"),
        nullif($"n_regionkey", lit(0)).as("a_reg"))
      val b = nat(s, dir).select($"n_nationkey".as("b_key"),
        nullif($"n_regionkey", lit(0)).as("b_reg"))
      a.join(b, $"a_reg" <=> $"b_reg" && $"a_key" < $"b_key")
        .select($"a_key", $"b_key")
        .orderBy($"a_key", $"b_key")
    }, oracle = Some("""
      SELECT a.a_key, b.b_key
      FROM (SELECT n_nationkey AS a_key, nullif(n_regionkey, 0) AS a_reg FROM nation) a
      JOIN (SELECT n_nationkey AS b_key, nullif(n_regionkey, 0) AS b_reg FROM nation) b
        ON a.a_reg IS NOT DISTINCT FROM b.b_reg AND a.a_key < b.b_key
      ORDER BY a_key, b_key""")),

    // ---- CASE WHEN bucketing (alert_bloat/02_step.sql:30-31; dba_long_queries/01_step.sql:7-14)
    QuerySpec("q17_case_when_bands", (s, dir) => {
      import s.implicits._
      ord(s, dir)
        .withColumn("band",
          when($"o_totalprice" < 1000, "small")
            .when($"o_totalprice" < 10000, "medium")
            .when($"o_totalprice" < 100000, "large")
            .otherwise("huge"))
        .groupBy($"band")
        .agg(count(lit(1)).as("cnt"),
          sum(dec($"o_totalprice")).cast("double").as("total"))
        .orderBy($"band")
    }, oracle = Some("""
      SELECT CASE WHEN o_totalprice < 1000 THEN 'small'
                  WHEN o_totalprice < 10000 THEN 'medium'
                  WHEN o_totalprice < 100000 THEN 'large'
                  ELSE 'huge' END AS band,
        count(*) AS cnt,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1 ORDER BY band""")),

    // ---- IN / LIKE / BETWEEN predicate stack (dba_get_conf/01_step.sql:24-36 etc.)
    QuerySpec("q18_predicates_in_like_between", (s, dir) => {
      import s.implicits._
      prt(s, dir)
        .filter($"p_size".between(10, 40)
          && $"p_type".isin("STANDARD", "PROMO")
          && $"p_name".like("%o%"))
        .select($"p_partkey", $"p_name", $"p_type", $"p_size")
        .orderBy($"p_partkey")
    }, oracle = Some("""
      SELECT p_partkey, p_name, p_type, p_size FROM part
      WHERE p_size BETWEEN 10 AND 40
        AND p_type IN ('STANDARD', 'PROMO')
        AND p_name LIKE '%o%'
      ORDER BY p_partkey""")),

    // ---- Regex filter ~ (alert_bloat/02_step.sql:12; dba_top_tables/01_step.sql:53)
    QuerySpec("q19_regex_filter", (s, dir) => {
      import s.implicits._
      prt(s, dir)
        .filter($"p_name".rlike("^(red|blue) (bolt|gear)"))
        .select($"p_partkey", $"p_name")
        .orderBy($"p_partkey")
    }, oracle = Some("""
      SELECT p_partkey, p_name FROM part
      WHERE regexp_matches(p_name, '^(red|blue) (bolt|gear)')
      ORDER BY p_partkey""")),

    // ---- String function stack (dba_clone_schema/01_step.sql:145-150; md5 dbccore.py:941)
    QuerySpec("q20_string_functions", (s, dir) => {
      import s.implicits._
      cust(s, dir)
        .select(
          $"c_custkey",
          upper($"c_name").as("uname"),
          length($"c_name").cast("long").as("len"),
          substring($"c_name", 10, 9).as("numpart"),
          regexp_replace($"c_name", "^Customer#0*", "").as("trimmed"),
          concat($"c_name", lit("|"), $"c_mktsegment").as("joined"),
          md5($"c_name").as("hash"))
        .orderBy($"c_custkey")
    }, oracle = Some("""
      SELECT c_custkey, upper(c_name) AS uname, length(c_name) AS len,
        substring(c_name, 10, 9) AS numpart,
        regexp_replace(c_name, '^Customer#0*', '') AS trimmed,
        c_name || '|' || c_mktsegment AS joined,
        md5(c_name) AS hash
      FROM customer ORDER BY c_custkey""")),

    // ---- regexp_extract (fillfactor pattern, alert_bloat/01_step.sql:10)
    QuerySpec("q21_regexp_extract", (s, dir) => {
      import s.implicits._
      cust(s, dir)
        .select($"c_custkey",
          regexp_extract($"c_name", "([0-9]+)", 1).as("digits"))
        .orderBy($"c_custkey")
    }, oracle = Some("""
      SELECT c_custkey, regexp_extract(c_name, '([0-9]+)', 1) AS digits
      FROM customer ORDER BY c_custkey""")),

    // ---- date_trunc aggregation (alert_stat/01_step.sql:17-26 time math)
    QuerySpec("q22_date_trunc_monthly", (s, dir) => {
      import s.implicits._
      ord(s, dir)
        .groupBy(date_trunc("month", $"o_orderdate").as("mon"))
        .agg(count(lit(1)).as("n_orders"),
          sum(dec($"o_totalprice")).cast("double").as("total"))
        .orderBy($"mon")
    }, oracle = Some("""
      SELECT date_trunc('month', o_orderdate) AS mon,
        count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1 ORDER BY mon""")),

    // ---- JSON extraction (jsonb meta_data, actiontracker.py:45,90)
    QuerySpec("q23_json_extract", (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"))
        .orderBy($"event_type")
    }, oracle = Some("""
      SELECT event_type, count(*) AS n,
        CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- generate_series (test_int4_to_int8/02_gen_obj.sql:14,21)
    QuerySpec("q24_generate_series", (s, dir) => {
      import s.implicits._
      s.range(1, 101).select($"id", ($"id" * $"id").as("sq"))
    }, oracle = Some("""
      SELECT generate_series AS id, generate_series * generate_series AS sq
      FROM generate_series(1, 100) ORDER BY id""")),

    // ---- VALUES literal rows (test_read_only/01_step.sql:8-10)
    QuerySpec("q25_values_inline", (s, dir) => {
      import s.implicits._
      Seq((1, "alpha"), (2, "beta"), (3, "gamma"))
        .toDF("id", "v").orderBy($"id")
    }, oracle = Some("""
      SELECT * FROM (VALUES (1, 'alpha'), (2, 'beta'), (3, 'gamma')) t(id, v)
      ORDER BY id""")),

    // ---- explode/unnest (dba_clone_schema/01_step.sql:26 unnest)
    QuerySpec("q26_explode_word_counts", (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(explode(split($"text", " ")).as("word"))
        .groupBy($"word").agg(count(lit(1)).as("cnt"))
        .orderBy($"cnt".desc, $"word")
        .limit(20)
    }, oracle = Some("""
      SELECT w AS word, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w ORDER BY cnt DESC, word LIMIT 20""")),

    // ---- Range/banded join (test_int4_to_int8 grid: 02_gen_obj.sql:10-24)
    QuerySpec("q27_range_join_buckets", (s, dir) => {
      import s.implicits._
      val grid = s.range(0, 11).select(
        $"id".as("bucket"), ($"id" * 5).cast("double").as("lo"),
        (($"id" + 1) * 5).cast("double").as("hi"))
      li(s, dir)
        .join(broadcast(grid), $"l_quantity" >= $"lo" && $"l_quantity" < $"hi")
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          sum(dec($"l_quantity")).cast("double").as("qty"))
        .orderBy($"bucket")
    }, oracle = Some("""
      SELECT b.bucket, count(*) AS n,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
      FROM lineitem l
      JOIN (SELECT generate_series AS bucket,
              generate_series * 5 AS lo, (generate_series + 1) * 5 AS hi
            FROM generate_series(0, 10)) b
        ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
      GROUP BY b.bucket ORDER BY b.bucket""")),

    // ---- Array ops (@>, = any: alert_check_autovacuum/01_step.sql:7)
    QuerySpec("q28_array_ops", (s, dir) => {
      import s.implicits._
      li(s, dir)
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_set($"l_returnflag")).as("flags"))
        .filter(array_contains($"flags", "R"))
        .select($"l_orderkey",
          array_join($"flags", ",").as("flags"),
          size($"flags").cast("long").as("n_flags"))
        .orderBy($"l_orderkey")
    }, oracle = Some("""
      SELECT l_orderkey,
        array_to_string(flags, ',') AS flags, len(flags) AS n_flags
      FROM (SELECT l_orderkey, list_sort(list(DISTINCT l_returnflag)) AS flags
            FROM lineitem GROUP BY l_orderkey)
      WHERE list_contains(flags, 'R')
      ORDER BY l_orderkey""")),

    // ---- string_agg (dba_clone_schema/01_step.sql:290,326,361)
    QuerySpec("q29_string_agg", (s, dir) => {
      import s.implicits._
      sup(s, dir)
        .groupBy($"s_nationkey")
        .agg(array_join(array_sort(collect_list($"s_name")), ", ").as("names"))
        .orderBy($"s_nationkey")
    }, oracle = Some("""
      SELECT s_nationkey, string_agg(s_name, ', ' ORDER BY s_name) AS names
      FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // ---- HAVING + bool_or (dba_idx_diag/07_step.sql:18,31; alert_bloat/02_step.sql:16)
    QuerySpec("q30_having_bool_or", (s, dir) => {
      import s.implicits._
      li(s, dir)
        .groupBy($"l_partkey")
        .agg(count(lit(1)).as("cnt"),
          bool_or($"l_returnflag" === "R").as("any_returned"))
        .filter($"cnt" > 25)
        .orderBy($"l_partkey")
    }, oracle = Some("""
      SELECT l_partkey, count(*) AS cnt,
        bool_or(l_returnflag = 'R') AS any_returned
      FROM lineitem GROUP BY l_partkey HAVING count(*) > 25
      ORDER BY l_partkey""")),

    // ---- COUNT DISTINCT (actiontracker.py:22-28)
    QuerySpec("q31_count_distinct", (s, dir) => {
      import s.implicits._
      cust(s, dir)
        .groupBy($"c_mktsegment")
        .agg(countDistinct($"c_nationkey").as("n_nations"),
          count(lit(1)).as("n_cust"))
        .orderBy($"c_mktsegment")
    }, oracle = Some("""
      SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
        count(*) AS n_cust
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // ---- Pivot / conditional aggregation (extension; corpus uses CASE sums)
    QuerySpec("q32_pivot_status", (s, dir) => {
      import s.implicits._
      ord(s, dir)
        .groupBy(year($"o_orderdate").as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(dec($"o_totalprice")).cast("double"))
        .orderBy($"yr")
    }, oracle = Some("""
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
        CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
        CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
        CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
      FROM orders GROUP BY 1 ORDER BY yr""")),

    // ---- ROLLUP (extension; grouping sets native in both engines)
    QuerySpec("q33_rollup", (s, dir) => {
      import s.implicits._
      cust(s, dir)
        .rollup($"c_mktsegment", $"c_nationkey")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"c_mktsegment".asc_nulls_first, $"c_nationkey".asc_nulls_first)
    }, oracle = Some("""
      SELECT c_mktsegment, c_nationkey, count(*) AS cnt
      FROM customer GROUP BY ROLLUP (c_mktsegment, c_nationkey)
      ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""")),

    // ---- GROUPING SETS (extension; the general form q33's ROLLUP is a
    // special case of) with per-column GROUPING flags — flags rather than
    // grouping_id() because the per-column form has one unambiguous
    // cross-engine semantic (no bit-order convention to match)
    QuerySpec("q42_grouping_sets", (s, dir) => {
      import s.implicits._
      cust(s, dir)
        .groupingSets(
          Seq(Seq($"c_mktsegment"), Seq($"c_nationkey"), Seq()),
          $"c_mktsegment", $"c_nationkey")
        .agg(grouping($"c_mktsegment").cast("long").as("g_seg"),
          grouping($"c_nationkey").cast("long").as("g_nat"),
          count(lit(1)).as("cnt"))
        .select($"c_mktsegment", $"c_nationkey", $"g_seg", $"g_nat", $"cnt")
        .orderBy($"g_seg", $"g_nat",
          $"c_mktsegment".asc_nulls_first, $"c_nationkey".asc_nulls_first)
    }, oracle = Some("""
      SELECT c_mktsegment, c_nationkey,
        CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
        CAST(GROUPING(c_nationkey) AS BIGINT) AS g_nat,
        count(*) AS cnt
      FROM customer
      GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
      ORDER BY g_seg, g_nat, c_mktsegment NULLS FIRST,
        c_nationkey NULLS FIRST""")),

    // ---- CUBE (completes the grouping family: q33 ROLLUP ⊂ q42 GROUPING
    // SETS ⊂ all-subsets CUBE). One aggregation pass expands each input
    // row into the 2^n grouping combinations BEFORE the exchange — partial
    // aggregation still applies, so the shuffle carries group rows, not
    // input rows. Money sum in exact decimal (the q01 rule); GROUPING
    // flags disambiguate real NULL keys from subtotal rows.
    QuerySpec("q48_cube", (s, dir) => {
      import s.implicits._
      ord(s, dir)
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(grouping($"o_orderstatus").cast("long").as("g_st"),
          grouping($"o_orderpriority").cast("long").as("g_pr"),
          count(lit(1)).as("cnt"),
          sum($"o_totalprice".cast(QuerySpec.Dec)).cast("double").as("total"))
        .select($"o_orderstatus", $"o_orderpriority", $"g_st", $"g_pr",
          $"cnt", $"total")
        .orderBy($"g_st", $"g_pr",
          $"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }, oracle = Some("""
      SELECT o_orderstatus, o_orderpriority,
        CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_st,
        CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pr,
        count(*) AS cnt,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY g_st, g_pr, o_orderstatus NULLS FIRST,
        o_orderpriority NULLS FIRST""")),

    // ---- Ranking-function family (extension beyond q05's row_number):
    // rank/dense_rank/percent_rank/cume_dist over a TIED ordering (all
    // four are tie-deterministic; percent_rank and cume_dist are single
    // IEEE divisions of exact integers, so no rounding is needed), plus
    // ntile over a unique ordering (ntile depends on row order, so its
    // sort key must be total)
    QuerySpec("q43_ranking_family", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val tied = Window.partitionBy($"c_mktsegment").orderBy($"c_nationkey")
      val unique = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal", $"c_custkey")
      cust(s, dir)
        .select($"c_custkey", $"c_mktsegment",
          rank().over(tied).cast("long").as("rnk"),
          dense_rank().over(tied).cast("long").as("drnk"),
          percent_rank().over(tied).as("prk"),
          cume_dist().over(tied).as("cd"),
          ntile(4).over(unique).cast("long").as("tile"))
        .orderBy($"c_custkey")
    }, oracle = Some("""
      SELECT c_custkey, c_mktsegment,
        CAST(rank() OVER t AS BIGINT) AS rnk,
        CAST(dense_rank() OVER t AS BIGINT) AS drnk,
        percent_rank() OVER t AS prk,
        cume_dist() OVER t AS cd,
        CAST(ntile(4) OVER u AS BIGINT) AS tile
      FROM customer
      WINDOW t AS (PARTITION BY c_mktsegment ORDER BY c_nationkey),
             u AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      ORDER BY c_custkey""")),

    // ---- PIVOT (extension): long→wide reshape with an explicit value
    // list (no data-dependent schema — the driver's compare needs static
    // columns, and at scale an explicit list also skips Spark's extra
    // distinct-value job). Decimal-exact sums, one shuffle.
    QuerySpec("q44_pivot", (s, dir) => {
      import s.implicits._
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.load(s, dir, "events")
        .groupBy(($"user_id" % 10).as("cohort"))
        .pivot("event_type", types)
        .agg(sum($"value".cast(QuerySpec.Dec)))
        .select($"cohort" +: types.map(t =>
          col(t).cast("double").as(s"${t}_sum")): _*)
        .orderBy($"cohort")
    }, oracle = Some("""
      SELECT user_id % 10 AS cohort,
        CAST(sum(CASE WHEN event_type = 'click'
          THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click_sum,
        CAST(sum(CASE WHEN event_type = 'error'
          THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS error_sum,
        CAST(sum(CASE WHEN event_type = 'purchase'
          THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase_sum,
        CAST(sum(CASE WHEN event_type = 'signup'
          THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS signup_sum,
        CAST(sum(CASE WHEN event_type = 'view'
          THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view_sum
      FROM events GROUP BY 1 ORDER BY cohort""")),

    // ---- UNPIVOT/melt (extension): wide→long reshape — the inverse of
    // q44. Spark's native unpivot (no generator explosion); values cast
    // to a common type first, as unpivot requires.
    QuerySpec("q45_unpivot", (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(sum($"l_quantity".cast(QuerySpec.Dec)).as("q"),
          sum($"l_extendedprice".cast(QuerySpec.Dec)).as("p"))
        .select($"l_returnflag", $"q".cast("double").as("qty"),
          $"p".cast("double").as("price"))
        .unpivot(Array($"l_returnflag"), Array($"qty", $"price"),
          "measure", "val")
        .orderBy($"l_returnflag", $"measure")
    }, oracle = Some("""
      WITH base AS (
        SELECT l_returnflag,
          sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty,
          sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS price
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, 'qty' AS measure, CAST(qty AS DOUBLE) AS val
      FROM base
      UNION ALL
      SELECT l_returnflag, 'price' AS measure, CAST(price AS DOUBLE) AS val
      FROM base
      ORDER BY l_returnflag, measure""")),

    // ---- Rolling time-RANGE window (extension): per-user trailing-1-hour
    // event count and value sum — the rolling-feature computation online
    // ML pipelines batch-precompute. RANGE frame over epoch micros (both
    // engines share integer micro semantics); the sum is decimal-exact so
    // equal-timestamp frame ties cannot perturb a float fold. One shuffle
    // on user_id; the frame scan is sorted-run local.
    QuerySpec("q46_rolling_range_window", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy(unix_micros($"ts"))
        .rangeBetween(-3600000000L, 0L)
      ev(s, dir)
        .select($"event_id", $"user_id",
          count(lit(1)).over(w).as("n_1h"),
          sum(dec($"value")).over(w).cast("double").as("sum_1h"))
        .orderBy($"event_id")
    }, oracle = Some("""
      SELECT event_id, user_id,
        CAST(count(*) OVER w AS BIGINT) AS n_1h,
        CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")),

    // ---- FULL OUTER join (extension): reconcile two keyed aggregates
    // where either side may lack a key — the coverage-diff shape (which
    // nations have early customers but no early suppliers, and vice
    // versa). Nulls survive on the unmatched side; coalesce rebuilds the
    // key. Both sides pre-aggregate BEFORE the join, so the exchange
    // carries one row per key, not per fact.
    QuerySpec("q47_full_outer_join", (s, dir) => {
      import s.implicits._
      val c = cust(s, dir).filter($"c_custkey" < 30)
        .groupBy($"c_nationkey".as("nk_c"))
        .agg(count(lit(1)).as("n_cust"))
      val su = Tables.load(s, dir, "supplier").filter($"s_suppkey" < 30)
        .groupBy($"s_nationkey".as("nk_s"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(su, $"nk_c" === $"nk_s", "full_outer")
        .select(coalesce($"nk_c", $"nk_s").cast("long").as("nationkey"),
          $"n_cust", $"n_supp")
        .orderBy($"nationkey")
    }, oracle = Some("""
      WITH c AS (
        SELECT c_nationkey AS nk, count(*) AS n_cust
        FROM customer WHERE c_custkey < 30 GROUP BY 1),
      s AS (
        SELECT s_nationkey AS nk, count(*) AS n_supp
        FROM supplier WHERE s_suppkey < 30 GROUP BY 1)
      SELECT CAST(coalesce(c.nk, s.nk) AS BIGINT) AS nationkey,
        n_cust, n_supp
      FROM c FULL OUTER JOIN s ON c.nk = s.nk
      ORDER BY nationkey""")),

    // ---- Theta self-join (dba_locks/01_step.sql:10-20; lock-observer OR-join dbccore.py:189-197)
    QuerySpec("q34_theta_self_join", (s, dir) => {
      import s.implicits._
      val a = nat(s, dir).select($"n_nationkey".as("a_key"),
        $"n_name".as("a_name"), $"n_regionkey".as("a_reg"))
      val b = nat(s, dir).select($"n_nationkey".as("b_key"),
        $"n_name".as("b_name"), $"n_regionkey".as("b_reg"))
      a.join(b, $"a_reg" === $"b_reg" && $"a_key" < $"b_key")
        .select($"a_name", $"b_name")
        .orderBy($"a_name", $"b_name")
    }, oracle = Some("""
      SELECT a.n_name AS a_name, b.n_name AS b_name
      FROM nation a JOIN nation b
        ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
      ORDER BY a_name, b_name""")),

    // ---- Cross join (generator fan-out nsp × obj, dbccore.py:935-939)
    QuerySpec("q35_cross_join", (s, dir) => {
      import s.implicits._
      reg(s, dir).select($"r_name".as("a"))
        .crossJoin(reg(s, dir).select($"r_name".as("b")))
        .orderBy($"a", $"b")
    }, oracle = Some("""
      SELECT a.r_name AS a, b.r_name AS b FROM region a CROSS JOIN region b
      ORDER BY a, b""")),

    // ---- Positional GROUP BY / ORDER BY (alert_bloat/01_step.sql:60 GROUP BY 1..10)
    QuerySpec("q36_positional_group_order", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS cnt
        FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")
    }, oracle = Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS cnt
      FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ---- Chained CTEs (alert_bloat/01_step.sql:1-106 four-stage pipeline)
    QuerySpec("q37_cte_chain", (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH order_totals AS (
          SELECT l_orderkey,
            sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty,
            count(*) AS n_lines
          FROM lineitem GROUP BY l_orderkey),
        enriched AS (
          SELECT o.o_custkey, t.qty, t.n_lines FROM order_totals t
          JOIN orders o ON o.o_orderkey = t.l_orderkey),
        per_cust AS (
          SELECT o_custkey, CAST(sum(qty) AS DOUBLE) AS total_qty,
            CAST(sum(n_lines) AS BIGINT) AS total_lines
          FROM enriched GROUP BY o_custkey)
        SELECT * FROM per_cust WHERE total_lines >= 8
        ORDER BY o_custkey"""): DataFrame
    }, oracle = Some("""
      WITH order_totals AS (
        SELECT l_orderkey,
          sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty,
          count(*) AS n_lines
        FROM lineitem GROUP BY l_orderkey),
      enriched AS (
        SELECT o.o_custkey, t.qty, t.n_lines FROM order_totals t
        JOIN orders o ON o.o_orderkey = t.l_orderkey),
      per_cust AS (
        SELECT o_custkey, CAST(sum(qty) AS DOUBLE) AS total_qty,
          CAST(sum(n_lines) AS BIGINT) AS total_lines
        FROM enriched GROUP BY o_custkey)
      SELECT * FROM per_cust WHERE total_lines >= 8
      ORDER BY o_custkey"""), bench = true),

    // ---- pg_size_pretty custom expression (alert_bloat/01_step.sql:111-113)
    QuerySpec("q38_pg_size_pretty", (s, dir) => {
      import s.implicits._
      s.range(0, 40)
        .select($"id",
          (pow(lit(2.0), $"id").cast("long") * 3 + 1).as("b"))
        .select($"id", $"b", PgFunctions.pg_size_pretty($"b").as("pretty"))
        .orderBy($"id")
    }, oracle = Some("""
      SELECT id, b,
        CASE WHEN b < 10240 THEN b || ' bytes'
             WHEN b // 512 < 20479 THEN ((b // 512 + 1) // 2) || ' kB'
             WHEN b // 524288 < 20479 THEN ((b // 524288 + 1) // 2) || ' MB'
             WHEN b // 536870912 < 20479 THEN ((b // 536870912 + 1) // 2) || ' GB'
             ELSE ((b // 549755813888 + 1) // 2) || ' TB' END AS pretty
      FROM (SELECT generate_series AS id,
              CAST(power(2, generate_series) AS BIGINT) * 3 + 1 AS b
            FROM generate_series(0, 39))
      ORDER BY id""")),

    // ---- quote_ident custom expression (dba_clone_schema format('%I'))
    QuerySpec("q39_quote_ident", (s, dir) => {
      import s.implicits._
      Seq("abc", "aBc", "a b", "a\"b", "_ok9", "9bad")
        .toDF("ident")
        .select($"ident", PgFunctions.quote_ident($"ident").as("quoted"))
        .orderBy($"ident")
    }, oracle = Some("""
      SELECT ident,
        CASE WHEN regexp_matches(ident, '^[a-z_][a-z0-9_]*$') THEN ident
             ELSE '"' || replace(ident, '"', '""') || '"' END AS quoted
      FROM (SELECT unnest(['abc','aBc','a b','a"b','_ok9','9bad']) AS ident)
      ORDER BY ident""")),

    // ---- Tumbling window over events (streaming-shape agg, batch-verified)
    QuerySpec("q40_tumbling_window", (s, dir) => {
      import s.implicits._
      ev(s, dir)
        .groupBy(window($"ts", "1 hour").getField("start").as("win_start"),
          $"event_type")
        .agg(count(lit(1)).as("n"),
          sum(dec($"value")).cast("double").as("total"))
        .orderBy($"win_start", $"event_type")
    }, oracle = Some("""
      SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
        count(*) AS n,
        CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""")),

    // ---- Exact percentiles / median (linear interpolation — Spark's
    // percentile() and DuckDB's quantile_cont share the semantics)
    // rounded to 6dp: Spark's percentile and DuckDB's quantile_cont use
    // floating-point-different lerp formulas that diverge in the last ulp
    // on ~7% of interpolated inputs — same normalization convention as
    // s01's round(cos, 9)
    QuerySpec("q41_percentile_median", (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("median_qty"),
          round(expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.25)"), 6)
            .as("p25_price"),
          round(expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.75)"), 6)
            .as("p75_price"))
        .orderBy($"l_returnflag")
    }, oracle = Some("""
      SELECT l_returnflag,
        round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
        round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25), 6) AS p25_price,
        round(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75), 6) AS p75_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ---- Value-window family (completes q43's RANKING family): first /
    // last / nth over explicit frames, plus a trailing ROWS moving sum.
    // last_value needs the UNBOUNDED FOLLOWING frame (the default frame
    // stops at CURRENT ROW — the classic wrong-answer trap both engines
    // share); the moving sum is decimal-exact so partial order cannot
    // perturb low bits. One shuffle: all four windows share one
    // (partition, order) pair.
    QuerySpec("q49_value_window_family", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // l_linenumber is NOT unique inside an order in this fixture —
      // the (partkey, suppkey) tiebreak totalizes the frame order, or
      // first/last/nth answers differ run to run and engine to engine
      val w = Window.partitionBy($"l_orderkey")
        .orderBy($"l_linenumber", $"l_partkey", $"l_suppkey")
      val full = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      val trail = w.rowsBetween(-2, Window.currentRow)
      Tables.load(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber".cast("long").as("line_no"),
          $"l_partkey", $"l_suppkey",
          first($"l_quantity").over(full).as("first_qty"),
          last($"l_quantity").over(full).as("last_qty"),
          nth_value($"l_quantity", 2).over(full).as("second_qty"),
          sum($"l_extendedprice".cast(QuerySpec.Dec)).over(trail)
            .cast("double").as("trail3_price"))
        .orderBy($"l_orderkey", $"line_no", $"l_partkey", $"l_suppkey")
    }, oracle = Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
        l_partkey, l_suppkey,
        first_value(l_quantity) OVER f AS first_qty,
        last_value(l_quantity) OVER f AS last_qty,
        nth_value(l_quantity, 2) OVER f AS second_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) OVER t AS DOUBLE)
          AS trail3_price
      FROM lineitem
      WINDOW f AS (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
             t AS (PARTITION BY l_orderkey
               ORDER BY l_linenumber, l_partkey, l_suppkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY l_orderkey, line_no, l_partkey, l_suppkey""")),

    // ---- Statistical-moments family: corr / covar_samp / stddev_samp /
    // regr_slope per group. Built-in corr()/covar_samp() stream doubles
    // in partition order — their low bits depend on the merge tree, so
    // they can never hash-match an external engine. Instead: the five
    // power sums in EXACT decimal (order-independent, parallel-safe),
    // cast once to double, then one identical scalar epilogue on both
    // sides. Map-side partial aggregation applies to the sums like any
    // sum; the epilogue is per-group O(1).
    QuerySpec("q50_stats_moments", (s, dir) => {
      import s.implicits._
      val d4 = "decimal(38,4)"
      val sums = li(s, dir).groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dec($"l_quantity")).cast("double").as("sx"),
          sum(dec($"l_extendedprice")).cast("double").as("sy"),
          sum((dec($"l_quantity") * dec($"l_quantity")).cast(d4))
            .cast("double").as("sxx"),
          sum((dec($"l_extendedprice") * dec($"l_extendedprice")).cast(d4))
            .cast("double").as("syy"),
          sum((dec($"l_quantity") * dec($"l_extendedprice")).cast(d4))
            .cast("double").as("sxy"))
      sums.select($"l_returnflag", $"n",
          round(($"sx" / $"n"), 6).as("mean_qty"),
          round(sqrt(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1)), 6)
            .as("stddev_qty"),
          round((($"sxy" - $"sx" * $"sy" / $"n") / ($"n" - 1)), 6)
            .as("covar_qty_price"),
          round((($"sxy" - $"sx" * $"sy" / $"n") / ($"n" - 1)) /
            (sqrt(($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1)) *
             sqrt(($"syy" - $"sy" * $"sy" / $"n") / ($"n" - 1))), 6)
            .as("corr_qty_price"),
          round((($"sxy" - $"sx" * $"sy" / $"n") / ($"n" - 1)) /
            (($"sxx" - $"sx" * $"sx" / $"n") / ($"n" - 1)), 6)
            .as("regr_slope"))
        .orderBy($"l_returnflag")
    }, oracle = Some("""
      WITH sums AS (
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
          CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
          CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
            CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4)))
            AS DOUBLE) AS sxx,
          CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
            CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
            AS DOUBLE) AS syy,
          CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) *
            CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
            AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        round(sx / n, 6) AS mean_qty,
        round(sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS stddev_qty,
        round((sxy - sx * sy / n) / (n - 1), 6) AS covar_qty_price,
        round(((sxy - sx * sy / n) / (n - 1)) /
          (sqrt((sxx - sx * sx / n) / (n - 1)) *
           sqrt((syy - sy * sy / n) / (n - 1))), 6) AS corr_qty_price,
        round(((sxy - sx * sy / n) / (n - 1)) /
          ((sxx - sx * sx / n) / (n - 1)), 6) AS regr_slope
      FROM sums ORDER BY l_returnflag"""))
  )
}
