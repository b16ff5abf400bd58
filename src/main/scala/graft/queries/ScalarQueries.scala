package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.PgFunctions
import graft.sources.{PgCatalog, Tables}

/** Scalar-surface stragglers from SURVEY.md §2.2: age()/to_char(interval)
  * (dba_long_queries, alert_xact_age), current_setting/version
  * (dba_get_version), the pg_relation_size family (dba_top_tables),
  * pg_get_indexdef/constraintdef decompilers (dba_clone_schema), and
  * pg_wal_lsn_diff (dba_lag). Catalog-backed entries run the identical
  * text under Spark and DuckDB (PgCatalog.withCatalog); function-backed
  * entries exercise the PgFunctions implementations against independent
  * DuckDB recomputation.
  */
object ScalarQueries {

  private val SettingsSql = """
    SELECT name, setting,
      'graft' AS current_database,
      'PostgreSQL ' ||
        (SELECT setting FROM pg_settings WHERE name = 'server_version') ||
        ' (graft-spark)' AS version
    FROM pg_settings
    WHERE name IN ('work_mem', 'autovacuum', 'server_version', 'statement_timeout')
    ORDER BY name"""

  private val RelationSizesSql = """
    , idx AS (
        SELECT i.indrelid, CAST(sum(ic.relpages) AS BIGINT) * 8192 AS idx_bytes
        FROM pg_index i JOIN pg_class ic ON ic.oid = i.indexrelid
        GROUP BY i.indrelid)
    SELECT c.relname,
      CAST(c.relpages AS BIGINT) * 8192 AS pg_relation_size,
      CAST(c.relpages AS BIGINT) * 8192 AS pg_table_size,
      COALESCE(x.idx_bytes, CAST(0 AS BIGINT)) AS pg_indexes_size,
      CAST(c.relpages AS BIGINT) * 8192
        + COALESCE(x.idx_bytes, CAST(0 AS BIGINT)) AS pg_total_relation_size
    FROM pg_class c
    LEFT JOIN idx x ON x.indrelid = c.oid
    WHERE c.relkind = 'r' AND c.relnamespace IN (2200, 16500)
    ORDER BY c.relname"""

  private val GetDefsSql = """
    SELECT i.indexrelid, ic.relname AS index_name,
      i.inddef AS indexdef,
      c.conname, c.condef AS constraintdef
    FROM pg_index i
    JOIN pg_class ic ON ic.oid = i.indexrelid
    LEFT JOIN pg_constraint c ON c.conindid = i.indexrelid
    ORDER BY i.indexrelid"""

  val specs: Seq[QuerySpec] = Seq(

    // PG age(d2, d1) decomposition vs DuckDB's native age() — the borrow
    // algorithm (days borrow from the earlier date's month) must agree
    QuerySpec("x01_age_decomposition", (s, dir) => {
      import s.implicits._
      val anchor = lit(java.sql.Date.valueOf("2005-06-30"))
      Tables.load(s, dir, "orders")
        .filter($"o_orderkey" < 200)
        .select($"o_orderkey",
          PgFunctions.age_years(anchor, $"o_orderdate").as("age_years"),
          PgFunctions.age_months(anchor, $"o_orderdate").as("age_months"),
          PgFunctions.age_days(anchor, $"o_orderdate").as("age_days"))
        .orderBy($"o_orderkey")
    }, oracle = Some("""
      SELECT o_orderkey,
        CAST(date_part('year', age(DATE '2005-06-30', o_orderdate)) AS BIGINT) AS age_years,
        CAST(date_part('month', age(DATE '2005-06-30', o_orderdate)) AS BIGINT) AS age_months,
        CAST(date_part('day', age(DATE '2005-06-30', o_orderdate)) AS BIGINT) AS age_days
      FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""")),

    // to_char(interval, 'HH24:MI:SS') over event time-of-day durations
    QuerySpec("x02_interval_to_char", (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events").filter($"event_id" < 500)
      val secs = unix_timestamp($"ts") - unix_timestamp(date_trunc("DAY", $"ts"))
      ev.select($"event_id",
          PgFunctions.interval_hh24miss(secs).as("tod"))
        .orderBy($"event_id")
    }, oracle = Some("""
      SELECT event_id,
        lpad(CAST(CAST(floor(s / 3600) AS BIGINT) AS STRING), 2, '0') || ':' ||
        lpad(CAST(CAST(floor((s % 3600) / 60) AS BIGINT) AS STRING), 2, '0') || ':' ||
        lpad(CAST(CAST(s % 60 AS BIGINT) AS STRING), 2, '0') AS tod
      FROM (SELECT event_id,
              CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS s
            FROM events WHERE event_id < 500)
      ORDER BY event_id""")),

    // current_setting / current_database / version (dba_get_version,
    // dba_get_conf) over the settings catalog — shared text both sides
    QuerySpec("x03_settings_version",
      (s, _) => PgCatalog.sqlOnViews(s, SettingsSql),
      oracle = Some(PgCatalog.withCatalog(SettingsSql))),

    // pg_relation_size / pg_indexes_size / pg_total_relation_size family
    // as catalog page-count arithmetic (dba_top_tables/01_step.sql:34-40)
    QuerySpec("x04_relation_sizes",
      (s, _) => PgCatalog.sqlOnViews(s, RelationSizesSql),
      oracle = Some(PgCatalog.withCatalog(RelationSizesSql))),

    // pg_get_indexdef / pg_get_constraintdef decompilers as catalog
    // columns (dba_clone_schema/01_step.sql:110-240)
    QuerySpec("x05_get_defs",
      (s, _) => PgCatalog.sqlOnViews(s, GetDefsSql),
      oracle = Some(PgCatalog.withCatalog(GetDefsSql))),

    // pg_wal_lsn_diff over 'X/Y' hex LSN strings (dba_lag/01_step.sql:3-7):
    // Spark parses the wire strings via conv(); the oracle subtracts the
    // numeric twin columns the fixture carries — equal by construction
    QuerySpec("x06_wal_lag", (s, _) => {
      PgCatalog.ensureRegistered(s)
      s.table("pg_stat_replication")
        .select(col("pid"), col("client_addr"),
          PgFunctions.pg_wal_lsn_diff(col("sent_lsn"), col("replay_lsn"))
            .as("lag_bytes"),
          graft.functions.PgFunctions.pg_size_pretty(
            PgFunctions.pg_wal_lsn_diff(col("sent_lsn"), col("replay_lsn")))
            .as("lag_pretty"))
        .orderBy(col("pid"))
    }, oracle = Some(PgCatalog.withCatalog(s"""
      SELECT pid, client_addr,
        sent_pos - replay_pos AS lag_bytes,
        ${PortableSql.sizePretty("sent_pos - replay_pos")} AS lag_pretty
      FROM pg_stat_replication ORDER BY pid"""))),

    // format('%I.%I' / %L / %s) + oid::regclass resolution
    // (dba_idx_diag/06_step.sql:13-18 builds ANALYZE/DROP commands this
    // way; ::regclass appears in dba_top_tables/01_step.sql:53). regclass
    // = oid→relname lookup through pg_class; format parses the constant
    // fmt once on the driver into a codegen'd concat (PgFunctions.pg_format)
    QuerySpec("x07_format_regclass", (s, _) => {
      PgCatalog.ensureRegistered(s)
      val c = s.table("pg_class")
        .filter(col("relkind") === "r" && col("relnamespace").isin(2200, 16500))
      val n = s.table("pg_namespace")
        .select(col("oid").as("relnamespace"), col("nspname"))
      c.join(n, "relnamespace")
        .select(col("oid"),
          col("relname").as("regclass"),
          PgFunctions.pg_format("%I.%I", col("nspname"), col("relname"))
            .as("qualified"),
          PgFunctions.pg_format("ANALYZE %I.%I;", col("nspname"), col("relname"))
            .as("maint_cmd"),
          PgFunctions.pg_format("COMMENT ON TABLE %I.%I IS %L",
            col("nspname"), col("relname"),
            concat(lit("rows of "), col("relname"), lit("'s data")))
            .as("comment_cmd"))
        .orderBy(col("oid"))
    }, oracle = Some(PgCatalog.withCatalog("""
      SELECT c.oid, c.relname AS regclass,
        n.nspname || '.' || c.relname AS qualified,
        'ANALYZE ' || n.nspname || '.' || c.relname || ';' AS maint_cmd,
        'COMMENT ON TABLE ' || n.nspname || '.' || c.relname || ' IS ' ||
          '''' || replace('rows of ' || c.relname || '''s data', '''', '''''')
          || '''' AS comment_cmd
      FROM pg_class c JOIN pg_namespace n ON n.oid = c.relnamespace
      WHERE c.relkind = 'r' AND c.relnamespace IN (2200, 16500)
      ORDER BY c.oid""")))
  )

}
