package graft.sources

import org.apache.spark.sql.SparkSession

/** Deterministic synthesized pg_catalog fixture (FIXTURES.md §A8).
  *
  * The reference's alert_/dba_ packets read `pg_class`, `pg_namespace`,
  * `pg_index`, `pg_attribute`, `pg_stats`, `pg_am`, `pg_constraint`,
  * `pg_stat_all_tables`, `pg_stat_user_indexes`, `pg_locks`,
  * `pg_stat_activity`, `pg_settings` (SURVEY.md §2.2 catalog-scan row; e.g.
  * /root/reference/packets/alert_bloat/01_step.sql:18-26,
  * /root/reference/packets/dba_locks/01_step.sql:8-22). File targets have
  * no live catalog, so we synthesize one DESCRIBING the parquet fixture
  * tables (lineitem/orders/... with plausible page counts and synthetic
  * b-tree indexes, two of them deliberately bloated, plus a lock-wait
  * scenario with NULL columns to exercise null-safe joins).
  *
  * Every table is a single dialect-portable `VALUES` SQL string (the
  * intersection of Spark SQL and DuckDB SQL): the SAME text both registers
  * the Spark temp views and prefixes the DuckDB oracle as CTEs, so catalog
  * contents can never drift between the engine and its oracle.
  *
  * Size functions (`pg_table_size` family) are relpages-derived arithmetic
  * (relpages × 8192) — the catalog's page counts are the single source of
  * truth, exactly how a live catalog behaves.
  */
object PgCatalog {

  /** (oid, nspname) */
  /** (oid, nspname, nspacl) — nspacl is the rendered acl array string
    * (aclexplode input for dba_clone_schema's dcl_nsp, 01_step.sql:292-313;
    * the empty-grantee entry `=U/postgres` is PUBLIC). */
  val pgNamespace: String =
    """SELECT * FROM (VALUES
      (11, 'pg_catalog', CAST(NULL AS STRING)), (2200, 'public', NULL),
      (13000, 'information_schema', NULL),
      (16500, 'analytics', '{postgres=UC/postgres,app_rw=U/postgres,=U/postgres}'),
      (99, 'pg_toast', NULL)) AS t(oid, nspname, nspacl)"""

  /** (oid, amname) */
  val pgAm: String =
    """SELECT * FROM (VALUES (403, 'btree'), (405, 'hash')) AS t(oid, amname)"""

  /** (oid, typname) — the type-oid names the verbatim dba_idx_diag/04
    * btree-on-text check resolves through. */
  val pgType: String =
    """SELECT * FROM (VALUES
      (16, 'bool'), (20, 'int8'), (21, 'int2'), (23, 'int4'),
      (25, 'text'), (701, 'float8'), (1043, 'varchar'),
      (1082, 'date'), (1114, 'timestamp')
      ) AS t(oid, typname)"""

  /** (oid, relname, relnamespace, relkind, reltuples, relpages, relam,
    * reloptions, reltoastrelid, relpersistence) — relkind: r=table,
    * i=index, t=toast, S=sequence, v=view, m=materialized view.
    * reloptions is the rendered storage-options string (fillfactor
    * extraction target); reltoastrelid links a heap to its toast table
    * (alert_bloat table-bloat estimator, c10); relpersistence p/u drives
    * dba_clone_schema's TABLE vs UNLOGGED TABLE branch (01_step.sql:93-99);
    * relhasindex feeds dba_idx_diag's 09/10 checks (events_archive is the
    * BIG indexless table that trips 09); relfrozenxid/relminmxid feed
    * the VERBATIM xact-age packets
    * (dba_xact_age, alert_xact_age) — age() is mod-2^32 distance from the
    * snapshot's pinned current xid 9100 / mxid 5000, so lineitem (frozen
    * at 2.8e9) ages to ~1.49e9 (past both alert thresholds), events to
    * ~1.39e9 xid / ~1.41e9 mxid, orders to ~1.19e9 (just UNDER the 1.2e9
    * threshold — pins the negative branch).
    */
  val pgClass: String =
    """SELECT * FROM (VALUES
      (16384, 'lineitem',   2200,  'r', CAST(600572 AS BIGINT), 12000, 0,   CAST(NULL AS STRING), 16394, 'p', CAST(2800000000 AS BIGINT), CAST(4000 AS BIGINT), true),
      (16385, 'orders',     2200,  'r', CAST(150000 AS BIGINT), 3500,  0,   NULL, 0, 'p', CAST(3100000000 AS BIGINT), CAST(4000 AS BIGINT), true),
      (16386, 'customer',   2200,  'r', CAST(15000 AS BIGINT),  500,   0,   NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), true),
      (16387, 'part',       2200,  'r', CAST(20000 AS BIGINT),  600,   0,   NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), true),
      (16388, 'supplier',   2200,  'r', CAST(1000 AS BIGINT),   40,    0,   NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), true),
      (16389, 'nation',     2200,  'r', CAST(25 AS BIGINT),     2,     0,   NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (16390, 'region',     2200,  'r', CAST(5 AS BIGINT),      1,     0,   NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (16391, 'events',     16500, 'r', CAST(250000 AS BIGINT), 6000,  0,   'autovacuum_enabled=false', 0, 'u', CAST(2900000000 AS BIGINT), CAST(2880000000 AS BIGINT), true),
      (16392, 'documents',  16500, 'r', CAST(5000 AS BIGINT),   800,   0,   'autovacuum_enabled=false,toast.autovacuum_enabled=false', 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), true),
      (16393, 'embeddings', 16500, 'r', CAST(5000 AS BIGINT),   1500,  0,   NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), true),
      (16394, 'pg_toast_16384', 99, 't', CAST(1000 AS BIGINT),  300,   0,   NULL, 0, 'p', CAST(3000000000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (1259,  'pg_class',   11,    'r', CAST(500 AS BIGINT),    30,    0,   NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), true),
      (17001, 'lineitem_pkey',         2200,  'i', CAST(600572 AS BIGINT), 4500, 403, 'fillfactor=90', 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17002, 'lineitem_shipdate_idx', 2200,  'i', CAST(600572 AS BIGINT), 8000, 403, NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17003, 'orders_pkey',           2200,  'i', CAST(150000 AS BIGINT), 1200, 403, NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17004, 'orders_custkey_idx',    2200,  'i', CAST(150000 AS BIGINT), 2600, 403, 'fillfactor=70', 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17005, 'customer_pkey',         2200,  'i', CAST(15000 AS BIGINT),  180,  403, NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17006, 'part_pkey',             2200,  'i', CAST(20000 AS BIGINT),  210,  403, NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17007, 'events_ts_idx',         16500, 'i', CAST(250000 AS BIGINT), 3100, 403, 'fillfactor=70', 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17008, 'documents_fp_idx',      16500, 'i', CAST(5000 AS BIGINT),   900,  405, NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17009, 'embeddings_pkey',       16500, 'i', CAST(5000 AS BIGINT),   1100, 403, NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17010, 'supplier_pkey',         2200,  'i', CAST(1000 AS BIGINT),   8,    403, NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17011, 'orders_custkey_idx2',   2200,  'i', CAST(150000 AS BIGINT), 150,  403, NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17012, 'events_composite_idx',  16500, 'i', CAST(250000 AS BIGINT), 120,  403, NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (16395, 'events_archive', 16500, 'r', CAST(900000 AS BIGINT), 5000, 0,  NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17101, 'events_id_seq',   16500, 'S', CAST(1 AS BIGINT),   1,  0, NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17102, 'v_recent_events', 16500, 'v', CAST(0 AS BIGINT),   0,  0, NULL, 0, 'p', CAST(8000 AS BIGINT), CAST(4000 AS BIGINT), false),
      (17103, 'mv_doc_stats',    16500, 'm', CAST(300 AS BIGINT), 20, 0, NULL, 0, 'p', CAST(8200 AS BIGINT), CAST(4100 AS BIGINT), false)
      ) AS t(oid, relname, relnamespace, relkind, reltuples, relpages, relam, reloptions, reltoastrelid, relpersistence, relfrozenxid, relminmxid, relhasindex)"""

  /** (indexrelid, indrelid, indisunique, indisprimary, indisvalid,
    * indisready, inddef, indkey, indnatts) — inddef is the pre-rendered
    * pg_get_indexdef text (decompilers become catalog columns on a file
    * target, SURVEY.md §2.2); the indis* flags are real BOOLEANS (the
    * verbatim steps test them as booleans: `indisvalid = false`,
    * `i.indisprimary or i.indisunique`); indkey is the int2vector in
    * its wire text form (subscripts/ANY rewrite to split()); indnatts
    * matches the indkey arity (dba_idx_diag/02 gates on > 3 — the
    * 4-column events_composite_idx trips it). */
  val pgIndex: String =
    """SELECT * FROM (VALUES
      (17001, 16384, true, true, true, true, 'CREATE UNIQUE INDEX lineitem_pkey ON public.lineitem USING btree (l_orderkey, l_linenumber)', '1 4', 2),
      (17002, 16384, false, false, false, true, 'CREATE INDEX lineitem_shipdate_idx ON public.lineitem USING btree (l_shipdate)', '11', 1),
      (17003, 16385, true, true, true, true, 'CREATE UNIQUE INDEX orders_pkey ON public.orders USING btree (o_orderkey)', '1', 1),
      (17004, 16385, false, false, true, true, 'CREATE INDEX orders_custkey_idx ON public.orders USING btree (o_custkey)', '2', 1),
      (17005, 16386, true, true, true, true, 'CREATE UNIQUE INDEX customer_pkey ON public.customer USING btree (c_custkey)', '1', 1),
      (17006, 16387, true, true, true, true, 'CREATE UNIQUE INDEX part_pkey ON public.part USING btree (p_partkey)', '1', 1),
      (17007, 16391, false, false, true, true, 'CREATE INDEX events_ts_idx ON analytics.events USING btree (ts)', '2', 1),
      (17008, 16392, false, false, true, true, 'CREATE INDEX documents_fp_idx ON analytics.documents USING hash (fp)', '3', 1),
      (17009, 16393, true, true, true, true, 'CREATE UNIQUE INDEX embeddings_pkey ON analytics.embeddings USING btree (vec_id)', '1', 1),
      (17010, 16388, true, true, true, true, 'CREATE UNIQUE INDEX supplier_pkey ON public.supplier USING btree (s_suppkey)', '1', 1),
      (17011, 16385, false, false, true, false, 'CREATE INDEX orders_custkey_idx2 ON public.orders USING btree (o_custkey)', '2', 1),
      (17012, 16391, false, false, true, true, 'CREATE INDEX events_composite_idx ON analytics.events USING btree (ts, user_id, event_type, score)', '2 3 4 5', 4)
      ) AS t(indexrelid, indrelid, indisunique, indisprimary, indisvalid, indisready, inddef, indkey, indnatts)"""

  /** (indexrelid, attnum, keypos) — one row per index key column: the
    * portable form of `regexp_split_to_table(indkey::text, ' ')`
    * (alert_bloat/01_step.sql:9). */
  val pgIndexKey: String =
    """SELECT * FROM (VALUES
      (17001, 1, 1), (17001, 4, 2),
      (17002, 11, 1),
      (17003, 1, 1),
      (17004, 2, 1),
      (17005, 1, 1),
      (17006, 1, 1),
      (17007, 2, 1),
      (17008, 3, 1),
      (17009, 1, 1),
      (17010, 1, 1),
      (17011, 2, 1),
      (17012, 2, 1), (17012, 3, 2), (17012, 4, 3), (17012, 5, 4)
      ) AS t(indexrelid, attnum, keypos)"""

  /** (attrelid, attnum, attname, atttypid) — attribute rows both under the
    * INDEX oid with the TABLE attnum (the index-bloat join shape, c03/c04)
    * and under the TABLE oid (the table-bloat join shape, c10). atttypid
    * uses PG's type oids (20 int8, 23 int4, 1043 varchar, 1082 date,
    * 1114 timestamp); none is 19 (`name`), so c10's is_na stays false. */
  val pgAttribute: String =
    """SELECT * FROM (VALUES
      (17001, 1, 'l_orderkey', 20, false), (17001, 4, 'l_linenumber', 23, false),
      (17002, 11, 'l_shipdate', 1082, false),
      (17003, 1, 'o_orderkey', 20, false),
      (17004, 2, 'o_custkey', 20, false),
      (17005, 1, 'c_custkey', 20, false),
      (17006, 1, 'p_partkey', 20, false),
      (17007, 2, 'ts', 1114, false),
      (17008, 3, 'fp', 1043, false),
      (17009, 1, 'vec_id', 20, false),
      (17010, 1, 's_suppkey', 20, false),
      (17011, 2, 'o_custkey', 20, false),
      (16384, 1, 'l_orderkey', 20, false), (16384, 4, 'l_linenumber', 23, false),
      (16384, 11, 'l_shipdate', 1082, false),
      (16385, 1, 'o_orderkey', 20, false), (16385, 2, 'o_custkey', 20, false),
      (16386, 1, 'c_custkey', 20, false),
      (16387, 1, 'p_partkey', 20, false),
      (16388, 1, 's_suppkey', 20, false),
      (16391, 1, 'event_id', 20, false),
      (16391, 2, 'ts', 1114, false),
      (16391, 3, 'user_id', 20, false),
      (16391, 4, 'event_type', 25, false),
      (16391, 5, 'score', 701, false),
      (16392, 3, 'fp', 1043, false),
      (16392, 9, 'event_ref', 20, false),
      (16392, 10, 'created_at', 1114, false),
      (16393, 1, 'vec_id', 20, false),
      (17012, 2, 'ts', 1114, false),
      (17012, 3, 'user_id', 20, false),
      (17012, 4, 'event_type', 25, false),
      (17012, 5, 'score', 701, false),
      (16384, 17, 'l_comment_old', 25, true)
      ) AS t(attrelid, attnum, attname, atttypid, attisdropped)"""

  /** (schemaname, tablename, attname, null_frac, avg_width, inherited) */
  val pgStats: String =
    """SELECT * FROM (VALUES
      ('public', 'lineitem', 'l_orderkey',    CAST(0.0 AS DOUBLE), 8, false),
      ('public', 'lineitem', 'l_linenumber',  CAST(0.0 AS DOUBLE), 4, false),
      ('public', 'lineitem', 'l_shipdate',    CAST(0.02 AS DOUBLE), 4, false),
      ('public', 'orders',   'o_orderkey',    CAST(0.0 AS DOUBLE), 8, false),
      ('public', 'orders',   'o_custkey',     CAST(0.0 AS DOUBLE), 8, false),
      ('public', 'customer', 'c_custkey',     CAST(0.0 AS DOUBLE), 8, false),
      ('public', 'part',     'p_partkey',     CAST(0.0 AS DOUBLE), 8, false),
      ('public', 'supplier', 's_suppkey',     CAST(0.0 AS DOUBLE), 8, false),
      ('analytics', 'events', 'ts',           CAST(0.0 AS DOUBLE), 8, false),
      ('analytics', 'documents', 'fp',        CAST(0.0 AS DOUBLE), 33, false),
      ('analytics', 'embeddings', 'vec_id',   CAST(0.0 AS DOUBLE), 8, false)
      ) AS t(schemaname, tablename, attname, null_frac, avg_width, inherited)"""

  /** (relid, n_live_tup, n_dead_tup, n_tup_ins, n_tup_upd, n_tup_hot_upd,
    * last_autoanalyze, last_autovacuum, last_analyze, last_vacuum) — the
    * four maintenance timestamps drive alert_stat (c08): lineitem has
    * never been analyzed/vacuumed (the "attention!" all-NULL branch),
    * orders and documents are stale (> 15 days before the pinned clock
    * 2024-01-01), the rest are fresh. */
  val pgStatAllTables: String =
    """SELECT * FROM (VALUES
      (16384, CAST(600572 AS BIGINT), CAST(1200 AS BIGINT), CAST(600572 AS BIGINT), CAST(4500 AS BIGINT), CAST(900 AS BIGINT), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(500000 AS BIGINT), CAST(2000 AS BIGINT), CAST(4000000 AS BIGINT), CAST(1000000 AS BIGINT)),
      (16385, CAST(150000 AS BIGINT), CAST(800 AS BIGINT),  CAST(150000 AS BIGINT), CAST(2500 AS BIGINT), CAST(400 AS BIGINT), TIMESTAMP '2023-10-02 04:00:00', TIMESTAMP '2023-10-01 03:00:00', TIMESTAMP '2023-09-20 02:00:00', TIMESTAMP '2023-09-25 01:00:00', CAST(20000 AS BIGINT), CAST(500 AS BIGINT), CAST(100000 AS BIGINT), CAST(3000000 AS BIGINT)),
      (16386, CAST(15000 AS BIGINT),  CAST(40 AS BIGINT),   CAST(15000 AS BIGINT),  CAST(300 AS BIGINT),  CAST(80 AS BIGINT),  TIMESTAMP '2023-12-30 04:10:00', TIMESTAMP '2023-12-30 03:10:00', NULL, NULL, CAST(5000 AS BIGINT), CAST(100 AS BIGINT), CAST(50000 AS BIGINT), CAST(200000 AS BIGINT)),
      (16387, CAST(20000 AS BIGINT),  CAST(60 AS BIGINT),   CAST(20000 AS BIGINT),  CAST(150 AS BIGINT),  CAST(20 AS BIGINT),  TIMESTAMP '2023-12-29 04:20:00', TIMESTAMP '2023-12-29 03:20:00', NULL, NULL, CAST(3000 AS BIGINT), CAST(80 AS BIGINT), CAST(40000 AS BIGINT), CAST(100000 AS BIGINT)),
      (16388, CAST(1000 AS BIGINT),   CAST(5 AS BIGINT),    CAST(1000 AS BIGINT),   CAST(10 AS BIGINT),   CAST(2 AS BIGINT),   TIMESTAMP '2023-12-28 04:30:00', TIMESTAMP '2023-12-28 03:30:00', NULL, NULL, CAST(500 AS BIGINT), CAST(50 AS BIGINT), CAST(5000 AS BIGINT), CAST(10000 AS BIGINT)),
      (16389, CAST(25 AS BIGINT),     CAST(0 AS BIGINT),    CAST(25 AS BIGINT),     CAST(0 AS BIGINT),    CAST(0 AS BIGINT),   TIMESTAMP '2023-12-27 04:40:00', TIMESTAMP '2023-12-27 03:40:00', NULL, NULL, CAST(0 AS BIGINT), CAST(30000 AS BIGINT), CAST(750000 AS BIGINT), CAST(0 AS BIGINT)),
      (16390, CAST(5 AS BIGINT),      CAST(0 AS BIGINT),    CAST(5 AS BIGINT),      CAST(0 AS BIGINT),    CAST(0 AS BIGINT),   TIMESTAMP '2023-12-26 04:50:00', TIMESTAMP '2023-12-26 03:50:00', NULL, NULL, CAST(0 AS BIGINT), CAST(20000 AS BIGINT), CAST(100000 AS BIGINT), CAST(0 AS BIGINT)),
      (16391, CAST(250000 AS BIGINT), CAST(2000 AS BIGINT), CAST(250000 AS BIGINT), CAST(0 AS BIGINT),    CAST(0 AS BIGINT),   TIMESTAMP '2023-12-31 05:00:00', TIMESTAMP '2023-11-01 05:00:00', NULL, NULL, CAST(0 AS BIGINT), CAST(3000 AS BIGINT), CAST(300000 AS BIGINT), CAST(0 AS BIGINT)),
      (16392, CAST(5000 AS BIGINT),   CAST(100 AS BIGINT),  CAST(5000 AS BIGINT),   CAST(600 AS BIGINT),  CAST(120 AS BIGINT), TIMESTAMP '2023-11-10 06:00:00', TIMESTAMP '2023-11-11 06:00:00', TIMESTAMP '2023-11-12 06:00:00', TIMESTAMP '2023-11-13 06:00:00', CAST(800 AS BIGINT), CAST(200 AS BIGINT), CAST(10000 AS BIGINT), CAST(5000 AS BIGINT)),
      (16393, CAST(5000 AS BIGINT),   CAST(20 AS BIGINT),   CAST(5000 AS BIGINT),   CAST(50 AS BIGINT),   CAST(10 AS BIGINT),  TIMESTAMP '2023-12-31 07:00:00', TIMESTAMP '2023-12-31 07:30:00', NULL, NULL, CAST(1200 AS BIGINT), CAST(10 AS BIGINT), CAST(1000 AS BIGINT), CAST(9000 AS BIGINT)),
      (16395, CAST(900000 AS BIGINT), CAST(0 AS BIGINT), CAST(900000 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP), CAST(0 AS BIGINT), CAST(4000 AS BIGINT), CAST(9000000 AS BIGINT), CAST(0 AS BIGINT))
      ) AS t(relid, n_live_tup, n_dead_tup, n_tup_ins, n_tup_upd, n_tup_hot_upd, last_autoanalyze, last_autovacuum, last_analyze, last_vacuum, idx_scan, seq_scan, seq_tup_read, idx_tup_fetch)"""

  /** The PREVIOUS monitoring snapshot of pg_stat_all_tables (as of
    * 2023-12-20), the stored state a reference alert compares against:
    * cumulative counters are lower than the current view's; embeddings
    * (16393) is absent — created after the snapshot — so delta queries
    * must handle the no-prior-row branch. customer/supplier/region
    * (16386/16388/16389) are byte-identical to current = zero delta. */
  val pgStatAllTablesPrev: String =
    """SELECT * FROM (VALUES
      (16384, CAST(590572 AS BIGINT), CAST(1000 AS BIGINT), CAST(590000 AS BIGINT), CAST(3900 AS BIGINT), CAST(800 AS BIGINT)),
      (16385, CAST(149000 AS BIGINT), CAST(700 AS BIGINT),  CAST(149000 AS BIGINT), CAST(2100 AS BIGINT), CAST(350 AS BIGINT)),
      (16386, CAST(15000 AS BIGINT),  CAST(40 AS BIGINT),   CAST(15000 AS BIGINT),  CAST(300 AS BIGINT),  CAST(80 AS BIGINT)),
      (16387, CAST(19980 AS BIGINT),  CAST(55 AS BIGINT),   CAST(19980 AS BIGINT),  CAST(150 AS BIGINT),  CAST(20 AS BIGINT)),
      (16388, CAST(1000 AS BIGINT),   CAST(5 AS BIGINT),    CAST(1000 AS BIGINT),   CAST(10 AS BIGINT),   CAST(2 AS BIGINT)),
      (16389, CAST(25 AS BIGINT),     CAST(0 AS BIGINT),    CAST(25 AS BIGINT),     CAST(0 AS BIGINT),    CAST(0 AS BIGINT)),
      (16390, CAST(5 AS BIGINT),      CAST(0 AS BIGINT),    CAST(5 AS BIGINT),      CAST(0 AS BIGINT),    CAST(0 AS BIGINT)),
      (16391, CAST(230000 AS BIGINT), CAST(1500 AS BIGINT), CAST(230000 AS BIGINT), CAST(0 AS BIGINT),    CAST(0 AS BIGINT)),
      (16392, CAST(4900 AS BIGINT),   CAST(90 AS BIGINT),   CAST(4900 AS BIGINT),   CAST(520 AS BIGINT),  CAST(100 AS BIGINT))
      ) AS t(relid, n_live_tup, n_dead_tup, n_tup_ins, n_tup_upd, n_tup_hot_upd)"""

  /** (indexrelid, idx_scan) */
  /** (relid, indexrelid, idx_scan) — per-index scan counters
    * (dba_idx_diag/05's unused-index ratio: lineitem_shipdate_idx and
    * orders_custkey_idx2 are the planted near-zero-usage indexes). */
  val pgStatAllIndexes: String =
    """SELECT * FROM (VALUES
      (16384, 17001, CAST(499900 AS BIGINT)),
      (16384, 17002, CAST(100 AS BIGINT)),
      (16385, 17003, CAST(4950 AS BIGINT)),
      (16385, 17004, CAST(15000 AS BIGINT)),
      (16385, 17011, CAST(50 AS BIGINT)),
      (16386, 17005, CAST(5000 AS BIGINT)),
      (16387, 17006, CAST(3000 AS BIGINT)),
      (16388, 17010, CAST(500 AS BIGINT)),
      (16391, 17007, CAST(0 AS BIGINT)),
      (16391, 17012, CAST(0 AS BIGINT)),
      (16392, 17008, CAST(800 AS BIGINT)),
      (16393, 17009, CAST(1200 AS BIGINT))
      ) AS t(relid, indexrelid, idx_scan)"""

  val pgStatUserIndexes: String =
    """SELECT * FROM (VALUES
      (17001, CAST(998877 AS BIGINT)), (17002, CAST(12 AS BIGINT)),
      (17003, CAST(456789 AS BIGINT)), (17004, CAST(99 AS BIGINT)),
      (17005, CAST(5000 AS BIGINT)),   (17006, CAST(7000 AS BIGINT)),
      (17007, CAST(31337 AS BIGINT)),  (17008, CAST(0 AS BIGINT)),
      (17009, CAST(424242 AS BIGINT)), (17010, CAST(800 AS BIGINT)),
      (17011, CAST(0 AS BIGINT))
      ) AS t(indexrelid, idx_scan)"""

  /** (oid, conname, contype, connamespace, conindid, conrelid, confrelid,
    * confupdtype, confdeltype, condef) — FK rows drive dba_idx_diag's
    * FK-without-index check (c11): orders→customer is indexed
    * (orders_custkey_idx suppresses it via the lateral probe),
    * events→customer is NOT (the finding), lineitem→orders is
    * no-action/no-action (excluded by the reference's filter). */
  val pgConstraint: String =
    """SELECT * FROM (VALUES
      (18001, 'lineitem_pkey',   'p', 2200,  17001, 16384, 0, 'a', 'a', 'PRIMARY KEY (l_orderkey, l_linenumber)', '1 4', CAST(NULL AS STRING)),
      (18002, 'orders_pkey',     'p', 2200,  17003, 16385, 0, 'a', 'a', 'PRIMARY KEY (o_orderkey)', '1', NULL),
      (18003, 'customer_pkey',   'p', 2200,  17005, 16386, 0, 'a', 'a', 'PRIMARY KEY (c_custkey)', '1', NULL),
      (18004, 'part_pkey',       'p', 2200,  17006, 16387, 0, 'a', 'a', 'PRIMARY KEY (p_partkey)', '1', NULL),
      (18005, 'embeddings_pkey', 'p', 16500, 17009, 16393, 0, 'a', 'a', 'PRIMARY KEY (vec_id)', '1', NULL),
      (18006, 'supplier_pkey',   'p', 2200,  17010, 16388, 0, 'a', 'a', 'PRIMARY KEY (s_suppkey)', '1', NULL),
      (18007, 'orders_custkey_fkey',   'f', 2200,  0, 16385, 16386, 'a', 'c', 'FOREIGN KEY (o_custkey) REFERENCES customer(c_custkey) ON DELETE CASCADE', '2', '1'),
      (18008, 'events_user_fkey',      'f', 16500, 0, 16391, 16386, 'a', 'c', 'FOREIGN KEY (user_id) REFERENCES customer(c_custkey) ON DELETE CASCADE', '3', '1'),
      (18009, 'lineitem_orderkey_fkey','f', 2200,  0, 16384, 16385, 'a', 'a', 'FOREIGN KEY (l_orderkey) REFERENCES orders(o_orderkey)', '1', '1'),
      (18010, 'documents_event_fkey',  'f', 16500, 0, 16392, 16391, 'a', 'c', 'FOREIGN KEY (event_ref) REFERENCES analytics.events(event_id) ON DELETE CASCADE', '9', '1')
      ) AS t(oid, conname, contype, connamespace, conindid, conrelid, confrelid, confupdtype, confdeltype, condef, conkey, confkey)"""

  /** (conoid, src_attnum, tgt_attnum) — one row per FK key column: the
    * portable form of `attnum = any(conkey/confkey)`
    * (dba_idx_diag/06_step.sql:24-28), same pattern as pg_index_key. */
  val pgConstraintKey: String =
    """SELECT * FROM (VALUES
      (18007, 2, 1),
      (18008, 3, 1),
      (18009, 1, 1),
      (18010, 9, 1)
      ) AS t(conoid, src_attnum, tgt_attnum)"""

  /** Lock-wait scenario (dba_locks/01_step.sql:8-22): pid 202 waits on the
    * relation lock held by 101; pid 303 waits on transactionid 555 held by
    * 404; pid 505 holds an uncontended lock. NULL columns are load-bearing:
    * the blocked↔blocking self-join matches them with IS NOT DISTINCT FROM. */
  val pgLocks: String =
    """SELECT * FROM (VALUES
      ('relation',      16900, 16384, CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS STRING), CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT), CAST(NULL AS INT), 101, true),
      ('relation',      16900, 16384, NULL, NULL, NULL, NULL, NULL, NULL, NULL, 202, false),
      ('transactionid', 16900, CAST(NULL AS INT), NULL, NULL, NULL, 555,  NULL, NULL, NULL, 404, true),
      ('transactionid', 16900, NULL, NULL, NULL, NULL, 555,  NULL, NULL, NULL, 303, false),
      ('relation',      16900, 16391, NULL, NULL, NULL, NULL, NULL, NULL, NULL, 505, true),
      ('virtualxid',    CAST(NULL AS INT), NULL, NULL, NULL, '3/42', NULL, NULL, NULL, NULL, 101, true)
      ) AS t(locktype, database, relation, page, tuple, virtualxid, transactionid, classid, objid, objsubid, pid, granted)"""

  /** (pid, usename, query, state, application_name, xact_start,
    * wait_event_type, wait_event) — the extra three columns are the lock
    * observer's inputs (dbccore.py:185-220): 202 is OUR migration backend
    * waiting on a relation lock (wait-timeout target); 404 idles in a
    * transaction that blocks 303 (blocker-timeout target when 404 is ours). */
  val pgStatActivity: String =
    """SELECT * FROM (VALUES
      (101, 'app_rw',    'graft', 'UPDATE lineitem SET l_quantity = l_quantity + 1 WHERE l_orderkey BETWEEN 1 AND 10000', 'active', 'app', TIMESTAMP '2024-01-01 10:00:00', TIMESTAMP '2024-01-01 10:00:05', 9001, 8990, CAST(NULL AS STRING), CAST(NULL AS STRING)),
      (202, 'dbc_user',  'graft', 'ALTER TABLE lineitem ALTER COLUMN l_linenumber TYPE bigint', 'active', 'dbc_int4_to_int8', TIMESTAMP '2024-01-01 10:00:30', TIMESTAMP '2024-01-01 10:00:31', 9005, 8990, 'Lock', 'relation'),
      (303, 'report_ro', 'graft', 'SELECT count(*) FROM orders JOIN lineitem ON l_orderkey = o_orderkey', 'active', 'reports', TIMESTAMP '2024-01-01 10:02:00', TIMESTAMP '2024-01-01 10:02:02', CAST(NULL AS INT), 8995, 'Lock', 'transactionid'),
      (404, 'app_rw',    'graft', 'INSERT INTO orders SELECT * FROM orders_staging', 'idle in transaction', 'app', TIMESTAMP '2024-01-01 09:55:00', TIMESTAMP '2024-01-01 09:58:00', 8998, 8990, NULL, NULL),
      (505, 'etl',       'graft', 'COPY events FROM stdin', 'active', 'etl_loader', TIMESTAMP '2024-01-01 10:04:50', TIMESTAMP '2024-01-01 10:04:51', 9010, 9009, NULL, NULL)
      ) AS t(pid, usename, datname, query, state, application_name, xact_start, state_change, backend_xid, backend_xmin, wait_event_type, wait_event)"""

  /** (name, setting, unit, boot_val) — current_setting targets plus the
    * full dba_get_conf name list (the packet runs VERBATIM as c34: its
    * CASE renders '8kB'/'kB' units through pg_size_pretty, everything
    * else — including autovacuum_work_mem's '-1' sentinel — falls to ''). */
  val pgSettings: String =
    """SELECT * FROM (VALUES
      ('block_size', '8192', CAST(NULL AS STRING), '8192'),
      ('work_mem', '204800', 'kB', '4096'),
      ('maintenance_work_mem', '1048576', 'kB', '65536'),
      ('shared_buffers', '1048576', '8kB', '16384'),
      ('autovacuum', 'on', NULL, 'on'),
      ('server_version', '14.11', NULL, '14.11'),
      ('statement_timeout', '3600000', 'ms', '0'),
      ('max_connections', '6', NULL, '100'),
      ('autovacuum_work_mem', '-1', 'kB', '-1'),
      ('autovacuum_vacuum_cost_limit', '200', NULL, '-1'),
      ('autovacuum_max_workers', '3', NULL, '3'),
      ('checkpoint_timeout', '300', 's', '300'),
      ('max_wal_size', '4096', 'MB', '1024'),
      ('autovacuum_naptime', '60', 's', '60')
      ) AS t(name, setting, unit, boot_val)"""

  /** (adrelid, adnum, adbin, serial_seq) — column defaults
    * (dba_clone_schema/01_step.sql:131-190). adbin holds the RENDERED
    * default expression: pg_get_expr(adbin, adrelid) is then a passthrough
    * of its first argument — exactly DuckDB's own pg_get_expr compat shim
    * and the Spark native twin (PgFunctions.PgGetExpr). serial_seq is the
    * pre-rendered pg_get_serial_sequence result (NULL for non-serial
    * defaults); atthasdef/attisdropped need no fixture columns — in PG too,
    * atthasdef is exactly "a pg_attrdef row exists". */
  val pgAttrdef: String =
    """SELECT * FROM (VALUES
      (16391, 1, 'nextval(''analytics.events_id_seq''::regclass)', 'analytics.events_id_seq'),
      (16392, 10, 'now()', CAST(NULL AS STRING))
      ) AS t(adrelid, adnum, adbin, serial_seq)"""

  /** (oid, proname, pronamespace, prodef, proargs, proacl) — prodef is the
    * pre-rendered pg_get_functiondef body, proargs the pre-rendered
    * pg_get_function_arguments list (dba_clone_schema/01_step.sql:244-258,
    * 357-390); proacl the rendered acl array (X = EXECUTE). */
  val pgProc: String =
    """SELECT * FROM (VALUES
      (19001, 'fn_doc_quality', 16500, 'CREATE OR REPLACE FUNCTION analytics.fn_doc_quality(doc_id bigint) RETURNS double precision LANGUAGE sql AS $function$ SELECT 1.0 FROM analytics.documents d WHERE d.doc_id = doc_id $function$', 'doc_id bigint', '{postgres=X/postgres,report_ro=X/postgres}'),
      (19002, 'fn_event_count', 16500, 'CREATE OR REPLACE FUNCTION analytics.fn_event_count() RETURNS bigint LANGUAGE sql AS $function$ SELECT count(*) FROM analytics.events $function$', '', CAST(NULL AS STRING))
      ) AS t(oid, proname, pronamespace, prodef, proargs, proacl)"""

  /** (oid, tgname, tgrelid, tgisinternal, tgdef) — tgdef is the
    * pre-rendered pg_get_triggerdef text (dba_clone_schema/01_step.sql:
    * 262-276); internal (FK) triggers carry tgisinternal = 1 and are
    * excluded by the clone. */
  val pgTrigger: String =
    """SELECT * FROM (VALUES
      (19101, 'trg_events_audit', 16391, 0, 'CREATE TRIGGER trg_events_audit AFTER INSERT ON analytics.events FOR EACH ROW EXECUTE FUNCTION analytics.fn_doc_quality()'),
      (19102, 'RI_ConstraintTrigger_c_19102', 16392, 1, 'internal FK trigger')
      ) AS t(oid, tgname, tgrelid, tgisinternal, tgdef)"""

  /** (oid, viewdef) — pre-rendered pg_get_viewdef(oid, true) per view /
    * materialized view (dba_clone_schema/01_step.sql:215-240). */
  val pgViews: String =
    """SELECT * FROM (VALUES
      (17102, 'SELECT event_id, ts, user_id FROM analytics.events WHERE event_id > 0'),
      (17103, 'SELECT user_id, count(1) AS n_docs FROM analytics.documents GROUP BY user_id')
      ) AS t(oid, viewdef)"""

  /** (oid, datname) — database list (dba_find_db/01_step.sql:1). */
  /** (oid, datname, datfrozenxid, datminmxid) — the frozen-xid columns
    * feed the VERBATIM dba_xact_age/alert_xact_age second statements:
    * template1 crosses the 1.3e9 xid-age alert threshold, postgres the
    * 1.4e9 mxid-age one (pinned current xid 9100 / mxid 5000). */
  val pgDatabase: String =
    """SELECT * FROM (VALUES
      (13443, 'postgres',  CAST(3200000000 AS BIGINT), CAST(2880000000 AS BIGINT)),
      (13444, 'template1', CAST(2850000000 AS BIGINT), CAST(4200 AS BIGINT)),
      (16400, 'graft',     CAST(8500 AS BIGINT), CAST(4000 AS BIGINT)),
      (16401, 'app_some_db_prod', CAST(8600 AS BIGINT), CAST(4000 AS BIGINT)),
      (16402, 'some_db_stage',    CAST(8700 AS BIGINT), CAST(4000 AS BIGINT)),
      (16403, 'analytics', CAST(8800 AS BIGINT), CAST(4000 AS BIGINT))
      ) AS t(oid, datname, datfrozenxid, datminmxid)"""

  /** (pid, client_addr, sent_lsn, write_lsn, flush_lsn, replay_lsn,
    * sent_pos, write_pos, flush_pos, replay_pos) — the full dba_lag LSN
    * chain, each both as the wire 'X/Y' hex string (parsed by
    * PgFunctions.pg_wal_lsn_diff) and as its absolute byte position (the
    * numeric truth the string encodes: X·2^32 + Y; hex↔pos pairs are
    * exact by construction, so the verbatim c33 and its positions-based
    * oracle agree). Pinned pg_current_wal_lsn() = '2/1A2B3C40'
    * (9028975680), the sent head. */
  val pgStatReplication: String =
    """SELECT * FROM (VALUES
      (9001, '10.0.0.21', '2/1A2B3C40', '2/1A2B3000', '2/1A2B2000', '2/1A2B0000', CAST(9028975680 AS BIGINT), CAST(9028972544 AS BIGINT), CAST(9028968448 AS BIGINT), CAST(9028960256 AS BIGINT)),
      (9002, '10.0.0.22', '2/1A2B3C40', '2/00000000', '1/FFC00000', '1/FF000000', CAST(9028975680 AS BIGINT), CAST(8589934592 AS BIGINT), CAST(8585740288 AS BIGINT), CAST(8573157376 AS BIGINT))
      ) AS t(pid, client_addr, sent_lsn, write_lsn, flush_lsn, replay_lsn, sent_pos, write_pos, flush_pos, replay_pos)"""

  /** (oid, relacl) — acl arrays in PostgreSQL's text rendering
    * (`{grantee=privchars/grantor,...}`), the aclexplode input shape
    * (dba_clone_schema/01_step.sql:26,297,333,368). */
  val pgClassAcl: String =
    """SELECT * FROM (VALUES
      (16384, '{postgres=arwdDxt/postgres,app_rw=arwd/postgres,report_ro=r/postgres}'),
      (16385, '{postgres=arwdDxt/postgres,app_rw=arwd/postgres}'),
      (16391, '{postgres=arwdDxt/postgres,etl=arw/postgres,report_ro=r/postgres}'),
      (16392, '{postgres=arwdDxt/postgres}'),
      (17101, '{postgres=rwU/postgres,app_rw=rw/postgres}')
      ) AS t(oid, relacl)"""

  /** name → portable VALUES SQL, in dependency-free registration order. */
  val tables: Seq[(String, String)] = Seq(
    "pg_namespace" -> pgNamespace,
    "pg_am" -> pgAm,
    "pg_class" -> pgClass,
    "pg_index" -> pgIndex,
    "pg_index_key" -> pgIndexKey,
    "pg_attribute" -> pgAttribute,
    "pg_stats" -> pgStats,
    "pg_stat_all_tables" -> pgStatAllTables,
    "pg_stat_all_tables_prev" -> pgStatAllTablesPrev,
    "pg_stat_user_indexes" -> pgStatUserIndexes,
    "pg_stat_all_indexes" -> pgStatAllIndexes,
    "pg_type" -> pgType,
    "pg_constraint" -> pgConstraint,
    "pg_constraint_key" -> pgConstraintKey,
    "pg_locks" -> pgLocks,
    "pg_stat_activity" -> pgStatActivity,
    "pg_settings" -> pgSettings,
    "pg_stat_replication" -> pgStatReplication,
    "pg_class_acl" -> pgClassAcl,
    "pg_database" -> pgDatabase,
    "pg_attrdef" -> pgAttrdef,
    "pg_proc" -> pgProc,
    "pg_trigger" -> pgTrigger,
    "pg_views" -> pgViews)

  /** Register every catalog table as a Spark temp view. */
  def registerAll(spark: SparkSession): Unit =
    tables.foreach { case (n, sql) => spark.sql(sql).createOrReplaceTempView(n) }

  /** Register once per session (temp views are session-scoped). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.catalog.tableExists("pg_namespace")) registerAll(spark)

  private val fnSessions = scala.collection.mutable.Set.empty[String]

  /** Catalog-backed PG admin FUNCTIONS over the fixture, so the
    * reference's packets run VERBATIM (c20/c21 + PgDialectRewriter):
    * size functions, decompilers, current_setting. Each is a lookup
    * into a driver-built map of fixture METADATA — bounded by the
    * catalog's row count (dozens), never corpus data, the same
    * driver-side contract as the generator fan-out (SURVEY E7) — so a
    * plain UDF is the right tool here (no codegen pressure to avoid).
    * pg_size_pretty/quote_ident/… stay native (PgFunctions). */
  def ensureFunctionsRegistered(spark: SparkSession): Unit =
    fnSessions.synchronized {
      val key = graft.SessionKey.of(spark)
      if (!fnSessions(key)) {
        ensureRegistered(spark)
        import org.apache.spark.sql.Row
        def rows(sql: String): Seq[Row] = spark.sql(sql).collect().toSeq
        def longAt(r: Row, i: Int): Long = r.get(i) match {
          case l: Long => l; case n: Int => n.toLong
          case other => sys.error(s"unexpected $other")
        }
        // pg_table_size/pg_relation_size = relpages × block_size (the
        // fixture's single source of truth for sizes, same formula the
        // re-authored c01 uses inline)
        val relSize: Map[Long, Long] =
          rows("SELECT oid, relpages FROM pg_class")
            .map(r => longAt(r, 0) -> longAt(r, 1) * 8192L).toMap
        val idxSize: Map[Long, Long] =
          rows("""SELECT i.indrelid, CAST(sum(ic.relpages) AS BIGINT) * 8192
                  FROM pg_index i JOIN pg_class ic ON ic.oid = i.indexrelid
                  GROUP BY i.indrelid""")
            .map(r => longAt(r, 0) -> longAt(r, 1)).toMap
        val inddef: Map[Long, String] =
          rows("SELECT indexrelid, inddef FROM pg_index")
            .map(r => longAt(r, 0) -> r.getString(1)).toMap
        val attname: Map[(Long, Long), String] =
          rows("SELECT attrelid, attnum, attname FROM pg_attribute")
            .map(r => (longAt(r, 0), longAt(r, 1)) -> r.getString(2)).toMap
        val condef: Map[Long, String] =
          rows("SELECT oid, condef FROM pg_constraint")
            .map(r => longAt(r, 0) -> r.getString(1)).toMap
        val settings: Map[String, String] =
          rows("SELECT name, setting FROM pg_settings")
            .map(r => r.getString(0) -> r.getString(1)).toMap
        spark.udf.register("pg_table_size",
          (oid: Long) => relSize.getOrElse(oid, 0L))
        spark.udf.register("pg_relation_size",
          (oid: Long) => relSize.getOrElse(oid, 0L))
        spark.udf.register("pg_indexes_size",
          (oid: Long) => idxSize.getOrElse(oid, 0L))
        spark.udf.register("pg_total_relation_size",
          (oid: Long) => relSize.getOrElse(oid, 0L) +
            idxSize.getOrElse(oid, 0L))
        spark.udf.register("pg_get_constraintdef",
          (oid: Long) => condef.getOrElse(oid, null))
        spark.udf.register("current_setting",
          (name: String) => settings.getOrElse(name, null))
        // the fixture stores reloptions PRE-JOINED (decompilers become
        // data on a file target) — array_to_string over it is identity
        spark.udf.register("array_to_string",
          (s: String, sep: String) => s)
        // pg_sleep really sleeps (test_common/06_step.sql relies on the
        // side effect); returns '' like PG's void renders
        spark.udf.register("pg_sleep",
          (sec: Double) => { Thread.sleep((sec * 1000).toLong); "" })
        // pg_get_indexdef: 1-arg = whole def; 3-arg = the indexed
        // column's name at (index oid, attnum) — arity dispatch through
        // the registry (spark.udf.register cannot overload), built as a
        // raw legacy-converter ScalaUDF so the registry gets a real
        // catalyst expression
        import org.apache.spark.sql.catalyst.expressions.{Cast, ScalaUDF}
        import org.apache.spark.sql.types.{LongType, StringType}
        def longArg(e: org.apache.spark.sql.catalyst.expressions.Expression) =
          Cast(e, LongType)
        val def1: AnyRef =
          (oid: Any) => if (oid == null) null
            else inddef.getOrElse(oid.asInstanceOf[Long], null)
        val def3: AnyRef =
          (oid: Any, attnum: Any) => if (oid == null || attnum == null) null
            else attname.getOrElse(
              (oid.asInstanceOf[Long], attnum.asInstanceOf[Long]), null)
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          "pg_get_indexdef", es => es.length match {
            case 1 => ScalaUDF(def1, StringType, Seq(longArg(es.head)),
              Seq(None), udfName = Some("pg_get_indexdef"))
            case 3 => ScalaUDF(def3, StringType,
              Seq(longArg(es(0)), longArg(es(1))), Seq(None, None),
              udfName = Some("pg_get_indexdef"))
            case n => sys.error(s"pg_get_indexdef: unsupported arity $n")
          }, "built-in")
        graft.functions.PgFunctions.registerAll(spark)
        fnSessions += key
      }
    }

  /** Run a catalog query body against the registered VIEWS. The views
    * hold the SAME `tables` VALUES strings the oracle's CTE prelude uses,
    * so contents still cannot drift — but Spark parses the 15-table
    * prelude once per session instead of once per query (the full
    * `withCatalog` text costs ~2 s of analysis alone). A body that
    * contributes its own CTEs by starting with `, name AS (...)` is
    * rewritten to open its own WITH. */
  def sqlOnViews(spark: SparkSession, body: String)
      : org.apache.spark.sql.DataFrame = {
    ensureRegistered(spark)
    val b = body.trim
    spark.sql(if (b.startsWith(",")) "WITH " + b.drop(1).trim else b)
  }

  /** The same fixture as a `WITH` prelude for a self-contained query:
    * `withCatalog("SELECT ... FROM pg_class ...")` runs identically under
    * Spark and DuckDB. The body may contribute its own CTEs by starting
    * with `, name AS (...)`. */
  def withCatalog(body: String): String = {
    val ctes = tables.map { case (n, sql) => s"$n AS ($sql)" }.mkString(",\n")
    val b = body.trim
    if (b.startsWith(",")) s"WITH $ctes\n$b"
    else s"WITH $ctes\n$b"
  }
}
