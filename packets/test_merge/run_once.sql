-- Keyed upsert as a partition-scoped copy-on-write MERGE. The reference's
-- transactional form is a row-level UPDATE/INSERT pair inside one tx
-- (packets/test_int4_to_int8/02_step.sql:3-6); on parquet the native
-- shape is: anti-join the base against the delta keys, union the delta,
-- and republish ONLY the partitions the delta touches — untouched
-- partitions are never read or rewritten, so merge cost scales with the
-- delta's partition footprint, not the table (the property that survives
-- 100x growth). Publication is ATOMIC per partition: every partition is
-- its own MANIFEST-pointer root (graft.engine.PartitionedManifest), so a
-- concurrent reader sees each partition's complete old or new version,
-- never the torn old/new file mix dynamic partition overwrite exposes.
-- Delta/Iceberg targets would run MERGE INTO directly.
DROP TABLE IF EXISTS mrg_tbl;
DROP VIEW IF EXISTS mrg_tbl;
DROP VIEW IF EXISTS mrg_seed;
DROP TABLE IF EXISTS mrg_seed;
DROP TABLE IF EXISTS mrg_delta;
CREATE TABLE mrg_seed USING parquet PARTITIONED BY (bk) LOCATION 'DBC_PL_mrg_src'
AS SELECT c_custkey, c_name, c_acctbal, CAST(c_custkey % 20 AS INT) AS bk
   FROM customer;
-- the delta: updates to every 100th key (lands in bk 0) plus brand-new
-- keys built to land in bk 1 — two affected partitions out of twenty
CREATE TABLE mrg_delta USING parquet LOCATION 'DBC_PL_mrg_delta'
AS SELECT c_custkey, concat(c_name, ' (upd)') AS c_name,
          c_acctbal + 100.0 AS c_acctbal, CAST(c_custkey % 20 AS INT) AS bk
   FROM customer WHERE c_custkey % 100 = 0
   UNION ALL
   SELECT 1000000 + c_custkey * 20 + 1,
          concat('new customer ', CAST(c_custkey AS STRING)),
          CAST(0.0 AS DOUBLE), CAST(1 AS INT)
   FROM customer WHERE c_custkey % 97 = 0;
