-- SCD2 (type-2 slowly-changing dimension) upsert: the history-preserving
-- twin of w03's overwrite-in-place merge. An attribute change CLOSES the
-- key's current row (valid_to = effective date) and INSERTS a new current
-- row; history rows are immutable. Same partition-scoped copy-on-write
-- machinery as test_merge: only delta-touched partitions are staged and
-- republished, so upsert cost scales with the delta's partition
-- footprint, not dimension history — and publication is ATOMIC per
-- partition via the MANIFEST-pointer layout
-- (graft.engine.PartitionedManifest), closing the torn-read window the
-- previous dynamic partition overwrite left open. Delta/Iceberg targets
-- would run the canonical two-branch MERGE INTO.
DROP TABLE IF EXISTS scd_dim;
DROP VIEW IF EXISTS scd_dim;
DROP VIEW IF EXISTS scd_seed;
DROP TABLE IF EXISTS scd_seed;
DROP TABLE IF EXISTS scd_delta;
CREATE TABLE scd_seed USING parquet PARTITIONED BY (bk) LOCATION 'DBC_PL_scd_src'
AS SELECT c_custkey, c_mktsegment, DATE '2024-01-01' AS valid_from,
          DATE '9999-12-31' AS valid_to, true AS is_current,
          CAST(c_custkey % 20 AS INT) AS bk
   FROM customer;
-- the delta: a segment change for every 50th key (effective 2024-06-01)
-- plus brand-new keys — three touched partitions out of twenty
CREATE TABLE scd_delta USING parquet LOCATION 'DBC_PL_scd_delta'
AS SELECT c_custkey, concat(c_mktsegment, ' (v2)') AS c_mktsegment,
          CAST(c_custkey % 20 AS INT) AS bk
   FROM customer WHERE c_custkey % 50 = 0
   UNION ALL
   SELECT 1000000 + c_custkey, 'NEWSEG' AS c_mktsegment, CAST(1 AS INT) AS bk
   FROM customer WHERE c_custkey % 97 = 0;
