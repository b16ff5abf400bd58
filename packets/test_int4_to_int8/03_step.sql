-- CAPTURE (reference 01_step.sql's BEFORE INSERT trigger keeps id_new
-- current for rows arriving DURING the backfill; a parquet target has no
-- triggers, so the native twin is snapshot-diff capture): one anti-join
-- finds every source row the batched backfill missed — concurrent
-- appends, late arrivals — and stages it in a capture table. At 100 TB
-- the anti-join ships only ids on the build side and the capture table
-- is bounded by the write rate during the backfill window, not by the
-- table size.
DROP TABLE IF EXISTS test_tbl_catchup;
CREATE TABLE test_tbl_catchup USING parquet LOCATION 'DBC_PL_mig_catch'
AS SELECT CAST(t.id AS BIGINT) AS id, t.val, t.bk
   FROM test_tbl t
   WHERE NOT EXISTS (SELECT 1 FROM test_tbl_new n
                     WHERE n.id = CAST(t.id AS BIGINT));
