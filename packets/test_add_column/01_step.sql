-- "ALTER TABLE evo_tbl ADD COLUMN acct_band STRING" + backfill, as
-- copy-on-write: parquet cannot backfill in place, so the widened table
-- is rebuilt once with the new column computed — one scan, one write
CREATE TABLE evo_tbl_new
  (s_suppkey BIGINT, s_name STRING, s_nationkey BIGINT,
   s_acctbal DOUBLE, acct_band STRING)
USING parquet LOCATION 'DBC_PL_evo_dst';
INSERT INTO evo_tbl_new
SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
  CASE WHEN s_acctbal < 0 THEN 'neg'
       WHEN s_acctbal < 5000 THEN 'mid'
       ELSE 'high' END
FROM evo_tbl;
