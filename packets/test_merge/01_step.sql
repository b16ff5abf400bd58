-- the MERGE body, staged (Spark forbids overwriting a table it reads):
-- matched base rows are replaced by the delta's values via the anti-join,
-- unmatched delta rows insert; only delta-touched partitions are read
-- (the bk IN pushdown prunes the base scan to the affected partitions)
CREATE TABLE mrg_stage USING parquet LOCATION 'DBC_PL_mrg_stage'
AS SELECT t.c_custkey, t.c_name, t.c_acctbal, t.bk
   FROM mrg_tbl t
   LEFT ANTI JOIN mrg_delta d ON t.c_custkey = d.c_custkey
   WHERE t.bk IN (SELECT DISTINCT bk FROM mrg_delta)
   UNION ALL
   SELECT c_custkey, c_name, c_acctbal, bk FROM mrg_delta;
