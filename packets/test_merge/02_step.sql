-- publish: dynamic partition overwrite replaces ONLY the partitions
-- present in the staged rows (bk 0 and 1); the other eighteen partitions'
-- files are untouched (pinned by EngineSpec's file-mtime assertion)
INSERT OVERWRITE TABLE mrg_tbl PARTITION (bk)
SELECT c_custkey, c_name, c_acctbal, bk FROM mrg_stage;
DROP TABLE mrg_stage;
