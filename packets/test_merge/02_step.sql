-- publish: dynamic partition overwrite replaces ONLY this bk's partition;
-- every other partition's files are untouched (pinned by EngineSpec's
-- write-job-UUID assertion). Idempotent under resume: re-running the
-- action re-overwrites the same partition with the same rows.
INSERT OVERWRITE TABLE mrg_tbl PARTITION (bk)
SELECT c_custkey, c_name, c_acctbal, bk FROM mrg_stage_GEN_OBJ_FLD_1;
DROP TABLE mrg_stage_GEN_OBJ_FLD_1;
