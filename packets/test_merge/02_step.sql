-- publish: dynamic partition overwrite replaces ONLY this bk's partition;
-- every other partition's files are untouched (pinned by EngineSpec's
-- write-job-UUID assertion). Idempotent under resume: re-running the
-- action re-overwrites the same partition with the same rows — which is
-- why the stage table is dropped in step 03, not here (a crash between
-- this action and its WAL flush retries it, needing the stage intact).
INSERT OVERWRITE TABLE mrg_tbl PARTITION (bk)
SELECT c_custkey, c_name, c_acctbal, bk FROM mrg_stage_GEN_OBJ_FLD_1;
