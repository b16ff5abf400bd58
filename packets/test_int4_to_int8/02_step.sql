-- batched backfill (reference 02_step.sql batched UPDATE): each action
-- rewrites exactly the partitions its id range covers — idempotent under
-- resume because dynamic INSERT OVERWRITE replaces, never appends
INSERT OVERWRITE TABLE test_tbl_new PARTITION (bk)
SELECT CAST(id AS BIGINT) AS id, val, bk
FROM test_tbl
WHERE id >= GEN_OBJ_FLD_1 AND id <= GEN_OBJ_FLD_2;
