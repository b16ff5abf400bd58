-- batched backfill (reference 02_step.sql batched UPDATE): each action
-- rewrites exactly the partition its id range covers — idempotent under
-- resume because dynamic INSERT OVERWRITE replaces, never appends.
-- The bk equality is the partition-pruning twin of the id range: without
-- it every batch would rescan the WHOLE table (batch cost ∝ table size);
-- with it the scan reads only the batch's own partition (batch cost ∝
-- batch size — the property that survives 100x growth).
INSERT OVERWRITE TABLE test_tbl_new PARTITION (bk)
SELECT CAST(id AS BIGINT) AS id, val, bk
FROM test_tbl
WHERE bk = GEN_OBJ_FLD_1 div DBC_PL_bk_grain
  AND id >= GEN_OBJ_FLD_1 AND id <= GEN_OBJ_FLD_2;
