-- publish: dynamic overwrite replaces only this bk's partition (see
-- test_merge/02_step.sql for the resume-idempotency reasoning)
INSERT OVERWRITE TABLE scd_dim PARTITION (bk)
SELECT c_custkey, c_mktsegment, valid_from, valid_to, is_current, bk
FROM scd_stage_GEN_OBJ_FLD_1;
