-- cleanup as its own tracked step (crash-retry keeps the stage intact
-- until the publish step's WAL flush — see test_merge/04_step.sql)
DROP TABLE IF EXISTS scd_stage_GEN_OBJ_FLD_1;
