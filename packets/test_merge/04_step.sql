-- cleanup is a SEPARATE tracked step: if step 03's publish executed but
-- crashed before its WAL flush, the re-run retries the publish and the
-- stage table must still exist — dropping it inside the publish step
-- would make that retry fail permanently. IF EXISTS keeps this step's own
-- retry idempotent.
DROP TABLE IF EXISTS mrg_stage_GEN_OBJ_FLD_1;
