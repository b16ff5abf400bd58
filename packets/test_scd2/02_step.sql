-- stage ONE delta-touched partition (static bk literal = PartitionFilters
-- pruning on the manifest-backed catalog table, the test_merge idiom —
-- the scan reads one partition's current version): untouched keys pass
-- through, a touched
-- key's CURRENT row closes at the effective date, its history rows are
-- copied byte-identical, and the delta contributes the new current row.
DROP TABLE IF EXISTS scd_stage_GEN_OBJ_FLD_1;
CREATE TABLE scd_stage_GEN_OBJ_FLD_1 USING parquet
LOCATION 'DBC_PL_scd_stage/bk_GEN_OBJ_FLD_1'
AS SELECT t.c_custkey, t.c_mktsegment, t.valid_from, t.valid_to,
          t.is_current, t.bk
   FROM scd_dim t
   LEFT ANTI JOIN scd_delta d ON t.c_custkey = d.c_custkey
   WHERE t.bk = GEN_OBJ_FLD_1
   UNION ALL
   SELECT t.c_custkey, t.c_mktsegment, t.valid_from,
          CASE WHEN t.is_current THEN DATE '2024-06-01' ELSE t.valid_to END
            AS valid_to,
          false AS is_current, t.bk
   FROM scd_dim t
   JOIN (SELECT DISTINCT c_custkey FROM scd_delta) d
     ON t.c_custkey = d.c_custkey
   WHERE t.bk = GEN_OBJ_FLD_1
   UNION ALL
   SELECT d.c_custkey, d.c_mktsegment, DATE '2024-06-01' AS valid_from,
          DATE '9999-12-31' AS valid_to, true AS is_current, d.bk
   FROM scd_delta d
   WHERE d.bk = GEN_OBJ_FLD_1;
