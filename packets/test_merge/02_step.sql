-- stage ONE delta-touched partition (a publish must not overwrite a
-- partition it is reading, so each action stages first): mrg_tbl is the
-- per-partition-manifest CATALOG table (partition locations = current
-- version dirs), so the static bk literal from the generator reaches
-- the scan as a PartitionFilter selecting exactly one partition's
-- current version files (plan-asserted in PlanAuditSpec). That is
-- what keeps merge cost proportional to the delta's partition footprint
-- at any scale. An IN-subquery over the delta would NOT prune (it plans
-- as a semi-join scanning every partition).
DROP TABLE IF EXISTS mrg_stage_GEN_OBJ_FLD_1;
CREATE TABLE mrg_stage_GEN_OBJ_FLD_1 USING parquet
LOCATION 'DBC_PL_mrg_stage/bk_GEN_OBJ_FLD_1'
AS SELECT t.c_custkey, t.c_name, t.c_acctbal, t.bk
   FROM mrg_tbl t
   LEFT ANTI JOIN mrg_delta d ON t.c_custkey = d.c_custkey
   WHERE t.bk = GEN_OBJ_FLD_1
   UNION ALL
   SELECT c_custkey, c_name, c_acctbal, bk FROM mrg_delta
   WHERE bk = GEN_OBJ_FLD_1;
