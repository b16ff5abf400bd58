-- batch grid over the live max(id) (reference 02_gen_obj.sql): one batch
-- per bk partition (span = DBC_PL_bk_grain ids), so each action's scan
-- and write touch exactly one partition. Every 5th batch carries a
-- maintenance pre-command (reference: vacuum analyze every 5th).
SELECT CASE WHEN (a div DBC_PL_bk_grain) % 5 = 1
            THEN 'REFRESH TABLE test_tbl' END AS maint,
       a,                           -- GEN_OBJ_FLD_1
       a + DBC_PL_bk_grain - 1 AS b -- GEN_OBJ_FLD_2
FROM (SELECT explode(sequence(0, (SELECT CAST(max(id) AS INT) FROM test_tbl),
                              DBC_PL_bk_grain)) AS a)
ORDER BY a
