-- batch grid over the live max(id), 1000 ids per action; every 5th batch
-- carries a maintenance pre-command (reference 02_gen_obj.sql: vacuum
-- analyze every 5th) — REFRESH keeps the scan snapshot current here
SELECT CASE WHEN (a div 1000) % 5 = 1 THEN 'REFRESH TABLE test_tbl' END AS maint,
       a,               -- GEN_OBJ_FLD_1
       a + 999 AS b     -- GEN_OBJ_FLD_2
FROM (SELECT explode(sequence(0, (SELECT CAST(max(id) AS INT) FROM test_tbl), 1000)) AS a)
ORDER BY a
