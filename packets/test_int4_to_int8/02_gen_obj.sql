-- batch grid over the live max(id) (reference 02_gen_obj.sql). The span
-- is scale-adaptive: ~20 batches regardless of table size (batch SIZE
-- grows with the data, batch COUNT stays constant — at 100 TB you want
-- bounded action count, not bounded ids-per-action), aligned to the
-- 1000-id partition grain so each overwrite hits whole partitions.
-- Every 5th batch carries a maintenance pre-command (reference: vacuum
-- analyze every 5th).
WITH bounds AS (
  SELECT CAST(max(id) AS INT) AS maxid,
         CAST(1000 * ceil(max(id) / 20000.0) AS INT) AS step
  FROM test_tbl
)
SELECT CASE WHEN (a div (SELECT step FROM bounds)) % 5 = 1
            THEN 'REFRESH TABLE test_tbl' END AS maint,
       a,                                      -- GEN_OBJ_FLD_1
       a + (SELECT step FROM bounds) - 1 AS b  -- GEN_OBJ_FLD_2
FROM (SELECT explode(sequence(0, (SELECT maxid FROM bounds),
                              (SELECT step FROM bounds))) AS a)
ORDER BY a
