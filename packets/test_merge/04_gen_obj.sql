-- same grid as step 02: drop one published partition's stage table per
-- action
SELECT CAST(NULL AS STRING) AS maint, bk
FROM mrg_delta GROUP BY bk ORDER BY bk
