-- same grid as step 01: publish one staged partition per action
SELECT CAST(NULL AS STRING) AS maint, bk
FROM mrg_delta GROUP BY bk ORDER BY bk
