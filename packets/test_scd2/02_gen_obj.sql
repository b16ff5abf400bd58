-- same grid: publish one staged partition per action
SELECT CAST(NULL AS STRING) AS maint, bk
FROM scd_delta GROUP BY bk ORDER BY bk
