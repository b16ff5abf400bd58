-- same grid: drop one published partition's stage table per action
SELECT CAST(NULL AS STRING) AS maint, bk
FROM scd_delta GROUP BY bk ORDER BY bk
