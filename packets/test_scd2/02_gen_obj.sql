-- the partitions the delta touches: one stage action per bk
SELECT CAST(NULL AS STRING) AS maint, bk
FROM scd_delta GROUP BY bk ORDER BY bk
