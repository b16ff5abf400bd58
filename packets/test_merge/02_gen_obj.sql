-- the partitions the delta touches: ONE staging action per bk (the w01
-- batching idiom — generator grids are operational, not data)
SELECT CAST(NULL AS STRING) AS maint, bk
FROM mrg_delta GROUP BY bk ORDER BY bk
