-- this generator returns a list of objects
SELECT 'REFRESH TABLE region' AS maint, 'tbl_a' AS obj
UNION
SELECT 'REFRESH TABLE region', 'tbl_b'
UNION
SELECT null, 'tbl_c'
