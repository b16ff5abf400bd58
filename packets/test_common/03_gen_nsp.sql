SELECT null AS maint, 'nsp_a' AS nsp
UNION
SELECT 'REFRESH TABLE nation', 'nsp_b'
UNION
SELECT null, 'nsp_c'
