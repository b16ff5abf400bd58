SELECT null AS maint, 'nsp_d' AS nsp
UNION
SELECT null, 'nsp_e'
UNION
SELECT 'REFRESH TABLE nation', 'nsp_f'
