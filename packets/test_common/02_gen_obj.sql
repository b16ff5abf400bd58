-- grid generator (reference packets/test_common/02_gen_obj.sql): field 0
-- is the reserved `maint` pre-command, fields 1.. substitute GEN_OBJ_FLD_i
WITH grid_a AS (
  SELECT point_a, row_number() OVER (ORDER BY point_a) AS id
  FROM (SELECT explode(sequence(0, 100, 10)) AS point_a)
),
grid_b AS (
  SELECT point_b, row_number() OVER (ORDER BY point_b) AS id
  FROM (SELECT explode(sequence(10, 100, 10)) AS point_b)
)
SELECT
  CASE WHEN A.id % 10 = 1 THEN 'REFRESH TABLE region' END AS maint,
  A.point_a AS a,          -- GEN_OBJ_FLD_1
  B.point_b AS b,          -- GEN_OBJ_FLD_2
  'test value from gen_obj' AS c -- GEN_OBJ_FLD_3
FROM grid_a A
JOIN grid_b B ON A.id = B.id
ORDER BY A.id
