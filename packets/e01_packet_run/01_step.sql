INSERT INTO e01_out
SELECT 'GEN_OBJ_FLD_2' AS r_name, count(*) AS n_count
FROM nation
WHERE n_regionkey = GEN_OBJ_FLD_1;
