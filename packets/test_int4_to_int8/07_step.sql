-- final report resultset
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(id) AS BIGINT) AS min_id,
       CAST(max(id) AS BIGINT) AS max_id,
       CAST(sum(id) AS BIGINT) AS sum_id
FROM test_tbl;
