-- validation (reference 04_step.sql NOT NULL check): row-count parity,
-- no NULL ids, no duplicate ids — and FAIL LOUD before the swap: a
-- double-applied catch-up (dst_rows > dst_ids), a missed capture
-- (dst_rows != src_rows), or a widening that nulled ids raises here,
-- so 06_step's swap never publishes a corrupt table. CASE evaluates
-- raise_error only on the failing branch.
SELECT src_rows, dst_rows, null_ids, dst_ids,
  CASE WHEN dst_rows = src_rows AND null_ids = 0 AND dst_ids = dst_rows
    THEN 'ok'
    ELSE raise_error(concat('w01 validation failed: src_rows=',
      CAST(src_rows AS STRING), ' dst_rows=', CAST(dst_rows AS STRING),
      ' null_ids=', CAST(null_ids AS STRING),
      ' dst_ids=', CAST(dst_ids AS STRING)))
  END AS validation
FROM (
  SELECT
    (SELECT count(*) FROM test_tbl) AS src_rows,
    (SELECT count(*) FROM test_tbl_new) AS dst_rows,
    (SELECT count(*) FROM test_tbl_new WHERE id IS NULL) AS null_ids,
    (SELECT count(DISTINCT id) FROM test_tbl_new) AS dst_ids
);
