-- validation (reference 04_step.sql NOT NULL check): row-count parity,
-- no NULL ids, no duplicate ids — and FAIL LOUD before the swap: a
-- double-applied catch-up (dst_rows > dst_ids), a missed capture
-- (dst_rows != src_rows), or a widening that nulled ids raises here,
-- so 06_step's swap never publishes a corrupt table. CASE evaluates
-- raise_error only on the failing branch. Single-pass: ONE aggregate
-- scan of test_tbl_new (count / null-count / distinct-count together)
-- plus one count of test_tbl — not four scalar subqueries.
SELECT src_rows, dst_rows, null_ids, dst_ids,
  CASE WHEN dst_rows = src_rows AND null_ids = 0 AND dst_ids = dst_rows
    THEN 'ok'
    ELSE raise_error(concat('w01 validation failed: src_rows=',
      CAST(src_rows AS STRING), ' dst_rows=', CAST(dst_rows AS STRING),
      ' null_ids=', CAST(null_ids AS STRING),
      ' dst_ids=', CAST(dst_ids AS STRING)))
  END AS validation
FROM (
  SELECT count(*) AS dst_rows,
    count(CASE WHEN id IS NULL THEN 1 END) AS null_ids,
    count(DISTINCT id) AS dst_ids
  FROM test_tbl_new
) dst
CROSS JOIN (
  SELECT count(*) AS src_rows FROM test_tbl
) src;
