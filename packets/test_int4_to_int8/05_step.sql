-- validation (reference 04_step.sql NOT NULL check): row-count parity,
-- no NULL ids, and no duplicate ids (a double-applied catch-up append
-- would surface here as dst_rows > dst_ids — fail loud before the swap)
SELECT
  (SELECT count(*) FROM test_tbl) AS src_rows,
  (SELECT count(*) FROM test_tbl_new) AS dst_rows,
  (SELECT count(*) FROM test_tbl_new WHERE id IS NULL) AS null_ids,
  (SELECT count(DISTINCT id) FROM test_tbl_new) AS dst_ids;
