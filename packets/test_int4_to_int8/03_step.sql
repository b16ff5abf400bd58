-- validation (reference 04_step.sql NOT NULL check): row-count parity and
-- no NULL ids in the widened table
SELECT
  (SELECT count(*) FROM test_tbl) AS src_rows,
  (SELECT count(*) FROM test_tbl_new) AS dst_rows,
  (SELECT count(*) FROM test_tbl_new WHERE id IS NULL) AS null_ids;
