-- the swap (reference 06_step.sql rename dance): drop the narrow table,
-- promote the widened one under the original name
DROP TABLE test_tbl;
ALTER TABLE test_tbl_new RENAME TO test_tbl;
