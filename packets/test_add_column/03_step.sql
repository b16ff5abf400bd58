DROP TABLE evo_tbl;
ALTER TABLE evo_tbl_new RENAME TO evo_tbl;
