DROP TABLE del_tbl;
ALTER TABLE del_tbl_rw RENAME TO del_tbl;
