-- "DELETE FROM del_tbl WHERE n_regionkey = 2" as an anti-filter rewrite
CREATE TABLE del_tbl_rw (n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT)
USING parquet LOCATION 'DBC_PL_del_dst';
INSERT INTO del_tbl_rw
SELECT n_nationkey, n_name, n_regionkey FROM del_tbl
WHERE NOT (n_regionkey = 2);
