-- DELETE on parquet = anti-filter rewrite + swap (SURVEY.md §2.2 DELETE
-- row: `df.join(del, keys, "left_anti")`); Delta targets would run a
-- native DELETE. Source table seeded from the nation fixture.
DROP VIEW IF EXISTS del_tbl;
DROP TABLE IF EXISTS del_tbl;
DROP TABLE IF EXISTS del_tbl_rw;
CREATE TABLE del_tbl USING parquet LOCATION 'DBC_PL_del_src'
AS SELECT n_nationkey, n_name, n_regionkey FROM nation;
