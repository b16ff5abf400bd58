-- schema-evolution fixture: seed the dimension from the supplier table
-- (reference analog: the int4_to_int8 seeding pattern,
-- /root/reference/packets/test_int4_to_int8; here the migration is
-- ADD COLUMN + backfill instead of a type widening)
DROP VIEW IF EXISTS evo_tbl;
DROP TABLE IF EXISTS evo_tbl;
DROP TABLE IF EXISTS evo_tbl_new;
CREATE TABLE evo_tbl USING parquet LOCATION 'DBC_PL_evo_src'
AS SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier;
