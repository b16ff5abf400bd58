-- reference 01_step.sql adds the bigint shadow column; the parquet-native
-- twin is a widened target table (same partitioning, id now BIGINT)
CREATE TABLE test_tbl_new (id BIGINT, val STRING, bk INT)
USING parquet PARTITIONED BY (bk) LOCATION 'DBC_PL_mig_dst';
