-- Online int4→int8 PK widening, Spark-native re-expression of the
-- reference's flagship migration (packets/test_int4_to_int8/*.sql,
-- tests/test_packets.py:500-544). On parquet there is no in-place ALTER
-- COLUMN TYPE or row-level UPDATE; the native shape is: build the
-- widened table batch-by-batch with idempotent partition overwrites,
-- validate, then swap names. Delta/Iceberg targets would use MERGE INTO
-- with the same generator-driven batching.
--
-- DBC_PL_bk_grain (ids per partition) is supplied by the caller sized to
-- the data (≈ max_id / 20): partition COUNT and batch COUNT stay bounded
-- as the table grows — the property that survives 100x scale — while
-- batch SIZE grows.
SET spark.sql.sources.partitionOverwriteMode=dynamic;
DROP TABLE IF EXISTS test_tbl;
DROP TABLE IF EXISTS test_tbl_new;
DROP TABLE IF EXISTS test_tbl_catchup;
CREATE TABLE test_tbl USING parquet PARTITIONED BY (bk) LOCATION 'DBC_PL_mig_src'
AS SELECT CAST(o_orderkey AS INT) AS id, o_orderstatus AS val,
          CAST(o_orderkey div DBC_PL_bk_grain AS INT) AS bk
   FROM orders;
