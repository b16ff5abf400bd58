-- setup executed BEFORE generators are evaluated (reference run_once
-- contract, dbccore.py:465-469): (re)create the output table
DROP TABLE IF EXISTS e01_out;
CREATE TABLE e01_out (r_name STRING, n_count BIGINT) USING parquet;
