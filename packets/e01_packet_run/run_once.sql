-- setup executed BEFORE generators are evaluated (reference run_once
-- contract, dbccore.py:465-469): (re)create the output table at the
-- caller-supplied location (user placeholder DBC_PL_out_loc)
DROP TABLE IF EXISTS e01_out;
CREATE TABLE e01_out (r_name STRING, n_count BIGINT)
USING parquet LOCATION 'DBC_PL_out_loc';
