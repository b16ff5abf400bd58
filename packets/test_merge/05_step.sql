-- validation (reference 04_step.sql parity-check slot): every delta key
-- must be present exactly once, updates marked, inserts landed
SELECT
  (SELECT count(*) FROM mrg_tbl) AS total_rows,
  (SELECT count(*) FROM mrg_tbl WHERE c_name LIKE '% (upd)') AS updated_rows,
  (SELECT count(*) FROM mrg_tbl WHERE c_custkey > 1000000) AS inserted_rows;
