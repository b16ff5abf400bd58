-- CATCH-UP: rebuild exactly the partitions the capture step flagged,
-- FROM THE SOURCE (not from the capture table): the overwrite is then
-- idempotent under crash-resume — replaying it re-copies the same
-- partitions from the same snapshot — and never reads the table it
-- writes. Partitions without missed rows are untouched (same
-- partition-scoped cost model as the 02_step backfill). A quiet source
-- (the plain w01 run) captures zero rows and this overwrites nothing.
INSERT OVERWRITE TABLE test_tbl_new PARTITION (bk)
SELECT CAST(id AS BIGINT) AS id, val, bk
FROM test_tbl
WHERE bk IN (SELECT DISTINCT bk FROM test_tbl_catchup);
