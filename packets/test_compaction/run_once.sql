-- Small-file compaction as a MAINTENANCE packet: the reference runs
-- table upkeep (VACUUM-ish work) through the same run/track machinery
-- as its migrations (packet type `maintenance`); on parquet the
-- upkeep target is FILE LAYOUT — many writer slivers per partition
-- (the streaming-ingest / small-delta anti-pattern) compact into
-- advisory-sized files behind one atomic snapshot publish.
--
-- The seed deliberately writes the anti-pattern: REPARTITION(4) is a
-- round-robin split, so every one of the 4 writer tasks holds rows of
-- every bk value and the partitioned CTAS lands ~4 sliver files in
-- every bk=N directory.
DROP TABLE IF EXISTS cmp_tbl;
DROP VIEW IF EXISTS cmp_tbl;
DROP VIEW IF EXISTS cmp_seed;
DROP TABLE IF EXISTS cmp_seed;
CREATE TABLE cmp_seed USING parquet PARTITIONED BY (bk) LOCATION 'DBC_PL_cmp_src'
AS SELECT /*+ REPARTITION(4) */ s_suppkey, s_name, s_acctbal,
          CAST(s_nationkey % 5 AS INT) AS bk
   FROM supplier;
