-- validation (fail-loud, the w01 rule): compaction must be
-- content-preserving — same row count, same distinct keys as the
-- source the seed derived from; raise_error only on the failing branch
SELECT CASE
    WHEN (SELECT count(*) FROM cmp_tbl) =
         (SELECT count(*) FROM supplier)
     AND (SELECT count(DISTINCT s_suppkey) FROM cmp_tbl) =
         (SELECT count(*) FROM supplier)
    THEN 'compaction content verified'
    ELSE raise_error(concat('compaction validation failed: tbl_rows=',
      CAST((SELECT count(*) FROM cmp_tbl) AS STRING), ' src_rows=',
      CAST((SELECT count(*) FROM supplier) AS STRING)))
  END AS check;
