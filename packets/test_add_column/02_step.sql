-- fail-loud validation BEFORE the swap (the w01 single-pass rule): one
-- aggregate scan of the widened table (count + backfill-null count)
-- plus one count of the source; raise_error only on the failing branch
SELECT src_rows, dst_rows, null_bands,
  CASE WHEN dst_rows = src_rows AND null_bands = 0
    THEN 'ok'
    ELSE raise_error(concat('add-column validation failed: src_rows=',
      CAST(src_rows AS STRING), ' dst_rows=', CAST(dst_rows AS STRING),
      ' null_bands=', CAST(null_bands AS STRING)))
  END AS validation
FROM (
  SELECT count(*) AS dst_rows,
    count(CASE WHEN acct_band IS NULL THEN 1 END) AS null_bands
  FROM evo_tbl_new
) dst
CROSS JOIN (
  SELECT count(*) AS src_rows FROM evo_tbl
) src;
