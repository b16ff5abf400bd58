-- SCD2 invariants, FAIL LOUD before anyone reads the dimension:
-- every key has exactly one current row, and no row's interval is
-- empty/inverted. Single-pass: one grouped scan + one row scan.
SELECT keys_bad, order_bad,
  CASE WHEN keys_bad = 0 AND order_bad = 0 THEN 'ok'
    ELSE raise_error(concat('w04 validation failed: keys_bad=',
      CAST(keys_bad AS STRING), ' order_bad=', CAST(order_bad AS STRING)))
  END AS validation
FROM (
  SELECT count(*) AS keys_bad FROM (
    SELECT c_custkey FROM scd_dim GROUP BY c_custkey
    HAVING sum(CASE WHEN is_current THEN 1 ELSE 0 END) <> 1) g
) a
CROSS JOIN (
  SELECT count(CASE WHEN valid_from >= valid_to THEN 1 END) AS order_bad
  FROM scd_dim
) b;
