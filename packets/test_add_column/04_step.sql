SELECT s_suppkey, s_name, s_nationkey, s_acctbal, acct_band
FROM evo_tbl ORDER BY s_suppkey;
