SELECT n_nationkey, n_name, n_regionkey FROM del_tbl ORDER BY n_nationkey;
