-- one action per region (maint = field 0 reserved, unused here)
SELECT NULL AS maint, r_regionkey, r_name FROM region ORDER BY r_regionkey
