SELECT r_name, n_count FROM e01_out ORDER BY r_name;
