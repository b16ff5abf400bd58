-- template step: replace with your SQL
SELECT 1 AS ok;
