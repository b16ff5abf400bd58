-- post-check placeholder (reference 05_step.sql raise-exception slot)
SELECT 1 AS post_check;
