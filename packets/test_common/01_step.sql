-- smoke no-op step (reference packets/test_common/01_step.sql is a
-- PL/pgSQL PERFORM; the Spark-dialect twin is a trivial SELECT)
SELECT 1 AS ok;
