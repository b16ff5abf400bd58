-- setup executed BEFORE generators are evaluated (reference run_once
-- contract, dbccore.py:465-469): expose the ingest corpus under the
-- packet's stable name. The steps also fall back to `documents`
-- directly, so a resume in a FRESH session (where this run_once is
-- tracker-deduped and will not re-execute) still finds its input.
CREATE OR REPLACE TEMPORARY VIEW e02_docs AS
SELECT doc_id, source, text FROM documents;
