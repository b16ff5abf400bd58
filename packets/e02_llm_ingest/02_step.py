# ENCODE the corpus (t22 contract): read the merge table BACK FROM THE
# ARTIFACT in rank order (a fresh engine resuming here encodes
# identically — no in-memory coupling to step 01), materialize each
# document's token-id array via the constant-depth broadcast-rank-map
# apply, and stage (doc_id, token_ids) range-partitioned by doc_id at
# DBC_PL_e02_enc. Idempotent: overwrite write.
