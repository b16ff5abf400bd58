# PACK the token stream (p28 contract): real BPE token counts from the
# staged arrays feed the distributed prefix sum (range partitions ->
# per-partition subtotals -> broadcast offsets; never a single-partition
# window), cutting the global stream into 512-token context windows.
# Output (doc_id, n_tokens, tok_start, chunk_first, chunk_last) at
# DBC_PL_e02_pack. Idempotent: overwrite write.
