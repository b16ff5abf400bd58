# CURRICULUM order + PUBLISH (p26 contract over REAL token counts): the
# sqrt-flattened source mixture interleave ranks documents per source by
# encoded length and merges the streams by virtual time; the final
# (pos, doc_id, source, n_tokens, chunk_first) corpus publishes
# ATOMICALLY through the manifest at DBC_PL_e02_pub (version write ->
# one pointer swap -> single view re-point as e02_corpus).
