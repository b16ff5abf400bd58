# TRAIN the tokenizer (graft.engine.LlmIngestSteps, registered via
# ensureE02Steps): batched BPE over the corpus word table — one
# pair-count scan per round accepting up to batchR greedily-independent
# merges (the t23 training contract, vocabulary-scale cost) — then
# persist the learned (rank, a, b) merge table as the TOKENIZER
# ARTIFACT at DBC_PL_e02_art (the t24 contract: training is an ingest
# step; every consumer reads the artifact, nobody retrains).
# Idempotent: overwrite write; resumed runs tracker-skip this action.
