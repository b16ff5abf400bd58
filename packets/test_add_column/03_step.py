# Atomic publish of the widened table (graft.engine.ManifestTable): the
# backfilled evo_tbl_new becomes the next MANIFEST version under the
# DBC_PL_evo_pub root; the pointer swap is one atomic rename and the
# session view re-points in one catalog operation — replaces the
# non-atomic DROP + RENAME swap. Runs only after the 02 validation step
# passed (the fail-loud rule: a corrupt widened table never publishes).
