# Seed the per-partition manifest layout
# (graft.engine.PartitionedManifest.registerSeedStep, registered via
# PartitionedManifest.ensurePacketPublishSteps):
#   1. one partitioned write job lays mrg_seed out hive-style under a
#      scratch dir; each bk=N directory is ADOPTED (one rename, no data
#      copy) as version 1 of its own MANIFEST root under DBC_PL_mrg_src;
#   2. the session view mrg_tbl is built over the current pointers (one
#      catalog operation) and the seed table is dropped.
# Resume-safe: if the seed table is already gone, only the view rebuilds.
