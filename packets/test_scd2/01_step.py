# Seed the per-partition manifest layout
# (graft.engine.PartitionedManifest.registerSeedStep): one partitioned
# write job lays scd_seed out hive-style, each bk=N directory is ADOPTED
# (one rename, no data copy) as version 1 of its own MANIFEST root under
# DBC_PL_scd_src, the session view scd_dim is built over the current
# pointers, and the seed table is dropped. Resume-safe: if the seed
# table is already gone, only the view rebuilds.
