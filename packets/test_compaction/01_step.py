# Adopt the run_once-created partitioned CTAS into the per-partition
# manifest layout (graft.engine.PartitionedManifest.registerSeedStep,
# registered via PartitionedManifest.ensurePacketPublishSteps):
# in-place renames — the sliver files move untouched, preserving the
# fragmentation this packet exists to repair — then expose cmp_tbl as
# an external partitioned catalog table over the current pointers.
# Resume-safe: already-adopted partitions are skipped, the catalog
# sync is a no-op diff.
