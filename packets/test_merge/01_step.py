# Adopt the run_once-created partitioned CTAS into the per-partition
# manifest layout (graft.engine.PartitionedManifest.registerSeedStep,
# registered via PartitionedManifest.ensurePacketPublishSteps):
#   1. drop the CTAS's catalog entry (external - the files stay);
#   2. move each bk=N directory into its v000001 version dir and write
#      its MANIFEST pointer - two renames per partition, zero bytes
#      rewritten (the in-place migration a 100 TB table needs);
#   3. expose mrg_tbl as an external partitioned catalog table whose
#      partition LOCATIONs are the current version directories.
# Resume-safe: already-adopted partitions are skipped, the catalog sync
# is a no-op diff.
