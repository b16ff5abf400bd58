# Adopt the run_once-created partitioned CTAS into the per-partition
# manifest layout (graft.engine.PartitionedManifest.registerSeedStep):
# drop the CTAS catalog entry (files stay), move each bk=N dir into its
# v000001 version dir behind a MANIFEST pointer (two renames, zero
# bytes rewritten), and expose scd_dim as an external partitioned
# catalog table over the current pointers. Resume-safe: adopted
# partitions are skipped.
