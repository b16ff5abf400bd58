# COMPACTION step (graft.engine.PartitionedManifest.
# registerCompactionStep): every partition whose live version holds
# more than maxFiles data files under the small-file threshold is
# rewritten content-preservingly through commitSnapshot's ONE
# hive-partitioned rebalance job and published in ONE atomic snapshot;
# partitions already at target layout keep their version directories
# byte-for-byte. Candidate selection is a driver-side directory
# listing — no data is read to decide. Resume/re-run safe by
# CONVERGENCE: a compacted partition has no small files left, so a
# replayed step selects nothing and commits nothing (no snapshot
# churn). The catalog table re-points per flip (SET LOCATION), keeping
# PartitionFilters pruning on the serving path.
