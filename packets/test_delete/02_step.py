# Atomic publish of the rewritten table (graft.engine.ManifestTable,
# registered via ManifestTable.ensurePacketPublishSteps):
#   1. write del_tbl_rw's rows as the next MANIFEST version directory
#      under the DBC_PL_del_pub root (complete copy-on-write version);
#   2. swap the MANIFEST pointer with one atomic rename — any reader,
#      in this session or another engine, sees the old or the new
#      del_tbl, never a mixture and never a missing table;
#   3. re-point the session view del_tbl (one catalog operation) and
#      drop the staging table.
# Replaces the non-atomic `DROP TABLE del_tbl; ALTER TABLE del_tbl_rw
# RENAME TO del_tbl` swap.
