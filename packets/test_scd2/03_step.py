# ATOMIC per-partition publish
# (graft.engine.PartitionedManifest.registerPublishStep): each
# delta-touched bk's staged table scd_stage_<bk> becomes that
# partition's next MANIFEST version behind one atomic pointer swap —
# history readers of bk=N see its complete old or new version, never
# the torn mix the previous INSERT OVERWRITE exposed. scd_dim's touched
# catalog partitions re-point with one ALTER TABLE SET LOCATION each; untouched
# partitions' files are never rewritten. Stage tables drop in step 04
# (crash-retry keeps the stage intact until the publish's WAL flush).
