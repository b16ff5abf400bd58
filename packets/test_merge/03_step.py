# ATOMIC per-partition publish
# (graft.engine.PartitionedManifest.registerPublishStep): for each
# delta-touched bk (bounded: the delta's partition footprint), write the
# staged table mrg_stage_<bk> as that partition's next MANIFEST version
# and swap the pointer with one atomic rename — a reader of bk=N sees
# its complete old or new version, never the torn old/new file mix the
# previous INSERT OVERWRITE dynamic-partition publish exposed. mrg_tbl's catalog
# partition then re-points with one ALTER TABLE SET LOCATION (a single
# catalog operation). Untouched partitions' files are never rewritten
# (pinned by EngineSpec's write-job-UUID assertion). Idempotent under
# resume: re-publishing a partition writes a fresh version of the same
# rows — which is why the stage tables drop in step 04, not here.
