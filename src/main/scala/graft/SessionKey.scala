package graft

/** Stable, never-aliasing per-session cache key.
  *
  * Session-scoped memo caches (staged-artifact tags, frozen scalars,
  * broadcast handles) must not key on `System.identityHashCode(spark)`:
  * after a session is stopped and collected, a NEW SparkSession can be
  * allocated at the same address and inherit the dead session's
  * validated-tag entries — silently skipping the on-disk `_GRAFT_TAG`
  * re-check the cross-session staleness contract relies on. The classic
  * session UUID is unique per session object and can never recur.
  */
object SessionKey {
  def of(spark: org.apache.spark.sql.SparkSession): String = spark match {
    case _: org.apache.spark.sql.classic.SparkSession =>
      org.apache.spark.sql.graft.ColumnBridge.sessionUUID(spark)
    // non-classic sessions don't occur in this engine (local JVM only);
    // degrade to the identity hash rather than fail
    case other => "idhash-" + System.identityHashCode(other)
  }
}
