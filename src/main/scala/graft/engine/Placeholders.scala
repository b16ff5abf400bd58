package graft.engine

/** Placeholder substitution passes (reference order preserved):
  *  1. user placeholders `DBC_PL_<K>` applied at packet parse time
  *     (db_converter.py:299-303, dbccore.py:275-278);
  *  2. generator fields `GEN_OBJ_FLD_i` / `GEN_NSP_FLD_i` (1-based; field 0
  *     is the reserved `maint` pre-command) applied at fan-out
  *     (dbccore.py:30-36; contract in packets/test_common/02_gen_obj.sql).
  */
object Placeholders {

  /** Longer keys substitute first so DBC_PL_AB isn't clobbered by a
    * DBC_PL_A replacement arriving earlier in map iteration order
    * (the reference folds in dict order, dbccore.py:275-278 — we fix the
    * prefix hazard deliberately; same order guarantee as applyGenRow). */
  def applyUser(sql: String, placeholders: Map[String, String]): String =
    placeholders.toSeq.sortBy { case (k, _) => (-k.length, k) }
      .foldLeft(sql) { case (acc, (k, v)) => acc.replace(s"DBC_PL_$k", v) }

  /** Substitute one generator row. Field 0 (the `maint` command) is NOT
    * substituted into the text — it is returned separately by the caller.
    * Longer indices substitute first so FLD_10 isn't clobbered by FLD_1. */
  def applyGenRow(sql: String, prefix: String, row: Seq[String]): String = {
    val indexed = row.zipWithIndex.drop(1) // skip maint at index 0
    indexed.sortBy(-_._2).foldLeft(sql) { case (acc, (v, i)) =>
      acc.replace(s"${prefix}_FLD_$i", v)
    }
  }

  def applyObjRow(sql: String, row: Seq[String]): String =
    applyGenRow(sql, "GEN_OBJ", row)
  def applyNspRow(sql: String, row: Seq[String]): String =
    applyGenRow(sql, "GEN_NSP", row)

  /** Leftover placeholder detection — running a step with unresolved
    * tokens is an authoring error. */
  def unresolved(sql: String): Seq[String] =
    "(DBC_PL_[A-Za-z0-9_]+|GEN_(?:OBJ|NSP)_FLD_[0-9]+)".r
      .findAllIn(sql).toSeq.distinct
}
