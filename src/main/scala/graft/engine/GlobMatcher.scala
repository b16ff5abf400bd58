package graft.engine

/** Database/target-list resolution with the reference's glob semantics:
  * `*` and `?` wildcards, `ALL`, `ALL,exclude:a,b*`, comma lists
  * (reference: psc/psccommon/psc_common.py:116-139 `match`,
  * db_converter.py:459-484 `init_dbs_list`).
  *
  * Deliberate divergences from the reference, documented:
  *  - psc_common.match's `?` branch requires len(mask) > 1, so a mask
  *    ending in `?` can never match its last character. We treat `?` as
  *    exactly-one-char everywhere (standard glob semantics).
  *  - the reference's recursive matcher is exponential on masks with many
  *    `*`; this is an iterative two-pointer matcher (O(|mask|·|text|)
  *    worst case, linear typical) — same language, no blow-up.
  * Parity kept: in `ALL,exclude:` lists an entry without `*` is an EXACT
  * name, not a pattern (init_dbs_list, db_converter.py:470-475).
  */
object GlobMatcher {

  /** Iterative glob match: `*` = any run (incl. empty), `?` = one char. */
  def matches(mask: String, text: String): Boolean = {
    var m = 0; var t = 0
    var starM = -1; var starT = -1
    while (t < text.length) {
      if (m < mask.length && (mask.charAt(m) == '?' || mask.charAt(m) == text.charAt(t))) {
        m += 1; t += 1
      } else if (m < mask.length && mask.charAt(m) == '*') {
        starM = m; starT = t; m += 1
      } else if (starM >= 0) {
        // backtrack: let the last '*' absorb one more char
        starT += 1; m = starM + 1; t = starT
      } else return false
    }
    while (m < mask.length && mask.charAt(m) == '*') m += 1
    m == mask.length
  }

  /** Resolve a selector over configured target names, preserving config
    * order and de-duplicating:
    *  - "ALL" → everything
    *  - "ALL,exclude:a,b*" → everything except exact name `a` and glob `b*`
    *  - "name1,na*me2,..." → union of glob matches
    */
  def resolve(selector: String, configured: Seq[String]): Seq[String] = {
    val sel = selector.trim
    // ALL / ALL,exclude: are case-insensitive keywords (reference
    // init_dbs_list upper-cases before comparing, db_converter.py:459-466)
    if (sel.equalsIgnoreCase("ALL")) configured
    else if (sel.toUpperCase.startsWith("ALL,EXCLUDE:")) {
      val excl = sel.substring("ALL,exclude:".length)
        .split(",").map(_.trim).filter(_.nonEmpty)
      configured.filterNot { db =>
        excl.exists(m => if (m.contains("*")) matches(m, db) else m == db)
      }
    } else {
      val masks = sel.split(",").map(_.trim).filter(_.nonEmpty)
      configured.filter(db => masks.exists(m => matches(m, db)))
    }
  }
}
