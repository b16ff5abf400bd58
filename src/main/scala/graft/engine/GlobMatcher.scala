package graft.engine

/** Database/target-list resolution with the reference's glob semantics:
  * `*` and `?` wildcards, `ALL`, `ALL,exclude:a,b*`, comma lists
  * (reference: psc/psccommon/psc_common.py:116-139 `match`,
  * db_converter.py:459-484 `init_dbs_list`).
  */
object GlobMatcher {

  /** Recursive wildcard match, same semantics as the reference's
    * psc_common.match (case-sensitive, `*` = any run, `?` = one char). */
  def matches(mask: String, text: String): Boolean = (mask, text) match {
    case ("", "") => true
    case ("", _) => false
    case (m, t) =>
      m.head match {
        case '*' =>
          // '*' consumes zero or more characters
          matches(m.tail, t) || (t.nonEmpty && matches(m, t.tail))
        case '?' => t.nonEmpty && matches(m.tail, t.tail)
        case c => t.nonEmpty && t.head == c && matches(m.tail, t.tail)
      }
  }

  /** Resolve a selector over configured target names, preserving config
    * order and de-duplicating:
    *  - "ALL" → everything
    *  - "ALL,exclude:a,b*" → everything except matches
    *  - "name1,na*me2,..." → union of glob matches
    */
  def resolve(selector: String, configured: Seq[String]): Seq[String] = {
    val sel = selector.trim
    if (sel.equalsIgnoreCase("ALL")) configured
    else if (sel.toUpperCase.startsWith("ALL,EXCLUDE:")) {
      val excl = sel.substring("ALL,exclude:".length)
        .split(",").map(_.trim).filter(_.nonEmpty)
      configured.filterNot(db => excl.exists(m => matches(m, db)))
    } else {
      val masks = sel.split(",").map(_.trim).filter(_.nonEmpty)
      configured.filter(db => masks.exists(m => matches(m, db)))
    }
  }
}
