package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution has hot values.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense; this utility is the manual
  * fallback for the cases AQE cannot rewrite — e.g. a build side that
  * must shuffle anyway, pre-AQE plan stages, or bucketed layouts where
  * the partitioning is pinned.
  *
  * Shape: the BIG side scatters each row into one of `salt` sub-keys
  * (deterministic per-row hash — reproducible runs, no rand()); the
  * SMALL side replicates `salt`× via a literal-array explode. The join
  * key becomes (key, salt), so a hot key's rows spread over `salt`
  * reducers instead of one straggler. Result is row-identical to the
  * plain join (asserted in tests); cost is `salt`× the small side's
  * shuffle volume — pick salt ≈ hottest-key-share × parallelism.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Per-row salt in [0, salt). Uses the per-row unique id rather than a
    * row-content hash: EXACT-duplicate rows under a hot key (the common
    * shape after column pruning) must still spread — a content hash would
    * send them all to one sub-key and the straggler would survive. The
    * assignment varies with partitioning, which is fine: any assignment
    * yields the identical join result. */
  private def rowSalt(salt: Int): Column =
    pmod(xxhash64(monotonically_increasing_id()), lit(salt))

  /** Inner equi-join of `big` ⋈ `small` on `key`, salted `salt` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(!big.columns.contains(SaltCol) && !small.columns.contains(SaltCol),
      s"input already has a $SaltCol column")
    val bigS = big.withColumn(SaltCol, rowSalt(salt))
    val smallS = small.withColumn(SaltCol,
      explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, Seq(key, SaltCol)).drop(SaltCol)
  }
}
