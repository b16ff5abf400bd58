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

  /** Deterministic per-row salt in [0, salt): hash of the whole row. */
  private def rowSalt(df: DataFrame, salt: Int): Column =
    pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salt))

  /** Inner equi-join of `big` ⋈ `small` on `key`, salted `salt` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    val bigS = big.withColumn("__salt", rowSalt(big, salt))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
