package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) cardinality sketch as a typed [[Aggregator]]:
  * the buffer is the k smallest DISTINCT hash values under UNSIGNED
  * 64-bit ordering — exactly the KMV synopsis, and `merge` is exactly
  * the KMV union (merge, dedup, truncate). Distributed-sketch shape:
  * map-side partials are bounded at k longs per group per partition, so
  * a 100 TB scan shuffles k·partitions longs per group, never the token
  * stream (same bounded-partial pattern as [[TopKByScore]], proven
  * map-side in PlanAuditSpec for s04).
  *
  * Unlike HLL (Spark's approx_count_distinct), every step here is
  * integer-exact and engine-independent: hashes are md5-derived
  * ([[SimHashFns.tokenHash]]), the ordering is plain unsigned
  * comparison, and the estimator ((k-1)·2^64 div u_k) is one HUGEINT
  * division — so a second engine replays the sketch AND the estimate
  * bit-for-bit. Estimator: Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations" (SIGMOD 2007).
  *
  * Duplicates collapse inside the sketch (equal value = equal hash), so
  * no pre-`distinct` shuffle is needed: the sketch of a multiset IS the
  * sketch of its support set.
  */
class KMinLongs(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  private def lt(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) < 0

  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], x: Long): Seq[Long] =
    if (buf.size >= k && !lt(x, buf.last)) buf // O(1) reject once warm
    else if (buf.contains(x)) buf
    else ((buf :+ x).sortWith(lt)).take(k)

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sortWith(lt).take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
