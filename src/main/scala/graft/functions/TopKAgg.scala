package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: ordering is score DESC, id ASC (deterministic
  * tie-break so top-k boundaries are reproducible across engines). */
final case class ScoredId(score: Double, id: Long)

/** Bounded top-k as a typed [[Aggregator]] — the scale-correct shape for
  * per-group top-k: the partial (map-side) aggregate keeps AT MOST k
  * candidates per group per partition, so grouping n corpus rows by
  * query shuffles k·partitions rows per query instead of n (a window
  * `row_number <= k` would shuffle every scored row to its group's
  * reducer first). This is the custom-TypedColumn extension tier: no
  * built-in aggregate expresses a bounded heap.
  *
  * The buffer is a sorted Seq truncated to k; per-row insert first
  * checks against the current k-th score (O(1) reject for the vast
  * majority of rows once the heap warms), so the occasional re-sort
  * amortizes to ~O(log k) per accepted row.
  *
  * NaN scores (e.g. cosine against a zero-norm vector) are rejected at
  * the reduce input: a NaN can never rank, and admitting it would make
  * the `better` comparator inconsistent (NaN compares false both ways).
  * This is a deliberate behavior choice — "no similarity" beats the SQL
  * window formulation's NaN-ranks-first artifact.
  */
class TopKByScore(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Seq.empty

  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    if (x.score.isNaN) buf
    else if (buf.size >= k && !better(x, buf.last)) buf
    else ((buf :+ x).sortWith(better)).take(k)

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

/** A scored candidate CARRYING its stored vector — the payload variant
  * used by the PQ shortlist heap: FAISS's refine step re-scores the
  * shortlist with the exact vector, and carrying the vector through the
  * bounded heap is what keeps the corpus read-once (a post-shortlist
  * join back to the corpus would be a second full scan). Ordering is
  * identical to [[ScoredId]]: score DESC, id ASC. */
final case class ScoredVec(score: Double, id: Long, vec: Seq[Float])

/** Bounded top-k with a vector payload — same shape and NaN contract as
  * [[TopKByScore]]; the partial keeps at most k (score, id, vec) triples
  * per group per partition, so the shuffle per query is k·partitions
  * (score, id, dim-float) rows instead of the whole scored corpus. */
class TopKByScoreVec(k: Int)
    extends Aggregator[ScoredVec, Seq[ScoredVec], Seq[ScoredVec]] {

  private def better(a: ScoredVec, b: ScoredVec): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredVec] = Seq.empty

  override def reduce(buf: Seq[ScoredVec], x: ScoredVec): Seq[ScoredVec] =
    if (x.score.isNaN) buf
    else if (buf.size >= k && !better(x, buf.last)) buf
    else ((buf :+ x).sortWith(better)).take(k)

  override def merge(a: Seq[ScoredVec], b: Seq[ScoredVec]): Seq[ScoredVec] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[ScoredVec]): Seq[ScoredVec] = r

  override def bufferEncoder: Encoder[Seq[ScoredVec]] =
    ExpressionEncoder[Seq[ScoredVec]]()
  override def outputEncoder: Encoder[Seq[ScoredVec]] =
    ExpressionEncoder[Seq[ScoredVec]]()
}

/** Bounded k-smallest distinct-by-construction id set (signed ascending)
  * — the state-bounded replacement for `slice(sort_array(collect_set(id)),
  * 1, k)` in streaming aggregations: collect_set's buffer grows with the
  * bucket (a boilerplate band bucket at corpus scale holds millions of
  * members in the state store even though only k are emitted); this
  * partial keeps AT MOST k longs per group per partition, and the
  * watermark-scoped state row is <= k longs by construction. Callers
  * guarantee per-group id uniqueness (one row per (window, key, id)), so
  * no dedup pass is needed — the sorted merge-truncate is the whole
  * operator, and its result equals the collect_set formulation for any
  * bucket at or under k members. */
class MinKLongs(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Seq.empty
  override def reduce(buf: Seq[Long], x: Long): Seq[Long] =
    if (buf.size >= k && x >= buf.last) buf
    else ((buf :+ x).sorted).take(k)
  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).sorted.take(k)
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

/** One (id, signature) bucket member for the streaming SimHash twin. */
final case class IdSig(id: Long, sig: Long)

/** [[MinKLongs]] with a signature payload: k smallest members by id,
  * each carrying its 64-bit SimHash so the post-aggregation pair
  * expansion can verify hamming distance without a join back. Same
  * bounded-state contract: <= k (id, sig) pairs per group partial and
  * per state row. */
class MinKIdSigs(k: Int) extends Aggregator[IdSig, Seq[IdSig], Seq[IdSig]] {
  override def zero: Seq[IdSig] = Seq.empty
  override def reduce(buf: Seq[IdSig], x: IdSig): Seq[IdSig] =
    if (buf.size >= k && x.id >= buf.last.id) buf
    else ((buf :+ x).sortBy(_.id)).take(k)
  override def merge(a: Seq[IdSig], b: Seq[IdSig]): Seq[IdSig] =
    (a ++ b).sortBy(_.id).take(k)
  override def finish(r: Seq[IdSig]): Seq[IdSig] = r
  override def bufferEncoder: Encoder[Seq[IdSig]] =
    ExpressionEncoder[Seq[IdSig]]()
  override def outputEncoder: Encoder[Seq[IdSig]] =
    ExpressionEncoder[Seq[IdSig]]()
}
