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
