package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group quotas — the C4/Gopher-style curation step that caps how
  * much any one source (domain, crawl host, shard) contributes to the
  * corpus, keeping each group's best rows by a score.
  *
  * The window formulation (`row_number() OVER (PARTITION BY group ORDER
  * BY score)` then `<= k`) shuffles EVERY row to its group's reducer and
  * sorts whole groups — a hot domain with 10^9 pages sorts 10^9 rows to
  * discard all but k. This instead reuses [[graft.functions.TopKByScore]],
  * the bounded typed Aggregator: map-side partials keep at most k
  * candidates per (group, partition), so the shuffle is k·partitions rows
  * per group no matter how hot the group (the s04 retrieval shape,
  * plan-asserted here too).
  *
  * Ordering is score DESC with id ASC tie-break — deterministic quota
  * boundaries, replayable by any engine's ranked window.
  *
  * @return (groupCol, rank 1..k, idCol, score) — at most k rows per group
  */
object Quota {

  def keepTopKPerGroup(
      df: DataFrame, groupCol: String, idCol: String, scoreCol: String,
      k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    df.select(col(groupCol),
        col(scoreCol).cast("double").as("score"),
        col(idCol).cast("long").as("id"))
      .groupBy(col(groupCol))
      // the udaf takes the ScoredId FIELDS as its argument list
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("rank", "s")))
      .select(col(groupCol), (col("rank") + 1).cast("long").as("rank"),
        col("s.id").as(idCol), col("s.score").as("score"))
  }
}
