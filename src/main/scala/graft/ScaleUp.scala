package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic 10x scale-up of the sf0.1 fixtures for the sf1 bench
  * rehearsal: `runMain graft.ScaleUp <srcDir> <outDir> [replicas]`.
  *
  * TPC-H-style scaling — each replica shifts every key space by
  * `replica * (max_key + 1)` so joins stay within-replica and every join /
  * group-by selectivity matches sf0.1 exactly; dimension tables (region,
  * nation) keep their fixed TPC-H cardinality. Two content columns get a
  * replica-keyed transform so data-dependent operators keep their sf0.1
  * workload character instead of degenerating:
  *   - `documents.text`: tokens re-ordered by a replica-seeded hash sort.
  *     Token multisets (t-family stats) are unchanged and within-replica
  *     dup/near-dup structure is preserved; replicas of DIVERSE docs do
  *     not alias each other, so the EXACT-dup rate provably stays at the
  *     sf0.1 rate (round-11 measurement: 8 -> 80 fingerprint pairs).
  *     CAVEAT (round-11 forensics, BENCH_NOTES): docs whose shingle sets
  *     are permutation-INVARIANT — short or repetitive template text —
  *     necessarily alias across replicas under any multiset-preserving
  *     transform, so NEAR-dup families grow 10x and pair-enumeration
  *     output (d02) grows ~100x per family. Operators whose cost tracks
  *     output therefore scale superlinearly against this rehearsal by
  *     construction, not by defect.
  *   - `embeddings.embedding`: circular shift by replica index. Norms and
  *     coordinate distributions are identical, within-replica geometry is
  *     preserved, replicas decorrelate instead of forming 10-deep cosine=1
  *     ties in every ANN top-k.
  * Everything is a replica-number cross join + codegen'd projections: no
  * shuffle, no driver data, linear in output size — the same shape would
  * write 100 TB.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val ownSession = SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession).isEmpty
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args(0), args(1),
      if (args.length > 2) args(2).toInt else 10)
    // only tear down a session this main created (the spec drives `run`
    // through the shared test session)
    if (ownSession) spark.stop()
  }

  def run(spark: SparkSession, src: String, out: String,
      replicas: Int): Unit = {

    def t(name: String): DataFrame =
      graft.sources.Tables.load(spark, src, name)

    // replica axis: tiny inline relation, broadcast-cross-joined so every
    // source row fans out to `replicas` rows in one codegen'd stage
    val reps = spark.range(replicas.toLong).select(col("id").as("rep"))
    def fan(df: DataFrame): DataFrame = df.crossJoin(broadcast(reps))

    def maxOf(df: DataFrame, c: String): Long = {
      val row = df.agg(max(col(c))).head()
      require(!row.isNullAt(0), s"cannot scale an empty table: max($c) is null")
      row.getLong(0)
    }

    def shifted(c: String, span: Long) = col(c) + col("rep") * span

    def write(df: DataFrame, name: String): Unit = {
      df.drop("rep").write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleup] $name done")
    }

    // fixed dims: copy through unchanged
    Seq("region", "nation").foreach(n => write(t(n), n))

    val custSpan = maxOf(t("customer"), "c_custkey") + 1
    val suppSpan = maxOf(t("supplier"), "s_suppkey") + 1
    val partSpan = maxOf(t("part"), "p_partkey") + 1
    val orderSpan = maxOf(t("orders"), "o_orderkey") + 1

    write(fan(t("customer")).withColumn("c_custkey", shifted("c_custkey", custSpan)),
      "customer")
    write(fan(t("supplier")).withColumn("s_suppkey", shifted("s_suppkey", suppSpan)),
      "supplier")
    write(fan(t("part")).withColumn("p_partkey", shifted("p_partkey", partSpan)),
      "part")
    write(fan(t("orders"))
        .withColumn("o_orderkey", shifted("o_orderkey", orderSpan))
        .withColumn("o_custkey", shifted("o_custkey", custSpan)),
      "orders")
    write(fan(t("lineitem"))
        .withColumn("l_orderkey", shifted("l_orderkey", orderSpan))
        .withColumn("l_partkey", shifted("l_partkey", partSpan))
        .withColumn("l_suppkey", shifted("l_suppkey", suppSpan)),
      "lineitem")

    val ev = t("events")
    val evSpan = maxOf(ev, "event_id") + 1
    val userSpan = maxOf(ev, "user_id") + 1
    write(fan(ev)
        .withColumn("event_id", shifted("event_id", evSpan))
        .withColumn("user_id", shifted("user_id", userSpan)),
      "events")

    val docSpan = maxOf(t("documents"), "doc_id") + 1
    write(fan(t("documents"))
        .withColumn("doc_id", shifted("doc_id", docSpan))
        .withColumn("text", when(col("rep") === 0, col("text")).otherwise(
          // replica-seeded token permutation: sort words by
          // xxhash64(word, rep). array_sort on (hash, word) structs keeps
          // the multiset; concat_ws rebuilds the text.
          concat_ws(" ", transform(
            array_sort(transform(split(col("text"), " "),
              w => struct(xxhash64(w, col("rep")).as("h"), w.as("w")))),
            s => s.getField("w"))))),
      "documents")

    val emb = t("embeddings")
    val vecSpan = maxOf(emb, "vec_id") + 1
    // rotation shift is rep mod dim: rep >= dim would otherwise produce
    // an identity rotation (exact cross-replica duplicate, the tie shape
    // this transform exists to avoid) or a negative slice length
    write(fan(emb)
        .withColumn("__shift", pmod(col("rep"), size(col("embedding"))))
        .withColumn("embedding", when(col("__shift") === 0, col("embedding")).otherwise(
          concat(
            slice(col("embedding"), col("__shift") + 1,
              size(col("embedding")) - col("__shift")),
            slice(col("embedding"), lit(1), col("__shift")))))
        .withColumn("vec_id", shifted("vec_id", vecSpan))
        .drop("__shift"),
      "embeddings")
  }
}
