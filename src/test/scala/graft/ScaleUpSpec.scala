package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Contract for the sf1-rehearsal generator: a scale-up by R must multiply
  * row counts by exactly R, keep key spaces collision-free, preserve join
  * selectivity exactly (every fact row still finds exactly its original
  * dimension partners), and preserve the content DISTRIBUTIONS that the
  * dedup/ANN operators scale against (token multisets, embedding norms)
  * while decorrelating replicas (no 10-deep cross-replica duplicate ties).
  */
class ScaleUpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private lazy val out: String = {
    val dir = Files.createTempDirectory("scaleup_").toFile
    dir.deleteOnExit()
    ScaleUp.run(spark, "/root/testdata/sf0.001", dir.getAbsolutePath, 3)
    dir.getAbsolutePath
  }
  private val src = "/root/testdata/sf0.001"

  test("row counts scale by exactly R; dims stay fixed") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(Tables.load(spark, out, t).count() ==
        3 * Tables.load(spark, src, t).count(), t)
    for (t <- Seq("region", "nation"))
      assert(Tables.load(spark, out, t).count() ==
        Tables.load(spark, src, t).count(), t)
  }

  test("keys stay unique and joins keep their exact selectivity") {
    val orders = Tables.load(spark, out, "orders")
    assert(orders.select("o_orderkey").distinct().count() == orders.count())
    // every order joins exactly one customer — no cross-replica bleed
    val joined = orders.join(Tables.load(spark, out, "customer"),
      col("o_custkey") === col("c_custkey"))
    assert(joined.count() == orders.count())
    // lineitem->orders selectivity is exactly R x the source's
    val liJoin = Tables.load(spark, out, "lineitem")
      .join(orders, col("l_orderkey") === col("o_orderkey")).count()
    val srcJoin = Tables.load(spark, src, "lineitem")
      .join(Tables.load(spark, src, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(liJoin == 3 * srcJoin)
  }

  test("documents keep token multisets; replicas are not exact duplicates") {
    val docs = Tables.load(spark, out, "documents")
    val srcDocs = Tables.load(spark, src, "documents")
    // token multiset preserved: total token count scales exactly
    val tok = (d: org.apache.spark.sql.DataFrame) =>
      d.select(sum(size(split(col("text"), " ")))).head().getLong(0)
    assert(tok(docs) == 3 * tok(srcDocs))
    // replica 1+ of a doc is a permutation, not a copy: the corpus-wide
    // exact-dup rate must NOT jump by ~R (it stays at the source's rate
    // scaled linearly, modulo permutation collisions on 1-2 token docs)
    val srcDups = srcDocs.groupBy("text").count().filter(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L))).head().getLong(0)
    val outDups = docs.groupBy("text").count().filter(col("count") > 1)
      .agg(coalesce(sum(col("count") - 1), lit(0L))).head().getLong(0)
    assert(outDups <= 3 * srcDups + docs.count() / 20,
      s"cross-replica exact dups leaked: $outDups vs source $srcDups")
  }

  test("embeddings keep norms exactly (rotation), replicas decorrelate") {
    val emb = Tables.load(spark, out, "embeddings")
    val srcEmb = Tables.load(spark, src, "embeddings")
    val normSum = (d: org.apache.spark.sql.DataFrame) =>
      d.select(sum(aggregate(col("embedding"), lit(0.0d),
        (a, x) => a + x.cast("double") * x.cast("double"))))
        .head().getDouble(0)
    assert(math.abs(normSum(emb) - 3 * normSum(srcEmb)) < 1e-3)
  }
}
