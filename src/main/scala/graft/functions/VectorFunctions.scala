package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (zip_with / aggregate) — no UDF, no
  * serialization boundary, stays inside WholeStageCodegen.
  *
  * Determinism note: sums are sequential left folds in BOTH Spark's
  * `aggregate` HOF and DuckDB's `list_aggregate('sum')`, so a DuckDB
  * oracle can reproduce the exact double bit pattern.
  */
object VectorFunctions {

  /** Σ a_i * b_i in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖v‖₂ in double precision. */
  def l2norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) =>
      acc + x.cast("double") * x.cast("double")))

  /** cosine(a, b) = dot / (‖a‖‖b‖); null-safe via NaN on zero vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Sign-bit LSH bucket: k pseudo-random hyperplanes derived
    * deterministically from xxhash64 — plane j component i is mapped onto
    * [-0.5, 0.5). Bucket = k-bit integer of dot-product signs. Two vectors
    * with high cosine land in the same bucket with high probability; used
    * to restrict near-dup / ANN search to bucket-local joins so the only
    * shuffle is on the bucket key (scales to billions of rows).
    */
  def lshBucket(v: Column, bits: Int): Column = {
    // dot(v, plane_j) where plane_j(i) = hash01(i, j) - 0.5
    def planeDot(j: Int): Column =
      aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
          x.cast("double") *
            ((pmod(xxhash64(i, lit(j)), lit(100000)).cast("double") / 100000.0) - 0.5)),
        lit(0.0), (acc, x) => acc + x)
    (0 until bits).map { j =>
      when(planeDot(j) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
  }
}
