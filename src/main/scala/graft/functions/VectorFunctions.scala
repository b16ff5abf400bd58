package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, as NATIVE
  * codegen'd Catalyst expressions ([[VectorNative]]) — higher-order
  * functions are interpreted (each element boxes through a lambda
  * variable), which dominated the similarity operators' time.
  *
  * Determinism note: sums are sequential left folds matching both the
  * original HOF formulation and DuckDB's `list_aggregate('sum')`, so the
  * s01 oracle reproduces the exact double bit pattern; LSH planes derive
  * from md5 of "(plane)_(component)" so the d05/s02 oracles rebuild the
  * exact plane weights — and therefore buckets — in SQL.
  */
object VectorFunctions {
  import org.apache.spark.sql.graft.ColumnBridge

  /** Σ a_i * b_i — native codegen'd kernel, the same sequential left
    * fold the old HOF form (and the oracle's list_aggregate) performs,
    * so scores stay bit-faithful across engines. */
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** ‖v‖₂ in double precision. */
  def l2norm(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) =>
      acc + x.cast("double") * x.cast("double")))

  /** cosine(a, b) = dot / (‖a‖‖b‖); NaN on zero vectors. */
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Sign-bit LSH bucket: k pseudo-random hyperplanes derived
    * deterministically from md5 — plane j component i is mapped onto
    * [-0.5, 0.5). Bucket = k-bit integer of dot-product signs. Two vectors
    * with high cosine land in the same bucket with high probability; used
    * to restrict near-dup / ANN search to bucket-local joins so the only
    * shuffle is on the bucket key (scales to billions of rows). Planes
    * depend only on (dims, bits) and are cached JVM-side.
    */
  def lshBucket(v: Column, bits: Int): Column =
    ColumnBridge.column(LshBucketExpr(ColumnBridge.expression(v), bits))

  /** Symmetric int8 scalar quantization (array<float|double> →
    * array<int> in [-127, 127]); cosine over quantized vectors is
    * scale-free, so the int arrays alone serve similarity search at
    * ~4-8x less storage/bandwidth than the raw embeddings. */
  def int8Quantize(v: Column): Column =
    ColumnBridge.column(Int8Quantize(ColumnBridge.expression(v)))

  /** Argmin centroid index by exact integer squared L2 over an int8-
    * quantized vector column (seeded-IVF coarse assignment; ties → lowest
    * index). */
  def int8NearestList(v: Column, centroids: Array[Array[Int]]): Column =
    ColumnBridge.column(Int8NearestList(ColumnBridge.expression(v), centroids))

  /** Per-probe PQ ADC dot-LUT (m × ksub exact integer dots) over an
    * int8-quantized probe column — executor-side LUT construction, so a
    * probe TABLE of any size builds its LUTs in the scan that reads it. */
  def pqDotLut(v: Column, codebooks: Array[Array[Array[Int]]]): Column =
    ColumnBridge.column(PqDotLut(ColumnBridge.expression(v), codebooks))
}
