package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType, IntegerType, LongType, ArrayType}

/** Native codegen'd kernels behind [[VectorFunctions]] — the HOF
  * formulations they replace are interpreted (each element boxes through
  * lambda variables), which dominates the similarity operators' time.
  *
  * Bit-compatibility: every sum is the SAME sequential left fold the HOF
  * versions (and the DuckDB oracle's `list_aggregate('sum')`) perform, so
  * s01's exact-double oracle keeps hash-matching; the LSH plane for
  * (i, j) derives from md5 so the d05/s02 oracles recompute the buckets
  * in SQL bit-identically (see `planes` below).
  */
object VectorNative {

  private def elemAsDouble(arr: ArrayData, i: Int, float: Boolean): Double =
    if (float) arr.getFloat(i).toDouble else arr.getDouble(i)

  /** dot / (‖a‖‖b‖) in one pass, sequential folds. Mismatched lengths or
    * a NULL element return null (boxed) — the same poisoning the HOF
    * zip_with/aggregate formulation had, so a corrupted or truncated
    * embedding is EXCLUDED by `cos >= threshold` filters rather than
    * scored with fabricated zeros. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elemAsDouble(a, i, aFloat)
      val y = elemAsDouble(b, i, bFloat)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Symmetric int8 scalar quantization: scale = max|x| / 127 (per
    * vector), q_i = floor(x_i / scale + 0.5) ∈ [-127, 127]. The scale is
    * NOT returned because cosine is scale-invariant — the quantized
    * arrays alone reproduce the approximate cosine, and all downstream
    * arithmetic is exact integer math (SQL-oracle-exact: int sums stay
    * below 2^53 in doubles). A zero vector quantizes to zeros (scale 1).
    * Null element → null vector, matching `cosine`'s poisoning. */
  def quantizeInt8(arr: ArrayData, float: Boolean): Any = {
    val n = arr.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val v = math.abs(elemAsDouble(arr, i, float))
      if (v > mx) mx = v
      i += 1
    }
    val scale = if (mx == 0.0) 1.0 else mx / 127.0
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      out(i) = math.floor(elemAsDouble(arr, i, float) / scale + 0.5).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  /** plane_j(i) = first 52 bits of md5("j_i") mapped onto [-0.5, 0.5).
    * md5 (not xxhash64) so a SQL oracle can recompute the buckets
    * relationally — DuckDB: `('0x' || substr(md5(j || '_' || i), 1, 13))
    * ::UBIGINT / 2^52 - 0.5`. 52 bits keep the integer exact in a double
    * and the division by 2^52 is exact, so JVM and SQL derive bit-identical
    * plane weights. Planes depend only on (dims, bits), so they are
    * computed once and cached. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def planes(dims: Int, bits: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((dims, bits), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(bits, dims) { (j, i) =>
        md.reset()
        val hex = md.digest(s"${j}_$i".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString.substring(0, 13)
        java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0 - 0.5
      }
    })

  /** Nearest centroid by exact integer squared L2 over int8-quantized
    * vectors (ties → lowest index); the coarse-assignment kernel of the
    * seeded IVF (s03). Distances stay in Long (64 dims × 254² ≪ 2^63),
    * so a SQL oracle replays the argmin bit-identically. Null element or
    * length mismatch → null (poisoning, same contract as `cosine`). */
  def nearestList(v: ArrayData, centroids: Array[Array[Int]]): Any = {
    val n = v.numElements()
    var i = 0
    while (i < n) { if (v.isNullAt(i)) return null; i += 1 }
    var best = -1
    var bestD = Long.MaxValue
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      if (c.length != n) return null
      var d = 0L
      var t = 0
      while (t < n) {
        val diff = (v.getInt(t) - c(t)).toLong
        d += diff * diff
        t += 1
      }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    if (best < 0) null else best
  }

  /** Null element → null bucket (HOF parity: a poisoned plane dot made
    * every `when(planeDot >= 0, ...)` branch null). */
  def lshBucket(v: ArrayData, bits: Int, float: Boolean): Any = {
    val dims = v.numElements()
    var i = 0
    while (i < dims) { if (v.isNullAt(i)) return null; i += 1 }
    val pl = planes(dims, bits)
    var bucket = 0L
    var j = 0
    while (j < bits) {
      val plane = pl(j)
      var d = 0.0
      var k = 0
      while (k < dims) { d += elemAsDouble(v, k, float) * plane(k); k += 1 }
      if (d >= 0) bucket |= 1L << j
      j += 1
    }
    bucket
  }

  /** Kernel behind [[PqDotLut]]: exact integer subvector dots, the same
    * sequential fold as the former driver-side loop (bit-identical
    * results). Null element or a probe shorter than m·sub → null. */
  def pqDotLut(qq: ArrayData, codebooks: Array[Array[Array[Int]]]): Any = {
    val m = codebooks.length
    val n = qq.numElements()
    var i = 0
    while (i < n) { if (qq.isNullAt(i)) return null; i += 1 }
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val sub = if (cb.length > 0) cb(0).length else 0
      if ((j + 1) * sub > n) return null
      val row = new Array[Long](cb.length)
      var c = 0
      while (c < cb.length) {
        val cc = cb(c)
        var s = 0L
        var t = 0
        while (t < sub) { s += qq.getInt(j * sub + t).toLong * cc(t); t += 1 }
        row(c) = s
        c += 1
      }
      out(j) = new GenericArrayData(row)
      j += 1
    }
    new GenericArrayData(out)
  }
  /** Raw inner product, same sequential left fold as [[cosine]] (and the
    * oracle's list_aggregate sum) — bit-faithful across engines. Same
    * null poisoning: length mismatch / null element → null. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Any = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += elemAsDouble(a, i, aFloat) * elemAsDouble(b, i, bFloat)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(_.dataType.isInstanceOf[ArrayType]))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorNative.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("dotR")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $r = graft.functions.VectorNative.dot(
        $a, $b, ${isFloat(left)}, ${isFloat(right)});
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // null beyond child-null propagation: length mismatch / null element
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (Seq(left, right).forall(_.dataType.isInstanceOf[ArrayType]))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array inputs, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorNative.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName: two instances in one projection must not redeclare the local
    val r = ctx.freshName("cosR")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object $r = graft.functions.VectorNative.cosine(
        $a, $b, ${isFloat(left)}, ${isFloat(right)});
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Double) $r).doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

case class LshBucketExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array input, got ${child.dataType.simpleString}")

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    VectorNative.lshBucket(v.asInstanceOf[ArrayData], bits, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("lshR")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = graft.functions.VectorNative.lshBucket($c, $bits, $isFloat);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Long) $r).longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

case class Int8Quantize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "int8_quantize"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array input, got ${child.dataType.simpleString}")

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    VectorNative.quantizeInt8(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("q8R")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = graft.functions.VectorNative.quantizeInt8($c, $isFloat);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

/** list_id = argmin over `centroids` of exact integer squared distance to
  * the (already int8-quantized) child vector — the seeded-IVF coarse
  * assignment. Centroids ride along as a reference object so the kernel
  * stays inside whole-stage codegen. */
case class Int8NearestList(child: Expression, centroids: Array[Array[Int]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "int8_nearest_list"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<int> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    VectorNative.nearestList(v.asInstanceOf[ArrayData], centroids)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", centroids, "int[][]")
    val r = ctx.freshName("nlR")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = graft.functions.VectorNative.nearestList($c, $cRef);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ((java.lang.Integer) $r).intValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Int8NearestList =
    copy(child = newChild)
}

/** Per-probe PQ ADC dot-LUT, executor-side: for an int8-quantized probe
  * vector (length m·sub) and the broadcast-by-reference codebooks
  * (m × ksub × sub ints), row j column c is the exact integer dot of the
  * probe's j-th subvector with codebook centroid (j, c) — the same
  * sequential fold the driver-side loop (and the SQL oracle's CTE)
  * performs, so results are bit-identical. Output array<array<long>>
  * (m × ksub); sums stay far below 2^63 (sub·127² per cell).
  *
  * This is what lets [[graft.operators.Similarity.pqBatchTopK]] take the
  * probe set as a DATAFRAME: LUT construction is a per-row codegen'd
  * projection over the probe table instead of a driver collect+loop, so
  * a 1M-probe batch never materializes m·ksub longs per probe on the
  * driver. Null element / short vector → null (poisoning contract shared
  * with the other kernels). */
case class PqDotLut(child: Expression, codebooks: Array[Array[Array[Int]]])
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_dot_lut"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires array<int> input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(v: Any): Any =
    VectorNative.pqDotLut(v.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "int[][][]")
    val r = ctx.freshName("lutR")
    nullSafeCodeGen(ctx, ev, c => s"""
      Object $r = graft.functions.VectorNative.pqDotLut($c, $cbRef);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqDotLut =
    copy(child = newChild)
}
