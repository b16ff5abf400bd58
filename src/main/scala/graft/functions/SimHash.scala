package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 64-bit SimHash of a token array as a NATIVE Catalyst expression.
  *
  * Semantics: bit j is set iff a majority of tokens (ties count) have bit
  * j set in the token's 64-bit hash. The per-token hash is the FIRST 8
  * BYTES OF md5(token), big-endian — md5, not xxhash64, so a SQL oracle
  * can recompute signatures relationally (the same derivation that made
  * d05/s02 oracle-checkable): DuckDB rebuilds the two 32-bit halves as
  *   hi = ('0x' || substr(md5(t), 1, 8))::UBIGINT
  *   lo = ('0x' || substr(md5(t), 9, 8))::UBIGINT
  * and bit j of the JVM long is bit j of lo for j < 32, bit j-32 of hi
  * otherwise.
  *
  * The 64-counter accumulation runs as a tight JVM loop instead of
  * interpreted higher-order-function lambdas (which box every
  * intermediate — the measured cost model at sf0.1 was ~6 s of signature
  * time for 5k docs; this loop is negligible). Codegen'd, so the whole
  * scan → signature → explode pipeline stays in one WholeStageCodegen
  * span.
  */
object SimHashFns {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 bytes of md5(token), big-endian. */
  def tokenHash(bytes: Array[Byte]): Long = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (d(k) & 0xFFL); k += 1 }
    v
  }

  /** md5-derived 64-bit hash of EVERY element: array<string> →
    * array<long> (null elements hash to 0). Shared by the winnowing
    * fingerprint operator; SQL-reproducible like tokenHash. */
  def hashAll(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) 0L
        else tokenHash(arr.getUTF8String(i).getBytes)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** counters loop shared by eval and codegen. */
  def ofTokens(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counters = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 64) {
          counters(j) += (((h >>> j) & 1L).toInt << 1) - 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (counters(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any =
    SimHashFns.ofTokens(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashFns.ofTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Element-wise md5-derived 64-bit hashes: array<string> → array<long>. */
case class TokenHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_hash64"

  override protected def nullSafeEval(v: Any): Any =
    SimHashFns.hashAll(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashFns.hashAll($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenHash64 =
    copy(child = newChild)
}

object SimHash {
  /** Column API: simhash64(array<string> tokens) → long. */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** Column API: token_hash64(array<string>) → array<long>. */
  def tokenHash64(tokens: Column): Column =
    ColumnBridge.column(TokenHash64(ColumnBridge.expression(tokens)))
}
