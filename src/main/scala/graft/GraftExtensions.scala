package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.IntegerType

import graft.functions._

/** The engine's native Catalyst expressions exposed to the SQL surface.
  *
  * Two registration paths, one descriptor list:
  *  - [[GraftExtensions]] — the library-grade mechanism: a user adds
  *    `spark.sql.extensions=graft.GraftExtensions` (or
  *    `builder.withExtensions(new GraftExtensions)`) and every session
  *    of the cluster resolves these names in plain SQL, notebooks, and
  *    thrift-server queries alike.
  *  - [[GraftFunctions.register]] — same names onto an already-running
  *    session's function registry (the path tests and interactive
  *    sessions use; extensions only apply at session construction).
  *
  * Only expressions whose extra parameters are compile-time constants
  * are exposed (bits/width arguments must be literals — they shape the
  * generated code); constructor-bound runtime state (Bloom filters, PQ
  * codebooks, IVF centroid tables) stays on the typed Scala API where
  * the state object lives.
  */
object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, n: Int, args: Seq[Expression]): Unit =
    if (args.size != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.size}")

  /** (name, usage, builder) — one row per SQL-exposed expression. */
  val all: Seq[(String, String, Builder)] = Seq(
    ("hilbert_code",
      "hilbert_code(x, y, bits) - Hilbert curve index of (x, y) on the 2^bits grid",
      args => { arity("hilbert_code", 3, args)
        HilbertCode(args(0), args(1),
          intLit(args(2), "hilbert_code", "bits")) }),
    ("cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two numeric arrays (null on mismatch)",
      args => { arity("cosine_sim", 2, args); CosineSim(args(0), args(1)) }),
    ("ln_libm",
      "ln_libm(x) - natural log via libm-faithful Math.log (oracle-exact)",
      args => { arity("ln_libm", 1, args); LnLibm(args(0)) }),
    ("int8_quantize",
      "int8_quantize(v) - symmetric int8 scalar quantization of a numeric array",
      args => { arity("int8_quantize", 1, args); Int8Quantize(args(0)) }),
    ("lsh_bucket",
      "lsh_bucket(v, bits) - sign-bit LSH bucket of a numeric array",
      args => { arity("lsh_bucket", 2, args)
        LshBucketExpr(args(0), intLit(args(1), "lsh_bucket", "bits")) }),
    ("word_shingles",
      "word_shingles(tokens, w) - w-word shingles of a token array",
      args => { arity("word_shingles", 2, args)
        WordShingles(args(0), intLit(args(1), "word_shingles", "w")) }),
    ("minhash_sig",
      "minhash_sig(shingles, p) - p-permutation MinHash signature of a shingle array",
      args => { arity("minhash_sig", 2, args)
        MinHashSig(args(0), intLit(args(1), "minhash_sig", "p")) }),
    ("simhash64",
      "simhash64(tokens) - 64-bit SimHash of a token array",
      args => { arity("simhash64", 1, args); SimHash64(args(0)) }),
    ("nfc_normalize",
      "nfc_normalize(s) - Unicode NFC normalization",
      args => { arity("nfc_normalize", 1, args); NfcNormalize(args(0)) }),
    ("jump_hash",
      "jump_hash(key, n) - Lamping-Veach consistent shard of a bigint key",
      args => { arity("jump_hash", 2, args)
        JumpHashCode(args(0), intLit(args(1), "jump_hash", "n")) }))

  /** Register every descriptor on a LIVE session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, usage, b) =>
      ColumnBridge.registerTempFunction(spark, name, b)
      // usage strings surface through DESCRIBE FUNCTION on the
      // extensions path; the temp-function registry has no info slot
      val _ = usage
    }
}

/** `spark.sql.extensions=graft.GraftExtensions` — see [[GraftFunctions]].
  * Also injects the analyzer half of the graft SQL table surface
  * ([[graft.sql.GraftSqlRules]]): read substitution onto the pinned
  * Scala readers and MERGE/DELETE/UPDATE command conversion for tables
  * of a `graft.sql.GraftCatalog`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, usage, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name,
          usage, ""),
        b))
    }
    ext.injectResolutionRule(session => new graft.sql.GraftSqlRules(session))
  }
}
