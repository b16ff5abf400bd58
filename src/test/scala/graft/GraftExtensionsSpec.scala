package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HilbertIndex

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.session
    GraftFunctions.register(s)
    s
  }

  test("registered SQL functions resolve and match the Scala API") {
    import spark.implicits._
    val r = Seq("é").toDF("s").selectExpr(
      "hilbert_code(3L, 5L, 8) AS h",
      "ln_libm(2.5D) AS ln",
      "cosine_sim(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS cos",
      "int8_quantize(array(0.5D, -1.0D)) AS q",
      "nfc_normalize(s) AS nfc").head()
    assert(r.getLong(0) == HilbertIndex.compute(8, 3L, 5L))
    assert(r.getDouble(1) == java.lang.Math.log(2.5))
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getSeq[Int](3) == Seq(64, -127))
    assert(r.getString(4) == "é")
    // the token-array family composes inside one SQL expression
    assert(spark.sql("SELECT jump_hash(12345L, 16) AS s").head().getInt(0)
      == graft.functions.JumpHash.compute(12345L, 16))
    val sig = spark.sql("""
      SELECT simhash64(split('a b c a', ' ')) AS sh,
             minhash_sig(word_shingles(split('a b c d e', ' '), 3), 4) AS mh,
             lsh_bucket(array(0.1D, -0.2D, 0.3D, 0.4D), 12) AS b
    """).head()
    assert(sig.getSeq[Long](1).length == 4)
    assert(sig.getLong(2) >= 0 && sig.getLong(2) < 4096)
    // SQL result == Column-API result on the same inputs
    val viaSql = spark.sql(
      "SELECT simhash64(split('x y z', ' ')) AS s").as[Long].head()
    val viaApi = Seq("x y z").toDF("t")
      .select(graft.functions.SimHash.simhash64(
        org.apache.spark.sql.functions.split($"t", " ")).as("s"))
      .as[Long].head()
    assert(viaSql == viaApi)
  }

  test("literal-parameter arguments are enforced") {
    val e = intercept[Exception] {
      spark.sql("SELECT hilbert_code(1L, 2L, CAST(rand()*8 AS INT))")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }

  test("the extensions class injects every descriptor cleanly") {
    // builder-time path: applying to a fresh extensions instance must
    // accept all descriptors (a second session created with
    // withExtensions(new GraftExtensions) resolves the same names —
    // same builder list, exercised above through the registry)
    new GraftExtensions()(new SparkSessionExtensions)
    assert(GraftFunctions.all.map(_._1).distinct.size ==
      GraftFunctions.all.size)
  }
}
