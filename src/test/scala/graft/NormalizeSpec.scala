package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Normalize

class NormalizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  // code points spelled numerically so the source stays pure ASCII:
  // 0x0301 combining acute, 0x0308 combining diaeresis, 0x00e9 e-acute,
  // 0x00ef i-diaeresis
  private val acute = 0x0301.toChar.toString
  private val diaer = 0x0308.toChar.toString
  private val eAcute = 0x00e9.toChar.toString
  private val iDiaer = 0x00ef.toChar.toString
  private val decomposed = s"Cafe$acute nai${diaer}ve"
  private val composed = s"Caf$eAcute na${iDiaer}ve"

  test("nfc composes decomposed sequences to canonical form") {
    import spark.implicits._
    val out = Seq(decomposed, composed).toDF("t")
      .select(Normalize.nfc($"t").as("n")).as[String].collect()
    assert(decomposed != composed, "fixture must start decomposed")
    assert(out(0) == composed, "decomposed input must compose")
    assert(out(1) == composed, "composed input is a fixed point")
  }

  test("nfc is the identity on ASCII and null-safe") {
    import spark.implicits._
    val rows = Seq(Some("plain ascii text"), None).toDF("t")
      .select(Normalize.nfc($"t").as("n")).collect()
    assert(rows(0).getString(0) == "plain ascii text")
    assert(rows(1).isNullAt(0))
  }

  test("two instances in one projection both compose") {
    import spark.implicits._
    val df = Seq(s"e$acute").toDF("t")
    val both = df.select(Normalize.nfc($"t").as("a"),
      Normalize.nfc(org.apache.spark.sql.functions.concat($"t", $"t")).as("b"))
      .collect().head
    assert(both.getString(0) == eAcute)
    assert(both.getString(1) == eAcute + eAcute)
  }
}
