package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PgStringFns

class PgFunctionsSpec extends AnyFunSuite {
  test("pg_size_pretty thresholds match PostgreSQL semantics") {
    assert(PgStringFns.sizePretty(0L) == "0 bytes")
    assert(PgStringFns.sizePretty(10239L) == "10239 bytes")
    assert(PgStringFns.sizePretty(10240L) == "10 kB")
    assert(PgStringFns.sizePretty(1048576L) == "1024 kB")
    assert(PgStringFns.sizePretty(10485760L) == "10 MB")
    assert(PgStringFns.sizePretty(10737418240L) == "10 GB")
    assert(PgStringFns.sizePretty(10995116277760L) == "10 TB")
    // negatives: PG's half_rounded rounds toward zero ((x-1)/2), and the
    // byte threshold is on abs(size)
    assert(PgStringFns.sizePretty(-10239L) == "-10239 bytes")
    assert(PgStringFns.sizePretty(-523776L) == "-512 kB") // (-1023-1)/2, not (-1023+1)>>1
    assert(PgStringFns.sizePretty(-10485760L) == "-10 MB")
  }

  test("quote_ident") {
    assert(PgStringFns.quoteIdent("abc") == "abc")
    assert(PgStringFns.quoteIdent("_x9") == "_x9")
    assert(PgStringFns.quoteIdent("aBc") == "\"aBc\"")
    assert(PgStringFns.quoteIdent("a b") == "\"a b\"")
    assert(PgStringFns.quoteIdent("a\"b") == "\"a\"\"b\"")
    assert(PgStringFns.quoteIdent("9x") == "\"9x\"")
  }

  test("pg_format directives: %I, %L, %s, %%, NULL, escaping, arity") {
    import org.apache.spark.sql.functions._
    import graft.functions.PgFunctions
    val spark = TestSpark.session
    import spark.implicits._
    val row = Seq(("My Table", "it's", "plain")).toDF("ident", "lit_v", "s")
    def run(c: org.apache.spark.sql.Column): String =
      row.select(c.as("r")).head().getString(0)
    assert(run(PgFunctions.pg_format("DROP TABLE %I", $"ident"))
      == "DROP TABLE \"My Table\"")
    assert(run(PgFunctions.pg_format("x = %L", $"lit_v")) == "x = 'it''s'")
    assert(run(PgFunctions.pg_format("%s/%s", $"s", $"s")) == "plain/plain")
    assert(run(PgFunctions.pg_format("100%% of %s", $"s")) == "100% of plain")
    // %L of NULL renders unquoted NULL (PG semantics)
    assert(run(PgFunctions.pg_format("v = %L", lit(null).cast("string")))
      == "v = NULL")
    intercept[IllegalArgumentException] {
      PgFunctions.pg_format("%I %I", lit("only_one"))
    }
    intercept[IllegalArgumentException] {
      PgFunctions.pg_format("%q", lit("x"))
    }
  }

  test("quote_literal and pg_get_expr are SQL-callable after registerAll") {
    assert(PgStringFns.quoteLiteral("abc") == "'abc'")
    assert(PgStringFns.quoteLiteral("it's") == "'it''s'")
    val spark = TestSpark.session
    graft.functions.PgFunctions.registerAll(spark)
    val r = spark.sql(
      "SELECT quote_literal('O''Brien') AS ql, " +
        "pg_get_expr('now()', 16392) AS ge").head()
    assert(r.getString(0) == "'O''Brien'")
    // pg_get_expr is a first-arg passthrough: adbin already holds rendered
    // text on a file target (same shim DuckDB ships)
    assert(r.getString(1) == "now()")
  }

  test("pg_sleep sleeps and is SQL-callable after registerAll") {
    val spark = TestSpark.session
    graft.functions.PgFunctions.registerAll(spark)
    val t0 = System.nanoTime()
    val ok = spark.sql("SELECT pg_sleep(0.2) AS slept").head().getBoolean(0)
    assert(ok)
    assert(System.nanoTime() - t0 >= 200L * 1000000, "returned too early")
  }
}
