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
  }

  test("quote_ident") {
    assert(PgStringFns.quoteIdent("abc") == "abc")
    assert(PgStringFns.quoteIdent("_x9") == "_x9")
    assert(PgStringFns.quoteIdent("aBc") == "\"aBc\"")
    assert(PgStringFns.quoteIdent("a b") == "\"a b\"")
    assert(PgStringFns.quoteIdent("a\"b") == "\"a\"\"b\"")
    assert(PgStringFns.quoteIdent("9x") == "\"9x\"")
  }
}
