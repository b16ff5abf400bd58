package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.PgDdl

/** Classification edges of the PG-DDL emulation layer: `handles()`
  * must claim exactly the statements it can execute — an UPDATE with
  * 'from' inside a string literal or a scalar subquery in SET belongs
  * to the normal catalog UPDATE path, not the UPDATE…FROM → MERGE
  * rewrite. */
class PgDdlSpec extends AnyFunSuite {
  private val m = Map("public" -> "g.db")

  test("handles() claims UPDATE only with a top-level FROM after SET") {
    assert(PgDdl.handles(
      "UPDATE public.t a SET x = s.k FROM (SELECT k FROM public.o) " +
        "AS s WHERE a.k = s.k", m))
    // 'from' inside a string literal is NOT a FROM clause
    assert(!PgDdl.handles(
      "UPDATE public.t SET note = 'shipped from paris' WHERE id = 1", m))
    // a scalar subquery in SET keeps its FROM inside parens
    assert(!PgDdl.handles(
      "UPDATE public.t SET x = (SELECT max(v) FROM public.o) " +
        "WHERE id = 1", m))
    // both at once, still no top-level FROM
    assert(!PgDdl.handles(
      "UPDATE public.t SET x = (SELECT max(v) FROM public.o), " +
        "note = 'from a subquery' WHERE id = 1", m))
    // 'from' inside SQL comments is NOT a FROM clause either — a
    // plain UPDATE carrying one must not be routed to the MERGE
    // rewrite path
    assert(!PgDdl.handles(
      "UPDATE public.t SET x = 1 -- copied from the runbook\n" +
        "WHERE id = 1", m))
    assert(!PgDdl.handles(
      "UPDATE public.t SET x = 1 /* from legacy */ WHERE id = 1", m))
    // a real top-level FROM after a comment still classifies
    assert(PgDdl.handles(
      "UPDATE public.t a SET x = s.k /* join source */ " +
        "FROM public.o s WHERE a.k = s.k", m))
  }

  test("handles() keeps its other classifications") {
    // column-list INSERT is the emulation layer's (sequence defaults)
    assert(PgDdl.handles("INSERT INTO public.t(a, b) VALUES (1, 2)", m))
    // plain INSERT passes through
    assert(!PgDdl.handles("INSERT INTO public.t VALUES (1, 2)", m))
    // unmapped schema passes through
    assert(!PgDdl.handles(
      "UPDATE other.t a SET x = 1 FROM other.o s WHERE a.k = s.k", m))
    // DDL on a mapped schema is claimed
    assert(PgDdl.handles(
      "ALTER TABLE public.t ADD COLUMN c bigint", m))
  }
}
