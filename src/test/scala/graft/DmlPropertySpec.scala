package graft

import org.scalatest.funsuite.AnyFunSuite

/** DIFFERENTIAL property test for SQL DELETE/UPDATE on graft tables:
  * random row sets (incl. NULL values), random statement sequences
  * (conditions with three-valued NULL evaluation; assignments incl.
  * the PARTITION SOURCE column, which moves rows across leaves), each
  * sequence replayed over plain Scala collections — only a TRUE
  * condition deletes/updates, exactly the SQL contract. Seeded. */
class DmlPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  private case class R(id: Long, v: Option[Double], grp: String)

  // conditions: SQL text + Scala predicate returning the SQL TRUE-ness
  // (NULL collapses to false — only TRUE acts)
  private val conds: Seq[(String, R => Boolean)] = Seq(
    ("v > 50.0", r => r.v.exists(_ > 50.0)),
    ("v <= 20.0", r => r.v.exists(_ <= 20.0)),
    ("grp = 'a'", r => r.grp == "a"),
    ("id % 3 = 0", r => r.id % 3 == 0),
    ("v > 30.0 OR id < 3", r => r.v.exists(_ > 30.0) || r.id < 3),
    ("v IS NULL", r => r.v.isEmpty))

  // assignments: SQL text + row transform ('grp' moves leaves)
  private val assigns: Seq[(String, R => R)] = Seq(
    ("v = v + 1.0", r => r.copy(v = r.v.map(_ + 1.0))),
    ("v = -1.0", _.copy(v = Some(-1.0))),
    ("grp = 'z'", _.copy(grp = "z")),
    ("grp = 'a', v = v * 2.0",
      r => r.copy(grp = "a", v = r.v.map(_ * 2.0))))

  test("random DELETE/UPDATE sequences match a Scala replay " +
      "multiset-exactly, incl. NULL conditions and leaf-moving " +
      "partition-source assignments (seeded)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-dprop")
      .toString
    spark.conf.set("spark.sql.catalog.gdp", "graft.sql.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gdp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gdp.db")
    val rnd = new scala.util.Random(180819L)
    for (iter <- 0 until 15) {
      val tbl = s"gdp.db.d$iter"
      spark.sql(s"""CREATE TABLE $tbl (id BIGINT, v DOUBLE, grp STRING)
        PARTITIONED BY (identity(grp))""")
      var rows: Seq[R] = (1L to (6 + rnd.nextInt(8))).map(i =>
        R(i, if (rnd.nextInt(4) == 0) None
          else Some(rnd.nextInt(100).toDouble),
          Seq("a", "b", "c")(rnd.nextInt(3))))
      spark.sql(s"INSERT INTO $tbl VALUES " + rows.map(r =>
        s"(${r.id}, ${r.v.map(_.toString).getOrElse("NULL")}, " +
          s"'${r.grp}')").mkString(", "))
      val stmts = 1 + rnd.nextInt(3)
      val trace = new StringBuilder
      for (_ <- 0 until stmts) {
        val (cs, cf) = conds(rnd.nextInt(conds.length))
        if (rnd.nextBoolean()) {
          trace ++= s"DELETE FROM $tbl WHERE $cs\n"
          spark.sql(s"DELETE FROM $tbl WHERE $cs")
          rows = rows.filterNot(cf)
        } else {
          val (as, af) = assigns(rnd.nextInt(assigns.length))
          trace ++= s"UPDATE $tbl SET $as WHERE $cs\n"
          spark.sql(s"UPDATE $tbl SET $as WHERE $cs")
          rows = rows.map(r => if (cf(r)) af(r) else r)
        }
      }
      val got = spark.sql(s"SELECT id, v, grp FROM $tbl").collect()
        .map(r => R(r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getString(2))).toSeq
      assert(got.groupBy(identity).view.mapValues(_.size).toMap ==
        rows.groupBy(identity).view.mapValues(_.size).toMap,
        s"iter $iter diverged after:\n$trace" +
          s"got=${got.sortBy(_.id)}\nexpected=${rows.sortBy(_.id)}")
      spark.sql(s"DROP TABLE $tbl")
    }
  }
}
