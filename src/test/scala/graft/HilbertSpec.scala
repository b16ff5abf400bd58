package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Hilbert, HilbertIndex}
import graft.operators.Layout

class HilbertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  test("hilbert index is a bijection on the grid") {
    // every cell of the 32×32 grid maps to a distinct index in [0, 1024)
    val seen = new Array[Boolean](1024)
    for (x <- 0 until 32; y <- 0 until 32) {
      val d = HilbertIndex.compute(5, x.toLong, y.toLong)
      assert(d >= 0 && d < 1024, s"($x,$y) -> $d out of range")
      assert(!seen(d.toInt), s"($x,$y) -> $d collides")
      seen(d.toInt) = true
    }
  }

  test("consecutive indices are grid neighbors (THE Hilbert property)") {
    // the walk never jumps: |Δx| + |Δy| = 1 between d and d+1, at every
    // position of the full 8-bit curve (Z-order fails this at every
    // power-of-two boundary — its worst jump spans half the grid)
    var prev = HilbertIndex.inverse(8, 0L)
    var d = 1L
    while (d < 65536L) {
      val cur = HilbertIndex.inverse(8, d)
      val manhattan = math.abs(cur._1 - prev._1) + math.abs(cur._2 - prev._2)
      assert(manhattan == 1, s"jump of $manhattan at d=$d")
      prev = cur
      d += 1
    }
  }

  test("inverse is the inverse of compute") {
    for (d <- 0L until 4096L) {
      val (x, y) = HilbertIndex.inverse(6, d)
      assert(HilbertIndex.compute(6, x, y) == d)
    }
  }

  test("codegen'd expression matches the reference loop") {
    import spark.implicits._
    // deterministic pseudo-random cells covering the full 8-bit grid
    val cells = (0 until 2000).map { i =>
      (((i * 2654435761L) >>> 7) & 255L, ((i * 40503L) >>> 3) & 255L)
    }
    val got = cells.toDF("x", "y")
      .select($"x", $"y", Hilbert.code($"x", $"y", bits = 8).as("h"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) ==
        HilbertIndex.compute(8, r.getLong(0), r.getLong(1)))
    }
  }

  test("rectangle queries fragment into fewer index runs than z-order") {
    // the property that matters for file pruning: a rectangle predicate
    // touches the curve in some number of CONTIGUOUS index runs — each
    // run is one coalesced scan range. Moon et al. (TKDE'01) prove the
    // Hilbert curve needs asymptotically fewer runs than Z for the same
    // region; verify it exhaustively over every 16×16-aligned box and a
    // sweep of unaligned 24×10 boxes on the 8-bit grid.
    def morton8(x: Long, y: Long): Long = {
      var v = 0L
      for (b <- 0 until 8)
        v |= (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      v
    }
    def runs(ds: Seq[Long]): Int = {
      val s = ds.sorted
      1 + s.sliding(2).count { case Seq(a, b) => b != a + 1; case _ => false }
    }
    def totalRuns(index: (Long, Long) => Long, boxes: Seq[(Int, Int, Int, Int)]) =
      boxes.map { case (x0, y0, w, h) =>
        runs(for (x <- x0 until x0 + w; y <- y0 until y0 + h)
          yield index(x.toLong, y.toLong))
      }.sum
    val aligned = for (i <- 0 until 16; j <- 0 until 16)
      yield (i * 16, j * 16, 16, 16)
    val unaligned = for (i <- 0 until 15; j <- 0 until 15)
      yield (i * 16 + 3, j * 16 + 5, 24, 10)
    val hil = (x: Long, y: Long) => HilbertIndex.compute(8, x, y)
    // power-of-two-aligned squares are single curve subtrees for BOTH
    // curves: exactly one run per box — the degenerate case where Z ties
    assert(totalRuns(hil, aligned) == aligned.size)
    assert(totalRuns(morton8, aligned) == aligned.size)
    assert(totalRuns(hil, unaligned) < totalRuns(morton8, unaligned),
      "unaligned boxes: hilbert must need fewer contiguous runs")
  }

  test("p22 layout is exact end-to-end on the fixture") {
    val out = Layout.eventsHilbertLayout(
      graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "events"))
    val rows = out.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val (u8, d8, h, shard) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(u8 >= 0 && u8 <= 255 && d8 >= 0 && d8 <= 255)
      assert(h == HilbertIndex.compute(8, u8, d8))
      assert(shard == (h >> 12))
    }
  }

  test("hilbert runs exactly cover arbitrary rectangles") {
    val rects = Seq((0L, 255L, 0L, 255L), (3L, 27L, 5L, 10L),
      (100L, 101L, 200L, 207L), (0L, 0L, 0L, 0L), (17L, 240L, 33L, 34L))
    rects.foreach { case (x0, x1, y0, y1) =>
      val runs = Layout.hilbertRuns(8, x0, x1, y0, y1)
      // runs are merged, ascending, disjoint
      runs.sliding(2).foreach {
        case Seq(a, b) => assert(a._2 + 1 < b._1, s"unmerged $a $b")
        case _ =>
      }
      val fromRuns = runs.flatMap { case (lo, hi) => lo to hi }.toSet
      val direct = (for (x <- x0 to x1; y <- y0 to y1)
        yield HilbertIndex.compute(8, x, y)).toSet
      assert(fromRuns == direct, s"rect ($x0,$x1,$y0,$y1)")
    }
  }

  test("jump hash: resize moves ONLY keys that land on the new shard, " +
      "and shards stay balanced") {
    import graft.functions.JumpHash
    val keys = (1L to 20000L).map(_ * 2654435761L)
    val at16 = keys.map(k => k -> JumpHash.compute(k, 16)).toMap
    val at17 = keys.map(k => k -> JumpHash.compute(k, 17)).toMap
    val moved = keys.filter(k => at16(k) != at17(k))
    // THE consistent-hash contract: every mover goes to the NEW shard
    assert(moved.forall(k => at17(k) == 16),
      "a key moved between pre-existing shards")
    // expected movement = 1/17 of keys; allow generous slack
    val frac = moved.size.toDouble / keys.size
    assert(frac > 0.03 && frac < 0.09, s"moved fraction $frac")
    // balance at 16 shards: each within 25% of the uniform share
    val byShard = keys.groupBy(at16).view.mapValues(_.size)
    val exp = keys.size / 16.0
    assert(byShard.values.forall(c => c > exp * 0.75 && c < exp * 1.25),
      s"imbalanced: ${byShard.toMap}")
  }

  test("jump hash codegen'd expression matches the reference loop") {
    import spark.implicits._
    val rows = (1L to 500L).map(_ * 40503L).toDF("k")
      .select($"k", graft.functions.JumpHashColumn.jumpHash($"k", 21).as("s"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == graft.functions.JumpHash.compute(r.getLong(0), 21))
    }
  }
}
