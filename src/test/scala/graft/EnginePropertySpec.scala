package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

import graft.engine.{GlobMatcher, PacketLoader, Placeholders}

/** Property tests promised by SURVEY §5: glob matcher vs a regex oracle,
  * placeholder substitution (prefix-safety, idempotent round-trips),
  * packet-hash idempotency and rename-invariance. ScalaCheck generators
  * sampled with a fixed seed (no scalatest bridge in the dependency set).
  */
class EnginePropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    (1 to n).foreach { _ =>
      gen.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }
  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val nameChars = Gen.alphaNumChar
  private val nameGen = Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, nameChars))
  private val maskGen = Gen.chooseNum(0, 10).flatMap(n =>
    Gen.stringOfN(n, Gen.frequency(5 -> nameChars, 2 -> Gen.const('*'), 2 -> Gen.const('?'))))

  test("tracker state survives arbitrary text through a fresh instance") {
    // the TSV/base64 persistence is the crash-resume substrate: any packet
    // name / exception text (tabs, newlines, unicode, the \N marker, empty)
    // must round-trip bit-exact through a NEW tracker reading the files
    val spark = TestSpark.session
    val textGen = Gen.listOfN(12, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('\t', '\n', '"', '\\', '\'', 'ß', '☃', ' ')))
      .map(_.mkString)
    forAll(Gen.zip(textGen.suchThat(_.trim.nonEmpty), textGen), 40) {
      case (pkt, descr) =>
        val state = Files.createTempDirectory("graft-codec").toString
        val t1 = new graft.engine.ActionTracker(spark, state)
        t1.initTables()
        t1.ensurePacket(pkt, "hash-" + descr, s"""{"d":"$descr"}""")
        t1.setStepStatus(pkt, "01_step.sql", "exception", Some(descr))
        t1.applyAction(pkt, "01_step.sql", "h1")
        t1.flushActions()
        t1.persistMeta()
        val t2 = new graft.engine.ActionTracker(spark, state)
        assert(t2.packetStatus(pkt).exists(_.exceptionDescr.contains(descr)))
        assert(t2.executedHashes(pkt, "01_step.sql") == Set("h1"))
        assert(t2.actions.count() == 1)
    }
    // the null marker itself must stay distinguishable from the STRING \N
    val state = Files.createTempDirectory("graft-codec").toString
    val t = new graft.engine.ActionTracker(spark, state)
    t.initTables()
    t.ensurePacket("p", "h", "{}")
    t.setStepStatus("p", "s", "exception", Some("\\N"))
    t.persistMeta()
    val rt = new graft.engine.ActionTracker(spark, state)
    assert(rt.packetStatus("p").exists(_.exceptionDescr.contains("\\N")))
    val state2 = Files.createTempDirectory("graft-codec").toString
    val t2 = new graft.engine.ActionTracker(spark, state2)
    t2.initTables()
    t2.ensurePacket("p", "h", "{}")
    t2.setStepStatus("p", "s", "done", None)
    t2.persistMeta()
    val rt2 = new graft.engine.ActionTracker(spark, state2)
    assert(rt2.packetStatus("p").exists(_.exceptionDescr.isEmpty))
  }

  test("glob matcher agrees with a regex oracle") {
    forAll(maskGen, nameGen) { (mask: String, text: String) =>
      val regex = mask.flatMap {
        case '*' => ".*"
        case '?' => "."
        case c => java.util.regex.Pattern.quote(c.toString)
      }
      assert(GlobMatcher.matches(mask, text) == text.matches(regex),
        s"mask=$mask text=$text")
    }
  }

  test("glob matcher is linear-ish on pathological many-star masks") {
    // the reference's recursive matcher blows up exponentially here
    val mask = "*a" * 25 + "b"
    val text = "a" * 200
    val t0 = System.nanoTime()
    assert(!GlobMatcher.matches(mask, text))
    assert((System.nanoTime() - t0) / 1e9 < 1.0, "matcher must not be exponential")
  }

  test("resolve: exclude entries without '*' are exact names (reference parity)") {
    val dbs = Seq("prod1", "prod2", "prod10", "stage")
    // excluding exact "prod1" must NOT exclude "prod10"
    assert(GlobMatcher.resolve("ALL,exclude:prod1", dbs) ==
      Seq("prod2", "prod10", "stage"))
    assert(GlobMatcher.resolve("ALL,exclude:prod*", dbs) == Seq("stage"))
    assert(GlobMatcher.resolve("pro?1", dbs) == Seq("prod1"))
    assert(GlobMatcher.resolve("ALL", dbs) == dbs)
  }

  test("user placeholders: longer keys win over their prefixes") {
    forAll(nameGen.suchThat(_.nonEmpty)) { k =>
      val sql = s"SELECT DBC_PL_$k, DBC_PL_${k}X"
      val out = Placeholders.applyUser(sql, Map(k -> "a", s"${k}X" -> "b"))
      assert(out == "SELECT a, b", s"k=$k out=$out")
    }
  }

  test("generator rows: FLD_10 is not clobbered by FLD_1") {
    val row = ("maint" +: (1 to 12).map(i => s"v$i")).toVector
    val sql = (1 to 12).map(i => s"GEN_OBJ_FLD_$i").mkString(",")
    assert(Placeholders.applyObjRow(sql, row) == (1 to 12).map(i => s"v$i").mkString(","))
  }

  test("unresolved detects leftovers and clean SQL passes") {
    assert(Placeholders.unresolved("SELECT GEN_OBJ_FLD_3, DBC_PL_foo") ==
      Seq("GEN_OBJ_FLD_3", "DBC_PL_foo"))
    assert(Placeholders.unresolved("SELECT 1").isEmpty)
  }

  test("packet hash: idempotent, rename-invariant, content-sensitive, .py-sensitive") {
    def mkPacket(files: Map[String, String]): String = {
      val dir = Files.createTempDirectory("graft-hash").resolve("p")
      Files.createDirectories(dir)
      files.foreach { case (n, c) => Files.writeString(dir.resolve(n), c) }
      dir.toString
    }
    val base = Map(
      "01_step.sql" -> "SELECT 1;",
      "02_step.py" -> "# python step",
      "meta_data.json" -> """{"type":"default"}""")
    val h1 = PacketLoader.load(mkPacket(base)).packetHash
    val h2 = PacketLoader.load(mkPacket(base)).packetHash
    assert(h1 == h2, "same content → same hash")
    // rename-invariance: the reference hashes content-sorted concatenation
    val renamed = Map(
      "03_step.sql" -> "SELECT 1;",
      "04_step.py" -> "# python step",
      "meta_data.json" -> """{"type":"default"}""")
    assert(PacketLoader.load(mkPacket(renamed)).packetHash == h1)
    // editing a .py step must drift the hash (reference includes .py,
    // dbccore.py:290-297 — round-1 loader missed this)
    val pyEdit = base.updated("02_step.py", "# python step v2")
    assert(PacketLoader.load(mkPacket(pyEdit)).packetHash != h1)
    // editing meta_data.json drifts too
    val metaEdit = base.updated("meta_data.json", """{"type":"read_only"}""")
    assert(PacketLoader.load(mkPacket(metaEdit)).packetHash != h1)
    // non-hashed files (goldens) do not drift
    val withGolden = base + ("01_step.sql_out" -> "ignored")
    assert(PacketLoader.load(mkPacket(withGolden)).packetHash == h1)
  }

  test("loader: .py files are steps, generators pair by index, run_once first") {
    val dir = Files.createTempDirectory("graft-load").resolve("p")
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("run_once.sql"), "SELECT 'setup';")
    Files.writeString(dir.resolve("01_step.sql"), "SELECT GEN_OBJ_FLD_1;")
    Files.writeString(dir.resolve("01_gen_obj.sql"), "SELECT null, 1;")
    Files.writeString(dir.resolve("02_step.py"), "# callback")
    val p = PacketLoader.load(dir.toString)
    assert(p.steps.map(_.name) == Seq("run_once.sql", "01_step.sql", "02_step.py"))
    assert(p.steps.head.runOnce)
    assert(p.steps.last.isPython)
    assert(p.genObj.keySet == Set("01"))
  }

  test("TopKByScore: any partition split + merge order equals whole-list " +
      "top-k (the distributed-correctness property of the partial agg)") {
    import graft.functions.{ScoredId, TopKByScore}
    // scores drawn from a small set so ties (the risky path) are common
    val itemGen = Gen.zip(Gen.chooseNum(0, 5).map(_ / 2.0),
      Gen.chooseNum(0L, 30L)).map { case (s, i) => ScoredId(s, i) }
    val listGen = Gen.chooseNum(0, 40)
      .flatMap(n => Gen.listOfN(n, itemGen))
    val splitGen = Gen.chooseNum(1, 5)
    forAll(Gen.zip(listGen, splitGen, Gen.chooseNum(1, 7)), 200) {
      case (items, nSplits, k) =>
        val agg = new TopKByScore(k)
        // reference: sort the WHOLE list by (score desc, id asc), take k
        val expect = items.distinct
          .sortBy(x => (-x.score, x.id)).take(k)
        // distributed: shard round-robin, reduce each shard, merge in
        // arbitrary (left-fold) order — duplicates collapse like a
        // groupBy would not, so feed distinct items to both sides
        val shards = items.distinct.zipWithIndex
          .groupBy(_._2 % nSplits).values.map(_.map(_._1))
        val partials = shards.map(_.foldLeft(agg.zero)(agg.reduce))
        val merged = partials.foldLeft(agg.zero)(agg.merge)
        assert(agg.finish(merged) == expect,
          s"k=$k splits=$nSplits items=$items")
    }
  }

  test("KMinLongs: any partition split + merge order equals the whole-" +
      "multiset k-min sketch (KMV union correctness, incl. duplicates)") {
    import graft.functions.KMinLongs
    def ult(a: Long, b: Long) = java.lang.Long.compareUnsigned(a, b) < 0
    // values from a small domain spanning the signed/unsigned boundary
    // so duplicates and negative (= high unsigned) longs are common
    val valGen = Gen.oneOf(
      Gen.chooseNum(0L, 20L),
      Gen.chooseNum(Long.MinValue, Long.MinValue + 20L))
    val listGen = Gen.chooseNum(0, 50).flatMap(n => Gen.listOfN(n, valGen))
    forAll(Gen.zip(listGen, Gen.chooseNum(1, 6), Gen.chooseNum(1, 9)), 200) {
      case (items, nSplits, k) =>
        val agg = new KMinLongs(k)
        // reference: the k smallest DISTINCT values under unsigned order
        // of the WHOLE multiset — duplicates must collapse inside the
        // sketch (sketch of a multiset == sketch of its support set)
        val expect = items.distinct.sortWith(ult).take(k)
        val shards = items.zipWithIndex
          .groupBy(_._2 % nSplits).values.map(_.map(_._1))
        val partials = shards.map(_.foldLeft(agg.zero)(agg.reduce))
        val merged = partials.foldLeft(agg.zero)(agg.merge)
        assert(agg.finish(merged) == expect,
          s"k=$k splits=$nSplits items=$items")
    }
  }

  test("MinKLongs/MinKIdSigs: any split + merge order equals the sorted-" +
      "truncated whole set (the collect_set formulation they replaced)") {
    import graft.functions.{IdSig, MinKIdSigs, MinKLongs}
    // distinct ids per group (the twins' per-(window,key) uniqueness
    // contract); shuffled arrival and arbitrary partition splits must
    // yield the cap-smallest members in order — the streaming state
    // boundedness claim rests on this equivalence
    val idsGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.pick(n, 0L until 200L).map(_.toList))
    forAll(Gen.zip(idsGen, Gen.chooseNum(1, 6), Gen.chooseNum(1, 12)), 200) {
      case (ids, nSplits, cap) =>
        val shuffledIds = scala.util.Random.shuffle(ids)
        val expect = ids.sorted.take(cap)
        val la = new MinKLongs(cap)
        val lShards = shuffledIds.zipWithIndex
          .groupBy(_._2 % nSplits).values.map(_.map(_._1))
        val lMerged = lShards.map(_.foldLeft(la.zero)(la.reduce))
          .foldLeft(la.zero)(la.merge)
        assert(la.finish(lMerged) == expect, s"cap=$cap ids=$ids")
        // every partial buffer is itself bounded — the state claim
        lShards.map(_.foldLeft(la.zero)(la.reduce))
          .foreach(p => assert(p.size <= cap))
        val sa = new MinKIdSigs(cap)
        val sigs = shuffledIds.map(i => IdSig(i, i * 31L))
        val sShards = sigs.zipWithIndex
          .groupBy(_._2 % nSplits).values.map(_.map(_._1))
        val sMerged = sShards.map(_.foldLeft(sa.zero)(sa.reduce))
          .foldLeft(sa.zero)(sa.merge)
        assert(sa.finish(sMerged).map(_.id) == expect, s"cap=$cap ids=$ids")
        sShards.map(_.foldLeft(sa.zero)(sa.reduce))
          .foreach(p => assert(p.size <= cap))
    }
  }

  test("funnel state fold: ANY arrival order reaches the batch gated-" +
      "funnel answer, and in-order streams hold O(1) state") {
    import graft.streaming.EventsStreaming
    import graft.streaming.EventsStreaming.FunnelState
    val stages = ("s", "v", "p")
    // small time domain so gate ties and equal-time chains are common
    val evGen = Gen.zip(Gen.oneOf("s", "v", "p", "x"), Gen.chooseNum(0L, 12L))
    val seqGen = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, evGen))
    def fold(evs: List[(String, Long)]): Option[(Long, Option[Long], Option[Long])] = {
      val st = evs.foldLeft(
        FunnelState(Long.MaxValue, Seq.empty, Seq.empty, Long.MinValue)) {
        case (acc, (tpe, t)) => EventsStreaming.funnelStep(acc, tpe, t, stages)
      }
      EventsStreaming.funnelFinish(1L, st)
        .map(r => (r.t_signup.get, r.t_view, r.t_purchase))
    }
    forAll(seqGen, 400) { evs =>
      // reference: the p07 definition computed on the full multiset
      val ss = evs.collect { case ("s", t) => t }
      val expect =
        if (ss.isEmpty) None
        else {
          val s = ss.min
          val v = evs.collect { case ("v", t) if t >= s => t }.minOption
          val p = v.flatMap(tv =>
            evs.collect { case ("p", t) if t >= tv => t }.minOption)
          Some((s, v, p))
        }
      assert(fold(evs) == expect, s"in-order $evs")
      val rnd = new scala.util.Random(evs.hashCode)
      assert(fold(rnd.shuffle(evs)) == expect, s"shuffled $evs")
      // time-sorted arrival (the in-order stream) keeps ≤1 view and
      // ≤1 purchase at-or-above each gate — the O(1)-per-user claim
      val sortedSt = evs.sortBy(_._2).foldLeft(
        FunnelState(Long.MaxValue, Seq.empty, Seq.empty, Long.MinValue)) {
        case (acc, (tpe, t)) => EventsStreaming.funnelStep(acc, tpe, t, stages)
      }
      if (ss.nonEmpty) {
        assert(sortedSt.views.count(_ >= sortedSt.s) <= 1)
        sortedSt.views.filter(_ >= sortedSt.s).minOption.foreach { tv =>
          assert(sortedSt.purchases.count(_ >= tv) <= 1)
        }
      }
    }
  }
  test("snapshot commits: any sequence of partial-partition commits " +
      "folds to the model (last commit per partition wins), and the " +
      "horizon keeps exactly the last two snapshots") {
    val spark = TestSpark.session
    import spark.implicits._
    import graft.engine.PartitionedManifest
    // commit sequences over 4 partitions: each commit updates a random
    // NONEMPTY subset; the model is last-writer-wins per partition
    val subsetGen = Gen.someOf(0, 1, 2, 3).suchThat(_.nonEmpty)
    val seqGen = Gen.chooseNum(2, 5).flatMap(n => Gen.listOfN(n, subsetGen))
    forAll(seqGen, 6) { commits =>
      val root = Files.createTempDirectory("prop-snap").toString
      def rows(part: Int, commit: Int) =
        (1 to 5).map(i => (commit.toLong, part * 100L + i)).toDF("c", "k")
      PartitionedManifest.seed(spark, root,
        (0 to 3).map(p => rows(p, 0)
          .withColumn("bk", org.apache.spark.sql.functions.lit(p)))
          .reduce(_.unionByName(_)), "bk")
      PartitionedManifest.commitSnapshot(spark, root, "bk", Map.empty)
      val model = scala.collection.mutable.Map(
        0 -> 0, 1 -> 0, 2 -> 0, 3 -> 0)
      commits.zipWithIndex.foreach { case (parts, i) =>
        val commit = i + 1
        PartitionedManifest.commitSnapshot(spark, root, "bk",
          parts.map(p => p.toString -> rows(p, commit)).toMap)
        parts.foreach(p => model(p) = commit)
      }
      val got = PartitionedManifest.readSnapshot(spark, root, "bk", "int")
        .select($"bk", $"c").distinct()
        .as[(Int, Long)].collect().toMap
      assert(got == model.map { case (p, c) => p -> c.toLong }.toMap,
        s"commits=$commits got=$got model=$model")
      assert(PartitionedManifest.snapshots(spark, root).length == 2)
    }
  }

  test("int2vector dialect rules vs a direct oracle: subscripts read " +
      "0-based positions (NULL past the end), ANY() is membership, for " +
      "arbitrary vectors") {
    val spark = TestSpark.session
    import graft.engine.PgDialectRewriter.rewrite
    val vecGen = Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1, 40)))
    forAll(Gen.zip(vecGen, Gen.chooseNum(0, 7), Gen.chooseNum(1, 40)), 60) {
      case ((vec, idx, probe)) =>
        val lit = vec.mkString(" ")
        val r = spark.sql(rewrite(
          s"SELECT x.indkey[$idx] AS k, $probe = any(x.indkey) AS m " +
            s"FROM (SELECT '$lit' AS indkey) x")).head
        if (idx < vec.length) assert(r.getInt(0) == vec(idx),
          s"vec=$lit idx=$idx")
        else assert(r.isNullAt(0), s"vec=$lit idx=$idx must be NULL")
        assert(r.getBoolean(1) == vec.contains(probe),
          s"vec=$lit probe=$probe")
    }
  }

  test("interval-literal coercion vs epoch arithmetic: '<n> days' " +
      "comparisons agree with the second-level oracle for arbitrary " +
      "timestamps and thresholds") {
    val spark = TestSpark.session
    import graft.engine.PgDialectRewriter.rewrite
    // now() pins to 2024-01-01 10:05:00 (the snapshot instant)
    val nowS = java.sql.Timestamp.valueOf("2024-01-01 10:05:00")
      .getTime / 1000
    val tsGen = Gen.chooseNum(0L, 90L * 86400).map(back =>
      new java.sql.Timestamp((nowS - back) * 1000))
    forAll(Gen.zip(tsGen, Gen.chooseNum(1, 60)), 60) { case (ts, days) =>
      val got = spark.sql(rewrite(
        s"SELECT age(now(), TIMESTAMP '$ts') > '$days days' AS a, " +
          s"(now() - TIMESTAMP '$ts') >= '00:00:01' AS b")).head
      val diffS = nowS - ts.getTime / 1000
      assert(got.getBoolean(0) == (diffS > days.toLong * 86400),
        s"ts=$ts days=$days diff=$diffS")
      assert(got.getBoolean(1) == (diffS >= 1), s"ts=$ts")
    }
  }
}
