package graft.queries

import java.nio.file.Files

import graft.engine.{PacketRunner, RunnerConf}
import graft.sources.Tables

/** Queries produced THROUGH the packet engine — the final resultset of a
  * real packet run (loader → run_once → generator fan-out → tracked
  * actions), hash-checked against a DuckDB oracle that recomputes the
  * same result relationally. This is the engine-layer correctness gate:
  * if the fan-out, substitution, ordering, or idempotency machinery is
  * wrong, the resultset diverges.
  */
object EngineQueries {

  /** Packet corpus location: repo-relative in sbt runs, absolute otherwise. */
  def packetsDir: String =
    if (new java.io.File("packets").isDirectory) "packets"
    else "/root/repo/packets"

  val specs: Seq[QuerySpec] = Seq(
    // run the e01 packet (fresh tracker state + output location each call
    // → deterministic full execution), then read its final table
    QuerySpec("e01_packet_run", (s, dir) => {
      Tables.registerAll(s, dir)
      val conf = RunnerConf(
        stateDir = Files.createTempDirectory("graft-e01-state").toString,
        placeholders = Map(
          "out_loc" -> Files.createTempDirectory("graft-e01-out").toString))
      val res = new PacketRunner(s, conf).run(s"$packetsDir/e01_packet_run")
      require(res.resultCode("spark") == "success",
        s"e01 packet run failed: ${res.notices.mkString("; ")}")
      s.sql("SELECT r_name, n_count FROM e01_out ORDER BY r_name")
    }, oracle = Some("""
      SELECT r_name,
        (SELECT count(*) FROM nation n WHERE n.n_regionkey = r.r_regionkey)
          AS n_count
      FROM region r ORDER BY r_name""")),

    // THE FLAGSHIP PIPELINE AS A PACKET (packets/e02_llm_ingest +
    // graft.engine.LlmIngestSteps): train tokenizer (t23) → persist
    // artifact (t24) → encode corpus (t22) → pack windows (p28) →
    // curriculum order (p26), composed as ORDERED ENGINE STEPS through
    // PacketRunner — so the flagship LLM-ingest pipeline inherits the
    // reference's execution contract: per-action MD5 dedup (resume
    // skips completed stages; EngineSpec pins kill-between-steps →
    // re-run executes only the remaining ones), typed errors, notices,
    // atomic manifest publish of the final corpus. FULL oracle: DuckDB
    // replays batched training end to end (the t23 recursive-CTE
    // machinery), derives every doc's REAL token count from the trained
    // segmentation, then replays packing's ordered cumsum and the
    // curriculum's mixture-weight interleave — one wrong merge, count,
    // chunk boundary, or curriculum position breaks the compare.
    QuerySpec("e02_llm_ingest", (s, dir) => {
      Tables.registerAll(s, dir)
      graft.engine.LlmIngestSteps.ensureE02Steps()
      val conf = RunnerConf(
        stateDir = Files.createTempDirectory("graft-e02-state").toString,
        placeholders = Map(
          "e02_art" -> Files.createTempDirectory("graft-e02-art").toString,
          "e02_enc" -> Files.createTempDirectory("graft-e02-enc").toString,
          "e02_pack" -> Files.createTempDirectory("graft-e02-pack").toString,
          "e02_pub" -> Files.createTempDirectory("graft-e02-pub").toString))
      val res = new PacketRunner(s, conf).run(s"$packetsDir/e02_llm_ingest")
      require(res.resultCode("spark") == "success",
        s"e02 packet failed: ${res.notices.mkString("; ")}")
      s.sql("""SELECT pos, doc_id, source, n_tokens,
                      CAST(chunk_first AS BIGINT) AS chunk_first
               FROM e02_corpus ORDER BY pos""")
    }, oracle = Some(PipelineQueries.bpeBatchedOracleCore(
        rounds = 4, batchR = 8, candK = 64) + """,
      wsegs AS MATERIALIZED (
        SELECT w, CAST(len(string_split(substr(rep, 2,
          length(rep) - 2), '||')) AS BIGINT) AS nseg
        FROM rep4),
      dwords AS (
        SELECT doc_id, ws[wi] AS w
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS wi
              FROM (SELECT doc_id,
                      string_split_regex(trim(text), '\s+') AS ws
                    FROM documents))
        WHERE length(ws[wi]) >= 1 AND ws[wi] NOT LIKE '%|%'),
      counts AS (
        SELECT doc_id, CAST(sum(sg.nseg) AS BIGINT) AS n_tokens
        FROM dwords d JOIN wsegs sg USING (w) GROUP BY doc_id),
      c2 AS (
        SELECT doc_id, n_tokens,
          CAST(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
        FROM counts),
      pk AS (
        SELECT doc_id, n_tokens,
          (tok_end - n_tokens) // 512 AS chunk_first
        FROM c2),
      srcs AS (SELECT doc_id, source FROM documents),
      dtoks AS (SELECT c.doc_id, sr.source, c.n_tokens AS n
                FROM counts c JOIN srcs sr USING (doc_id)),
      mass AS (SELECT source, CAST(sum(n) AS BIGINT) AS m
               FROM dtoks GROUP BY source),
      tot AS (SELECT CAST(sum(m) AS BIGINT) AS t FROM mass),
      qw AS (
        SELECT source, m,
          CAST(floor(1000000.0 *
            sqrt(CAST(m AS DOUBLE) / CAST(t AS DOUBLE))) AS BIGINT) AS w
        FROM mass CROSS JOIN tot),
      sw AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM qw),
      wt AS (SELECT source, (w * 1000000 // sw.sw) AS weight_ppm
             FROM qw CROSS JOIN sw),
      ranked AS (
        SELECT doc_id, source, n,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY n DESC, doc_id) AS BIGINT) AS r
        FROM dtoks),
      vt AS (
        SELECT ranked.*, (r * 1000000) // wt.weight_ppm AS vtime
        FROM ranked JOIN wt USING (source))
      SELECT CAST(row_number() OVER
          (ORDER BY v.vtime, v.source, v.r) AS BIGINT) AS pos,
        v.doc_id, v.source, p.n_tokens,
        CAST(p.chunk_first AS BIGINT) AS chunk_first
      FROM vt v JOIN pk p USING (doc_id)
      ORDER BY pos""")),

    // the int4→int8 migration: widened table built by generator-batched
    // partition overwrites, validated, swapped — final table must agree
    // with a direct relational recomputation from the source fixture
    QuerySpec("w01_migration_int4_to_int8", (s, dir) => {
      Tables.registerAll(s, dir)
      // partition grain sized to the data: ~20 partitions/batches at any SF
      val maxId = Tables.load(s, dir, "orders")
        .agg(org.apache.spark.sql.functions.max("o_orderkey")).head().getLong(0)
      val grain = math.max(1000L, math.ceil(maxId / 20000.0).toLong * 1000L)
      val conf = RunnerConf(
        stateDir = Files.createTempDirectory("graft-w01-state").toString,
        placeholders = Map(
          "bk_grain" -> grain.toString,
          "mig_src" -> Files.createTempDirectory("graft-w01-src").toString,
          "mig_dst" -> Files.createTempDirectory("graft-w01-dst").toString,
          "mig_catch" -> Files.createTempDirectory("graft-w01-catch").toString))
      val res = new PacketRunner(s, conf).run(s"$packetsDir/test_int4_to_int8")
      require(res.resultCode("spark") == "success",
        s"migration packet failed: ${res.notices.mkString("; ")}")
      s.sql("""SELECT CAST(count(*) AS BIGINT) AS n_rows,
                      CAST(min(id) AS BIGINT) AS min_id,
                      CAST(max(id) AS BIGINT) AS max_id,
                      CAST(sum(id) AS BIGINT) AS sum_id
               FROM test_tbl""")
    }, oracle = Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(min(o_orderkey) AS BIGINT) AS min_id,
             CAST(max(o_orderkey) AS BIGINT) AS max_id,
             CAST(sum(o_orderkey) AS BIGINT) AS sum_id
      FROM orders""")),

    // DELETE as anti-filter rewrite + ATOMIC manifest publish (the
    // 02_step.py callback: version write -> one-rename pointer swap ->
    // single-op view re-point; graft.engine.ManifestTable); final table
    // vs direct filter
    QuerySpec("w02_delete_rewrite", (s, dir) => {
      Tables.registerAll(s, dir)
      graft.engine.ManifestTable.ensurePacketPublishSteps()
      val conf = RunnerConf(
        stateDir = Files.createTempDirectory("graft-w02-state").toString,
        placeholders = Map(
          "del_src" -> Files.createTempDirectory("graft-w02-src").toString,
          "del_dst" -> Files.createTempDirectory("graft-w02-dst").toString,
          "del_pub" -> Files.createTempDirectory("graft-w02-pub").toString))
      val res = new PacketRunner(s, conf).run(s"$packetsDir/test_delete")
      require(res.resultCode("spark") == "success",
        s"delete packet failed: ${res.notices.mkString("; ")}")
      s.sql("""SELECT n_nationkey, n_name, n_regionkey FROM del_tbl
               ORDER BY n_nationkey""")
    }, oracle = Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
             CAST(n_regionkey AS BIGINT) AS n_regionkey
      FROM nation WHERE NOT (n_regionkey = 2) ORDER BY n_nationkey""")),

    // MERGE-style keyed upsert: copy-on-write anti-join + union, published
    // ATOMICALLY per delta-touched partition through the per-partition
    // MANIFEST layout (graft.engine.PartitionedManifest; packets/
    // test_merge; untouched-partition-files-unchanged is pinned in
    // EngineSpec). Final table vs a direct relational MERGE recomputation.
    // SCD2 history-preserving dimension upsert through the packet engine
    // (packets/test_scd2): attribute changes close the current row and
    // insert a new one; only delta-touched partitions are republished,
    // each behind its own atomic pointer swap.
    // The oracle reconstructs the post-upsert dimension relationally from
    // the customer fixture.
    // Schema evolution through the packet engine (packets/
    // test_add_column): ADD COLUMN + computed backfill as copy-on-write
    // (parquet cannot backfill in place), single-pass fail-loud
    // validation before the swap (the w01 rule). The oracle recomputes
    // the widened table from the supplier fixture.
    QuerySpec("w05_add_column_backfill", (s, dir) => {
      Tables.registerAll(s, dir)
      graft.engine.ManifestTable.ensurePacketPublishSteps()
      val conf = RunnerConf(
        stateDir = Files.createTempDirectory("graft-w05-state").toString,
        placeholders = Map(
          "evo_src" -> Files.createTempDirectory("graft-w05-src").toString,
          "evo_dst" -> Files.createTempDirectory("graft-w05-dst").toString,
          "evo_pub" -> Files.createTempDirectory("graft-w05-pub").toString))
      val res = new PacketRunner(s, conf).run(s"$packetsDir/test_add_column")
      require(res.resultCode("spark") == "success",
        s"add-column packet failed: ${res.notices.mkString("; ")}")
      s.sql("""SELECT s_suppkey, s_name, s_nationkey, s_acctbal, acct_band
               FROM evo_tbl ORDER BY s_suppkey""")
    }, oracle = Some("""
      SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
        CASE WHEN s_acctbal < 0 THEN 'neg'
             WHEN s_acctbal < 5000 THEN 'mid'
             ELSE 'high' END AS acct_band
      FROM supplier ORDER BY s_suppkey""")),

    // SNAPSHOT commit + time travel (graft.engine.PartitionedManifest):
    // one root-level pointer over the whole partition set — a
    // multi-partition publish becomes visible in a single atomic rename
    // (cross-partition consistency, the step past w03/w04's
    // per-partition pointers), and the previous snapshot stays readable
    // (keep-2 horizon = time travel). The query seeds a 2-partition
    // table, commits a second snapshot rewriting partition 0, and reads
    // BOTH snapshots back; the oracle recomputes both versions
    // relationally from the nation fixture.
    QuerySpec("w06_snapshot_time_travel", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{concat, lit}
      import graft.engine.PartitionedManifest
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w06").toString
      val nation = Tables.load(s, dir, "nation")
        .select($"n_nationkey".cast("long").as("n_nationkey"), $"n_name",
          ($"n_regionkey" % 2).cast("int").as("bk"))
      PartitionedManifest.seed(s, root, nation, "bk")
      PartitionedManifest.commitSnapshot(s, root, "bk", Map.empty)
      val p0 = PartitionedManifest.readSnapshot(s, root, "bk", "int")
        .filter($"bk" === 0)
        .select($"n_nationkey", concat($"n_name", lit(" (v2)")).as("n_name"))
      PartitionedManifest.commitSnapshot(s, root, "bk", Map("0" -> p0))
      val snaps = PartitionedManifest.snapshots(s, root)
      val s1 = PartitionedManifest
        .readSnapshot(s, root, "bk", "int", Some(snaps.head))
        .withColumn("snap", lit(1L))
      val s2 = PartitionedManifest
        .readSnapshot(s, root, "bk", "int", Some(snaps.last))
        .withColumn("snap", lit(2L))
      s1.unionByName(s2)
        .select($"snap", $"n_nationkey", $"n_name",
          $"bk".cast("long").as("bk"))
        .orderBy($"snap", $"n_nationkey")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
               CAST(n_regionkey % 2 AS BIGINT) AS bk
        FROM nation),
      s1 AS (SELECT 1 AS snap, n_nationkey, n_name, bk FROM base),
      s2 AS (SELECT 2 AS snap, n_nationkey,
               CASE WHEN bk = 0 THEN n_name || ' (v2)' ELSE n_name END
                 AS n_name, bk
             FROM base)
      SELECT CAST(snap AS BIGINT) AS snap, n_nationkey, n_name, bk
      FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
      ORDER BY snap, n_nationkey""")),

    // KEEP-N TIME TRAVEL + CATALOG-PINNED HISTORICAL SNAPSHOT
    // (PartitionedManifest.commitSnapshot(keepSnapshots = 3) +
    // syncCatalogTableSnapshot): the horizon is a config, not the
    // constant 2 — three commits stay fully readable, with per-partition
    // version GC protecting exactly the kept snapshots' referenced
    // directories — and the MIDDLE (historical) snapshot serves through
    // a catalog table pinned to its mapping: one partitioned relation
    // with real PartitionFilters pruning (plan-asserted in
    // PlanAuditSpec), not the N-branch fresh-engine union. The oracle
    // recomputes all three versions relationally from the nation
    // fixture; a GC bug that collected a still-referenced version dir
    // or a mapping bug in the pinned catalog table breaks a row.
    QuerySpec("w07_snapshot_catalog_history", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{concat, lit}
      import graft.engine.PartitionedManifest
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w07").toString
      val nation = Tables.load(s, dir, "nation")
        .select($"n_nationkey".cast("long").as("n_nationkey"), $"n_name",
          ($"n_regionkey" % 2).cast("int").as("bk"))
      PartitionedManifest.seed(s, root, nation, "bk")
      PartitionedManifest.commitSnapshot(s, root, "bk", Map.empty,
        keepSnapshots = 3)
      val p0 = PartitionedManifest.readSnapshot(s, root, "bk", "int")
        .filter($"bk" === 0)
        .select($"n_nationkey", concat($"n_name", lit(" (v2)")).as("n_name"))
      PartitionedManifest.commitSnapshot(s, root, "bk", Map("0" -> p0),
        keepSnapshots = 3)
      val p1 = PartitionedManifest.readSnapshot(s, root, "bk", "int")
        .filter($"bk" === 1)
        .select($"n_nationkey", concat($"n_name", lit(" (v3)")).as("n_name"))
      PartitionedManifest.commitSnapshot(s, root, "bk", Map("1" -> p1),
        keepSnapshots = 3)
      val snaps = PartitionedManifest.snapshots(s, root)
      require(snaps.length == 3, s"expected keep-3 horizon, got $snaps")
      s.sql("DROP TABLE IF EXISTS w07_hist")
      PartitionedManifest.syncCatalogTableSnapshot(s, root, "w07_hist",
        "bk", "int", Some(snaps(1)))
      val oldest = PartitionedManifest
        .readSnapshot(s, root, "bk", "int", Some(snaps(0)))
        .withColumn("snap", lit(1L))
      val hist = s.table("w07_hist").withColumn("snap", lit(2L))
      val cur = PartitionedManifest
        .readSnapshot(s, root, "bk", "int", Some(snaps(2)))
        .withColumn("snap", lit(3L))
      oldest.unionByName(hist).unionByName(cur)
        .select($"snap", $"n_nationkey", $"n_name",
          $"bk".cast("long").as("bk"))
        .orderBy($"snap", $"n_nationkey")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
               CAST(n_regionkey % 2 AS BIGINT) AS bk
        FROM nation),
      s1 AS (SELECT 1 AS snap, n_nationkey, n_name, bk FROM base),
      s2 AS (SELECT 2 AS snap, n_nationkey,
               CASE WHEN bk = 0 THEN n_name || ' (v2)' ELSE n_name END
                 AS n_name, bk
             FROM base),
      s3 AS (SELECT 3 AS snap, n_nationkey,
               CASE WHEN bk = 0 THEN n_name || ' (v2)'
                    ELSE n_name || ' (v3)' END AS n_name, bk
             FROM base)
      SELECT CAST(snap AS BIGINT) AS snap, n_nationkey, n_name, bk
      FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
            UNION ALL SELECT * FROM s3)
      ORDER BY snap, n_nationkey""")),

    // SMALL-FILE COMPACTION (PartitionedManifest.compact): the Iceberg
    // rewrite_data_files / OPTIMIZE maintenance pass over the manifest
    // table format — partition bk=0 is deliberately fragmented into >=4
    // data files via a per-partition publish, then compact() rewrites
    // exactly the fragmented partitions through commitSnapshot's
    // one-job write and publishes one atomic snapshot. The query
    // require()s the physical contract (only bk=0 touched; its live
    // version collapses to ONE file; bk=1's version dir untouched) and
    // returns the post-compaction table; the oracle recomputes the
    // expected content relationally — compaction must be
    // content-preserving.
    QuerySpec("w08_compaction", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{concat, lit}
      import graft.engine.{ManifestTable, PartitionedManifest}
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w08").toString
      val nation = Tables.load(s, dir, "nation")
        .select($"n_nationkey".cast("long").as("n_nationkey"), $"n_name",
          ($"n_regionkey" % 2).cast("int").as("bk"))
      PartitionedManifest.seed(s, root, nation, "bk")
      // fragment bk=0: rewrite it as (v2) rows spread over 4 files
      val p0 = ManifestTable.read(s, s"$root/bk=0")
        .select($"n_nationkey", concat($"n_name", lit(" (v2)")).as("n_name"))
        .repartition(4)
      PartitionedManifest.publishPartition(s, root, "bk", "0", p0)
      val before = PartitionedManifest.dataFileCount(s, s"$root/bk=0")
      require(before >= 4, s"expected a fragmented bk=0, got $before files")
      val dir1 = ManifestTable.currentDataDir(s"$root/bk=1").get
      val (_, touched) = PartitionedManifest.compact(s, root, "bk",
        maxFiles = 3)
      require(touched == Seq("0"), s"expected only bk=0 compacted: $touched")
      require(PartitionedManifest.dataFileCount(s, s"$root/bk=0") == 1,
        "compaction must collapse bk=0 to one data file")
      require(ManifestTable.currentDataDir(s"$root/bk=1").get == dir1,
        "compaction must not rewrite the un-fragmented partition")
      PartitionedManifest.readSnapshot(s, root, "bk", "int")
        .select($"n_nationkey", $"n_name", $"bk".cast("long").as("bk"))
        .orderBy($"n_nationkey")
    }, oracle = Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
        CASE WHEN n_regionkey % 2 = 0 THEN n_name || ' (v2)'
             ELSE n_name END AS n_name,
        CAST(n_regionkey % 2 AS BIGINT) AS bk
      FROM nation ORDER BY n_nationkey"""), bench = true),

    // COMPACTION AS A MAINTENANCE PACKET (test_compaction +
    // registerCompactionStep): the w08 operator reached through the
    // engine layer — run_once seeds a deliberately FRAGMENTED
    // partitioned table (a round-robin REPARTITION(4) CTAS lands ~4
    // sliver files per partition), the seed step adopts it in place
    // (slivers preserved), the compaction step rewrites every
    // fragmented partition behind one atomic snapshot, and a fail-loud
    // SQL validation step checks content preservation inside the
    // packet itself. The query require()s the physical outcome (every
    // partition's live version collapsed to one file; the compaction
    // notice fired) and returns the served table; the oracle
    // recomputes the content relationally.
    QuerySpec("w09_compaction_packet", (s, dir) => {
      Tables.registerAll(s, dir)
      graft.engine.PartitionedManifest.ensurePacketPublishSteps()
      val conf = RunnerConf(
        stateDir = Files.createTempDirectory("graft-w09-state").toString,
        placeholders = Map(
          "cmp_src" -> Files.createTempDirectory("graft-w09-src").toString))
      val res = new PacketRunner(s, conf).run(s"$packetsDir/test_compaction")
      require(res.resultCode("spark") == "success",
        s"compaction packet failed: ${res.notices.mkString("; ")}")
      val root = conf.placeholders("cmp_src")
      import graft.engine.PartitionedManifest
      PartitionedManifest.partitionValues(s, root, "bk").foreach { v =>
        require(PartitionedManifest.dataFileCount(s, s"$root/bk=$v") == 1,
          s"bk=$v not compacted to one file")
      }
      require(res.notices.exists(n =>
          n.message.contains("compacted cmp_tbl") ||
            n.message.contains("compaction no-op")),
        s"no compaction notice: ${res.notices.mkString("; ")}")
      s.sql("""SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
                      s_acctbal, CAST(bk AS BIGINT) AS bk
               FROM cmp_tbl ORDER BY s_suppkey""")
    }, oracle = Some("""
      SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, s_acctbal,
        CAST(s_nationkey % 5 AS BIGINT) AS bk
      FROM supplier ORDER BY s_suppkey"""), bench = true),

    // CDC / INCREMENTAL READ (PartitionedManifest.changesBetween): the
    // row-level diff between two snapshot commits, derived from the
    // immutable version directories — no stored change files, ingest
    // pays nothing. The diff is metadata-FIRST: only partitions whose
    // version directory moved between the commits are listed or read
    // (require()d below via inputFiles — the delta touches bk=1 only,
    // so every planned file must live under bk=1), then the multiset
    // row diff labels inserts and deletes (an update = delete+insert,
    // the Delta CDF shape). The oracle replays the delta construction
    // and both EXCEPT ALLs relationally.
    QuerySpec("w11_cdc_changes", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{lit, when}
      import graft.engine.PartitionedManifest
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w11").toString
      val base = Tables.load(s, dir, "customer")
        .select($"c_custkey".cast("long").as("c_custkey"),
          $"c_acctbal".cast("double").as("c_acctbal"),
          ($"c_custkey" % 4).cast("int").as("bk"))
      PartitionedManifest.seed(s, root, base, "bk")
      val s1 = PartitionedManifest.commitSnapshot(s, root, "bk", Map.empty)
      val old1 = PartitionedManifest.readSnapshot(s, root, "bk", "int")
        .filter($"bk" === 1)
      // the delta on bk=1: update custkey%10==1, delete custkey%20==13,
      // insert a shifted row per custkey%40==1
      val new1 = old1.filter($"c_custkey" % 20 =!= 13)
        .withColumn("c_acctbal", when($"c_custkey" % 10 === 1,
          $"c_acctbal" + 50.0).otherwise($"c_acctbal"))
        .unionByName(old1.filter($"c_custkey" % 40 === 1)
          .select(($"c_custkey" + 1000000L).as("c_custkey"),
            lit(0.0).as("c_acctbal"), $"bk"))
      val s2 = PartitionedManifest.commitSnapshot(s, root, "bk",
        Map("1" -> new1))
      val ch = PartitionedManifest.changesBetween(s, root, "bk", "int",
        s1, s2, changeCol = "change_type")
      require(ch.inputFiles.nonEmpty &&
          ch.inputFiles.forall(_.contains("/bk=1/")),
        "CDC must plan ONLY the changed partition's files: " +
          ch.inputFiles.filterNot(_.contains("/bk=1/")).mkString(","))
      ch.select($"c_custkey", $"c_acctbal", $"bk".cast("long").as("bk"),
          $"change_type")
        .orderBy($"change_type", $"c_custkey", $"c_acctbal")
    }, oracle = Some("""
      WITH old1 AS (
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal,
               CAST(c_custkey % 4 AS BIGINT) AS bk
        FROM customer WHERE c_custkey % 4 = 1),
      new1 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 1 THEN c_acctbal + 50.0
                    ELSE c_acctbal END AS c_acctbal, bk
        FROM old1 WHERE c_custkey % 20 <> 13
        UNION ALL
        SELECT c_custkey + 1000000, 0.0, bk
        FROM old1 WHERE c_custkey % 40 = 1),
      ins AS (SELECT *, 'insert' AS change_type FROM
                (SELECT * FROM new1 EXCEPT ALL SELECT * FROM old1)),
      del AS (SELECT *, 'delete' AS change_type FROM
                (SELECT * FROM old1 EXCEPT ALL SELECT * FROM new1))
      SELECT c_custkey, c_acctbal, bk, change_type
      FROM (SELECT * FROM ins UNION ALL SELECT * FROM del)
      ORDER BY change_type, c_custkey, c_acctbal"""), bench = true),

    // ROLLBACK + NAMED TAGS (PartitionedManifest.rollback/tagSnapshot):
    // the Iceberg rollback_to_snapshot + tag-retention contract on the
    // manifest table format. The initial commit is TAGGED, which pins
    // it OUTSIDE the keep-2 horizon (two later commits would otherwise
    // expire it — require()d below); rollback to the tag is
    // METADATA-ONLY (require()d: the restored partition's live version
    // DIRECTORY is identical, not merely equal in content) and lands as
    // a NEW forward commit. The query serves the rolled-back table both
    // through the live path and through the tag-pinned snapshot; the
    // oracle says both must equal the original content.
    QuerySpec("w12_rollback_tag", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{concat, lit}
      import graft.engine.{ManifestTable, PartitionedManifest}
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w12").toString
      val nation = Tables.load(s, dir, "nation")
        .select($"n_nationkey".cast("long").as("n_nationkey"), $"n_name",
          ($"n_regionkey" % 2).cast("int").as("bk"))
      PartitionedManifest.seed(s, root, nation, "bk")
      val s1 = PartitionedManifest.commitSnapshot(s, root, "bk", Map.empty)
      PartitionedManifest.tagSnapshot(s, root, "release-1")
      val taggedDir0 = ManifestTable.currentDataDir(s"$root/bk=0").get
      def bump(v: Int, suffix: String) = {
        val p = PartitionedManifest.readSnapshot(s, root, "bk", "int")
          .filter($"bk" === v)
          .select($"n_nationkey",
            concat($"n_name", lit(suffix)).as("n_name"))
        PartitionedManifest.commitSnapshot(s, root, "bk",
          Map(v.toString -> p))
      }
      bump(0, " (bad)")
      bump(1, " (worse)")
      // keep-2 horizon + the tag: s1 must SURVIVE the two trims
      val snaps = PartitionedManifest.snapshots(s, root)
      require(snaps.contains(s1) && snaps.length == 3,
        s"tagged snapshot must outlive the keep-2 horizon: $snaps")
      PartitionedManifest.rollback(s, root, "bk", "release-1")
      require(ManifestTable.currentDataDir(s"$root/bk=0")
          .contains(taggedDir0),
        "rollback must repoint to the ORIGINAL version dir (metadata-" +
          "only), not rewrite content")
      val live = PartitionedManifest.read(s, root, "bk", "int")
        .withColumn("src", lit("live"))
      val tagged = PartitionedManifest.readSnapshot(s, root, "bk", "int",
          PartitionedManifest.resolveRef(s, root, Some("release-1")))
        .withColumn("src", lit("tag"))
      live.unionByName(tagged)
        .select($"src", $"n_nationkey", $"n_name",
          $"bk".cast("long").as("bk"))
        .orderBy($"src", $"n_nationkey")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
               CAST(n_regionkey % 2 AS BIGINT) AS bk
        FROM nation)
      SELECT src, n_nationkey, n_name, bk
      FROM (SELECT 'live' AS src, * FROM base
            UNION ALL SELECT 'tag' AS src, * FROM base)
      ORDER BY src, n_nationkey"""), bench = true),

    // FILE-LEVEL DATA SKIPPING (FileStats + scanWithFileSkipping): zone
    // maps below partition pruning. Each partition's version is written
    // RANGE-CLUSTERED on o_orderkey (4 files with disjoint key spans —
    // any time-ordered ingest gives this layout for free), ANALYZE
    // collects parquet FOOTER min/max per file (zero data bytes read),
    // and a selective range scan then drops whole files before Spark
    // plans them — require()d: at least half the files are skipped, and
    // (inputFiles) only surviving files are planned. The row-level
    // predicate is re-applied, so the oracle is the plain relational
    // filter: skipping can elide IO but never change a row.
    QuerySpec("w13_file_skipping", (s, dir) => {
      import s.implicits._
      import graft.engine.PartitionedManifest
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w13").toString
      val base = Tables.load(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_totalprice".cast("double").as("o_totalprice"),
          ($"o_custkey" % 2).cast("int").as("bk"))
      Seq(0, 1).foreach { v =>
        PartitionedManifest.publishPartition(s, root, "bk", v.toString,
          base.filter($"bk" === v)
            .repartitionByRange(4, $"o_orderkey")
            .sortWithinPartitions($"o_orderkey"))
      }
      PartitionedManifest.analyzeFileStats(s, root, "bk",
        Seq("o_orderkey"))
      val hi = math.floor(base.agg(org.apache.spark.sql.functions
        .max($"o_orderkey")).head.getLong(0) / 8.0)
      val (df, kept, total) = PartitionedManifest.scanWithFileSkipping(
        s, root, "bk", "int", "o_orderkey", 1.0, hi)
      require(total >= 8 && kept * 2 <= total,
        s"zone maps must skip at least half the files: kept $kept of $total")
      require(df.inputFiles.length == kept,
        "the plan must reference ONLY the surviving files")
      df.select($"o_orderkey", $"o_totalprice",
          $"bk".cast("long").as("bk"))
        .orderBy($"o_orderkey")
    }, oracle = Some("""
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             CAST(o_custkey % 2 AS BIGINT) AS bk
      FROM orders
      WHERE o_orderkey >= 1
        AND o_orderkey <= (SELECT FLOOR(MAX(o_orderkey) / 8.0) FROM orders)
      ORDER BY o_orderkey"""), bench = true),

    // EXACTLY-ONCE INCREMENTAL CONSUMPTION (IncrementalConsumer): the
    // downstream CDC half — a consumer driven through the commit
    // history by a crash-safe cursor (one atomic pointer file).
    // bootstrap materializes a replica from the full snapshot; each
    // consumeOnce applies exactly the (cursor → current) diff; a
    // process() that THROWS leaves the cursor unmoved and the next call
    // replays the SAME pair (require()d below — the foreachBatch
    // batchId contract at commit granularity). The oracle says the
    // replica after two incremental steps equals the table read
    // directly — one lost or double-applied diff breaks a row.
    QuerySpec("w14_incremental_consume", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, lit, when}
      import graft.engine.{IncrementalConsumer, PartitionedManifest}
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w14").toString
      val cur = Files.createTempDirectory("graft-w14-cursor").toString
      val base = Tables.load(s, dir, "supplier")
        .select($"s_suppkey".cast("long").as("s_suppkey"),
          $"s_acctbal".cast("double").as("s_acctbal"),
          ($"s_nationkey" % 3).cast("int").as("bk"))
      PartitionedManifest.seed(s, root, base, "bk")
      PartitionedManifest.commitSnapshot(s, root, "bk", Map.empty)
      // replica state as parquet (the consumer's sink)
      val replicaDir = Files.createTempDirectory("graft-w14-replica").toString
      def readReplica() = s.read.parquet(replicaDir)
      IncrementalConsumer.bootstrap(s, root, "bk", "int", cur) {
        (snap, _) => snap.write.mode("overwrite").parquet(replicaDir)
      }
      def applyDiff(diff: org.apache.spark.sql.DataFrame): Unit = {
        val old = readReplica().localCheckpoint(true)
        val dels = diff.filter($"_change_type" === "delete")
          .drop("_change_type")
        val ins = diff.filter($"_change_type" === "insert")
          .drop("_change_type")
        old.exceptAll(dels.select(old.columns.map(col): _*))
          .unionByName(ins.select(old.columns.map(col): _*))
          .write.mode("overwrite").parquet(replicaDir)
      }
      // commit 2: update half of partition 1
      val p1 = PartitionedManifest.readSnapshot(s, root, "bk", "int")
        .filter($"bk" === 1)
        .withColumn("s_acctbal", when($"s_suppkey" % 2 === 0,
          $"s_acctbal" + 10.0).otherwise($"s_acctbal"))
        .drop("bk")
      PartitionedManifest.commitSnapshot(s, root, "bk", Map("1" -> p1))
      // a process that THROWS must leave the cursor unmoved
      val before = IncrementalConsumer.cursor(s, cur)
      val threw =
        try {
          IncrementalConsumer.consumeOnce(s, root, "bk", "int", cur) {
            (_, _, _) => sys.error("sink outage")
          }
          false
        } catch { case _: RuntimeException => true }
      require(threw, "the sink outage must propagate")
      require(IncrementalConsumer.cursor(s, cur) == before,
        "a failed process() must not advance the cursor")
      val pair1 = IncrementalConsumer.consumeOnce(s, root, "bk", "int",
        cur) { (diff, _, _) => applyDiff(diff) }
      require(pair1.nonEmpty, "expected a pending diff")
      // commit 3: delete a third of partition 2
      val p2 = PartitionedManifest.readSnapshot(s, root, "bk", "int")
        .filter($"bk" === 2 && $"s_suppkey" % 3 =!= 0).drop("bk")
      PartitionedManifest.commitSnapshot(s, root, "bk", Map("2" -> p2))
      val drained = IncrementalConsumer.drain(s, root, "bk", "int", cur) {
        (diff, _, _) => applyDiff(diff)
      }
      require(drained.length == 1, s"expected one step: $drained")
      // caught up: an idle call is a no-op
      require(IncrementalConsumer.consumeOnce(s, root, "bk", "int", cur) {
        (_, _, _) => sys.error("must not run")
      }.isEmpty, "caught-up consumer must not process")
      val replica = readReplica().withColumn("src", lit("replica"))
      val table = PartitionedManifest.readSnapshot(s, root, "bk", "int")
        .withColumn("src", lit("table"))
      replica.unionByName(table)
        .select($"src", $"s_suppkey", $"s_acctbal",
          $"bk".cast("long").as("bk"))
        .orderBy($"src", $"s_suppkey")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
               CAST(s_acctbal AS DOUBLE) AS s_acctbal,
               CAST(s_nationkey % 3 AS BIGINT) AS bk
        FROM supplier),
      v3 AS (
        SELECT s_suppkey,
               CASE WHEN bk = 1 AND s_suppkey % 2 = 0
                    THEN s_acctbal + 10.0 ELSE s_acctbal END AS s_acctbal,
               bk
        FROM base
        WHERE NOT (bk = 2 AND s_suppkey % 3 = 0))
      SELECT src, s_suppkey, s_acctbal, bk
      FROM (SELECT 'replica' AS src, * FROM v3
            UNION ALL SELECT 'table' AS src, * FROM v3)
      ORDER BY src, s_suppkey"""), bench = true),

    // SCHEMA EVOLUTION (PartitionedManifest snapshot-recorded schemas):
    // the Iceberg add/drop-column contract on the manifest table format.
    // ADD needs no API — a commit whose update carries a new column
    // appends it to the recorded schema; partitions whose version dirs
    // predate the column serve it as NULL (require()d below: the
    // untouched partitions' dirs are byte-identical). DROP is an
    // explicit METADATA-ONLY commit (dropColumn — same mapping, reduced
    // schema, zero bytes moved; also require()d on dir identity). CDC
    // across the evolution boundary aligns both sides to the to-side
    // schema (Delta CDF's shape), so the from-side deletes carry NULL
    // for the added column. The result surfaces all three behaviors:
    // the 'cdc' section diffs s1→s2 through the boundary, the 'live'
    // section reads the post-drop table (tier survives, acctbal gone,
    // NULL-backfilled outside bk=1); the oracle replays both
    // relationally.
    QuerySpec("w15_schema_evolution", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, lit, when}
      import graft.engine.{ManifestTable, PartitionedManifest}
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w15").toString
      val base = Tables.load(s, dir, "customer")
        .select($"c_custkey".cast("long").as("c_custkey"),
          $"c_acctbal".cast("double").as("c_acctbal"),
          ($"c_custkey" % 4).cast("int").as("bk"))
      PartitionedManifest.seed(s, root, base, "bk")
      val s1 = PartitionedManifest.commitSnapshot(s, root, "bk", Map.empty,
        keepSnapshots = 4)
      // evolved update on bk=1 only: tier derives from the ORIGINAL
      // balance, then the balance bumps for custkey%10==1
      val old1 = PartitionedManifest.readSnapshot(s, root, "bk", "int")
        .filter($"bk" === 1).drop("bk")
      val new1 = old1
        .withColumn("tier",
          when($"c_acctbal" >= 5000.0, "gold").otherwise("std"))
        .withColumn("c_acctbal", when($"c_custkey" % 10 === 1,
          $"c_acctbal" + 100.0).otherwise($"c_acctbal"))
      val s2 = PartitionedManifest.commitSnapshot(s, root, "bk",
        Map("1" -> new1), keepSnapshots = 4)
      val untouched = (0 until 4).filter(_ != 1).map(b =>
        ManifestTable.currentDataDir(s"$root/bk=$b").get)
      // CDC through the evolution boundary: only bk=1 planned, from
      // side aligned with NULL tier
      val ch = PartitionedManifest.changesBetween(s, root, "bk", "int",
        s1, s2, changeCol = "change_type")
      require(ch.inputFiles.nonEmpty &&
        ch.inputFiles.forall(_.contains("/bk=1/")),
        "CDC must plan only the changed partition")
      // metadata-only column drop; untouched partitions' dirs identical
      PartitionedManifest.dropColumn(s, root, "bk", "c_acctbal",
        keepSnapshots = 4)
      val untouchedAfter = (0 until 4).filter(_ != 1).map(b =>
        ManifestTable.currentDataDir(s"$root/bk=$b").get)
      require(untouched == untouchedAfter,
        "evolution must not rewrite untouched partitions")
      require(PartitionedManifest.readSnapshot(s, root, "bk", "int",
        Some(s1)).columns.toSeq == Seq("c_custkey", "c_acctbal", "bk"),
        "time travel must keep the pre-evolution shape")
      val live = PartitionedManifest.read(s, root, "bk", "int")
      require(live.columns.toSeq == Seq("c_custkey", "tier", "bk"),
        s"post-drop columns: ${live.columns.mkString(",")}")
      val cdcPart = ch.select(lit("cdc").as("src"), $"c_custkey",
        $"c_acctbal", $"tier", $"bk".cast("long").as("bk"),
        $"change_type")
      val livePart = live.select(lit("live").as("src"), $"c_custkey",
        lit(null).cast("double").as("c_acctbal"), $"tier",
        $"bk".cast("long").as("bk"), lit("").as("change_type"))
      cdcPart.unionByName(livePart)
        .orderBy($"src", $"change_type", $"c_custkey", $"c_acctbal")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal,
               CAST(c_custkey % 4 AS BIGINT) AS bk
        FROM customer),
      old1 AS (SELECT * FROM base WHERE bk = 1),
      new1 AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 1 THEN c_acctbal + 100.0
                    ELSE c_acctbal END AS c_acctbal,
               CASE WHEN c_acctbal >= 5000.0 THEN 'gold'
                    ELSE 'std' END AS tier,
               bk
        FROM old1),
      o1a AS (SELECT c_custkey, c_acctbal, CAST(NULL AS VARCHAR) AS tier,
                     bk FROM old1),
      ins AS (SELECT *, 'insert' AS change_type FROM
               (SELECT * FROM new1 EXCEPT ALL SELECT * FROM o1a)),
      del AS (SELECT *, 'delete' AS change_type FROM
               (SELECT * FROM o1a EXCEPT ALL SELECT * FROM new1)),
      live AS (
        SELECT c_custkey, CAST(NULL AS DOUBLE) AS c_acctbal,
               CASE WHEN bk = 1 THEN
                 (CASE WHEN c_acctbal >= 5000.0 THEN 'gold' ELSE 'std' END)
               END AS tier,
               bk, '' AS change_type
        FROM base)
      SELECT src, c_custkey, c_acctbal, tier, bk, change_type
      FROM (SELECT 'cdc' AS src, * FROM (SELECT * FROM ins
              UNION ALL SELECT * FROM del)
            UNION ALL SELECT 'live' AS src, * FROM live)
      ORDER BY src, change_type, c_custkey, c_acctbal"""), bench = true),

    // BRANCHES + WRITE-AUDIT-PUBLISH (PartitionedManifest branches /
    // commitSnapshotToBranch / fastForward): the Iceberg WAP contract.
    // Ingest lands on branch 'audit' — its version dirs are STAGED
    // (partition pointers never move), so main readers cannot see the
    // batch while it carries bad rows (require()d: the pre-publish live
    // read has zero negatives while the branch head shows them all).
    // The quality gate runs against the branch head like any snapshot;
    // the batch is FIXED on the branch; only the passing head
    // fast-forwards into main — one metadata operation, no data
    // movement. The result surfaces main before ('prepub', captured via
    // an immutable pin that later publishes cannot disturb) and after
    // ('published'); the oracle replays both relationally.
    QuerySpec("w16_branch_wap", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{lit, when}
      import graft.engine.PartitionedManifest
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w16").toString
      val base = Tables.load(s, dir, "part")
        .select($"p_partkey".cast("long").as("p_partkey"),
          $"p_retailprice".cast("double").as("p_retailprice"),
          ($"p_partkey" % 3).cast("int").as("bk"))
      PartitionedManifest.seed(s, root, base, "bk")
      PartitionedManifest.commitSnapshot(s, root, "bk", Map.empty,
        keepSnapshots = 4)
      PartitionedManifest.createBranch(s, root, "audit")
      val old1 = PartitionedManifest.readSnapshot(s, root, "bk", "int")
        .filter($"bk" === 1).drop("bk")
      // the ingest batch: a price bump plus BAD rows (negative prices)
      val good = old1.withColumn("p_retailprice",
        when($"p_partkey" % 10 === 1, $"p_retailprice" + 2.5)
          .otherwise($"p_retailprice"))
      val bad = good.unionByName(
        old1.filter($"p_partkey" % 50 === 4)
          .select(($"p_partkey" + 9000000L).as("p_partkey"),
            lit(-1.0).as("p_retailprice")))
      PartitionedManifest.commitSnapshotToBranch(s, root, "bk",
        Map("1" -> bad), "audit", keepSnapshots = 4)
      // main is untouched (immutable pin — later publishes cannot
      // disturb it); the branch head carries the violations
      val prePub = PartitionedManifest.read(s, root, "bk", "int")
      require(prePub.filter($"p_retailprice" < 0).count() == 0,
        "bad rows leaked into main before the audit")
      val branchHead = PartitionedManifest.resolveRef(s, root,
        Some("audit"))
      val nBad = PartitionedManifest.readSnapshot(s, root, "bk", "int",
        branchHead).filter($"p_retailprice" < 0).count()
      require(nBad > 0, "the audit gate must SEE the staged violations")
      // fix ON the branch, re-audit, publish
      PartitionedManifest.commitSnapshotToBranch(s, root, "bk",
        Map("1" -> good), "audit", keepSnapshots = 4)
      val fixedHead = PartitionedManifest.resolveRef(s, root, Some("audit"))
      require(PartitionedManifest.readSnapshot(s, root, "bk", "int",
        fixedHead).filter($"p_retailprice" < 0).count() == 0,
        "fix must clear the gate")
      val pub = PartitionedManifest.fastForward(s, root, "bk", "audit")
      require(PartitionedManifest.currentSnapshot(s, root).contains(pub),
        "publish must advance main to the branch head")
      val published = PartitionedManifest.read(s, root, "bk", "int")
      prePub.select(lit("prepub").as("src"), $"p_partkey",
          $"p_retailprice", $"bk".cast("long").as("bk"))
        .unionByName(published.select(lit("published").as("src"),
          $"p_partkey", $"p_retailprice", $"bk".cast("long").as("bk")))
        .orderBy($"src", $"p_partkey")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
               CAST(p_retailprice AS DOUBLE) AS p_retailprice,
               CAST(p_partkey % 3 AS BIGINT) AS bk
        FROM part),
      pub AS (
        SELECT p_partkey,
               CASE WHEN bk = 1 AND p_partkey % 10 = 1
                    THEN p_retailprice + 2.5
                    ELSE p_retailprice END AS p_retailprice,
               bk
        FROM base)
      SELECT src, p_partkey, p_retailprice, bk
      FROM (SELECT 'prepub' AS src, * FROM base
            UNION ALL SELECT 'published' AS src, * FROM pub)
      ORDER BY src, p_partkey"""), bench = true),

    // STREAMING CDC SOURCE (graft.streaming.CdcSource): the table's
    // commit history as a NATIVE Structured Streaming source —
    // readStream.format("graft-cdc") yields each snapshot commit's
    // row-level diff as a micro-batch (the Delta CDF stream shape),
    // offsets are snapshot generations (checkpoint-recoverable — the
    // restart contract is pinned in StreamingSpec), and each batch's
    // plan is metadata-first (only moved partitions are read). The
    // query drives one bootstrap batch + one incremental batch through
    // foreachBatch into a result table; the oracle replays both
    // relationally. batchId labels the phases deterministically
    // (processAllAvailable between the commits).
    QuerySpec("w17_cdc_stream", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, lit, when}
      import graft.engine.PartitionedManifest
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w17").toString
      val ckpt = Files.createTempDirectory("graft-w17-ck").toString
      val outDir = Files.createTempDirectory("graft-w17-out").toString
      val base = Tables.load(s, dir, "supplier")
        .select($"s_suppkey".cast("long").as("s_suppkey"),
          $"s_acctbal".cast("double").as("s_acctbal"),
          ($"s_nationkey" % 3).cast("int").as("bk"))
      PartitionedManifest.seed(s, root, base, "bk")
      PartitionedManifest.commitSnapshot(s, root, "bk", Map.empty,
        keepSnapshots = 4)
      val q = s.readStream.format("graft-cdc")
        .option("root", root).option("partCol", "bk")
        .option("partType", "int").load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("batch", lit(id))
            .write.mode("append").parquet(outDir)
          ()
        }.start()
      try {
        q.processAllAvailable() // batch 0: bootstrap, all inserts
        val old1 = PartitionedManifest.readSnapshot(s, root, "bk", "int")
          .filter($"bk" === 1).drop("bk")
        val new1 = old1.filter($"s_suppkey" % 10 =!= 7)
          .withColumn("s_acctbal", when($"s_suppkey" % 4 === 1,
            $"s_acctbal" + 25.0).otherwise($"s_acctbal"))
        PartitionedManifest.commitSnapshot(s, root, "bk",
          Map("1" -> new1), keepSnapshots = 4)
        q.processAllAvailable() // batch 1: the commit's diff
      } finally q.stop()
      s.read.parquet(outDir)
        .select($"batch".cast("long").as("batch"), $"s_suppkey",
          $"s_acctbal", $"bk".cast("long").as("bk"),
          col("_change_type").as("change_type"))
        .orderBy($"batch", $"change_type", $"s_suppkey", $"s_acctbal")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
               CAST(s_acctbal AS DOUBLE) AS s_acctbal,
               CAST(s_nationkey % 3 AS BIGINT) AS bk
        FROM supplier),
      old1 AS (SELECT * FROM base WHERE bk = 1),
      new1 AS (
        SELECT s_suppkey,
               CASE WHEN s_suppkey % 4 = 1 THEN s_acctbal + 25.0
                    ELSE s_acctbal END AS s_acctbal, bk
        FROM old1 WHERE s_suppkey % 10 <> 7),
      boot AS (SELECT CAST(0 AS BIGINT) AS batch, *,
                      'insert' AS change_type FROM base),
      ins AS (SELECT CAST(1 AS BIGINT) AS batch, *,
                     'insert' AS change_type FROM
               (SELECT * FROM new1 EXCEPT ALL SELECT * FROM old1)),
      del AS (SELECT CAST(1 AS BIGINT) AS batch, *,
                     'delete' AS change_type FROM
               (SELECT * FROM old1 EXCEPT ALL SELECT * FROM new1))
      SELECT batch, s_suppkey, s_acctbal, bk, change_type
      FROM (SELECT * FROM boot UNION ALL SELECT * FROM ins
            UNION ALL SELECT * FROM del)
      ORDER BY batch, change_type, s_suppkey, s_acctbal"""),
      bench = true),

    // STREAMING TABLE SINK (graft.streaming.TableSink): the write-side
    // complement of w17 — writeStream.format("graft-table") folds each
    // micro-batch into the manifest table as ONE atomic key-merged
    // snapshot commit (the w03 MERGE shape per batch; readers see the
    // whole batch across every touched partition or none of it).
    // EXACTLY-ONCE at commit granularity: the last batchId rides in an
    // atomic ref under the root, so a replayed batch is SKIPPED
    // (require()d below via a direct addBatch with a stale id). The
    // stream here is a file source fed two parquet drops — batch 0
    // seeds, batch 1 updates/inserts; the oracle replays the merge.
    QuerySpec("w18_table_sink", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.lit
      import graft.engine.PartitionedManifest
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w18").toString
      val ckpt = Files.createTempDirectory("graft-w18-ck").toString
      val inDir = Files.createTempDirectory("graft-w18-in").toString
      val base = Tables.load(s, dir, "supplier")
        .select($"s_suppkey".cast("long").as("k"),
          $"s_acctbal".cast("double").as("amount"),
          ($"s_nationkey" % 3).cast("int").as("bk"))
      base.write.mode("overwrite").parquet(inDir)
      val q = s.readStream.schema(base.schema).parquet(inDir)
        .writeStream.format("graft-table")
        .option("root", root).option("partCol", "bk")
        .option("keyCol", "k").option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try {
        q.processAllAvailable() // batch 0: the seed
        val b2 = base.filter($"k" % 5 === 0)
          .withColumn("amount", $"amount" + 7.5)
          .unionByName(base.filter($"k" % 100 === 1)
            .select(($"k" + 100000L).as("k"), lit(0.0).as("amount"),
              $"bk"))
        b2.write.mode("append").parquet(inDir)
        q.processAllAvailable() // batch 1: the merge delta
      } finally q.stop()
      require(PartitionedManifest.snapshots(s, root).length == 2,
        "one snapshot commit per micro-batch")
      // exactly-once: a replayed batchId must be a no-op
      val sink = new graft.streaming.TableSinkProvider().createSink(
        s.sqlContext, Map("root" -> root, "partCol" -> "bk",
          "keyCol" -> "k"), Nil,
        org.apache.spark.sql.streaming.OutputMode.Update())
      sink.addBatch(0, base.limit(1).withColumn("amount", lit(-1.0)))
      require(PartitionedManifest.snapshots(s, root).length == 2 &&
        PartitionedManifest.read(s, root, "bk", "int")
          .filter($"amount" === -1.0).count() == 0,
        "replayed batchId must not re-commit")
      PartitionedManifest.read(s, root, "bk", "int")
        .select($"k", $"amount", $"bk".cast("long").as("bk"))
        .orderBy($"k")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(s_suppkey AS BIGINT) AS k,
               CAST(s_acctbal AS DOUBLE) AS amount,
               CAST(s_nationkey % 3 AS BIGINT) AS bk
        FROM supplier),
      b2 AS (
        SELECT k, amount + 7.5 AS amount, bk FROM base WHERE k % 5 = 0
        UNION ALL
        SELECT k + 100000, 0.0, bk FROM base WHERE k % 100 = 1)
      SELECT k, amount, bk
      FROM (SELECT * FROM base WHERE k % 5 <> 0
            UNION ALL SELECT * FROM b2)
      ORDER BY k"""), bench = true),

    // CLUSTERED OPTIMIZE (compact(clusterBy=...) — the Iceberg
    // rewrite_data_files(sort_order) / Delta OPTIMIZE ZORDER contract):
    // the seed layout interleaves o_orderkey across each partition's 4
    // files (every file spans the whole key range — hash-placement
    // ingest gives exactly this), so the w13 zone maps can skip
    // NOTHING (require()d: kept == total). One clustered rewrite
    // RANGE-SPLITS each partition on o_orderkey into 4 internally
    // sorted files behind the same atomic snapshot commit; re-ANALYZE
    // costs one footer sweep of the new dirs, and the same range scan
    // then drops at least half the files (require()d, plan-checked).
    // Skipping is IO elision only — the oracle is the plain relational
    // filter, identical before and after.
    QuerySpec("w19_optimize_cluster", (s, dir) => {
      import s.implicits._
      import graft.engine.PartitionedManifest
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w19").toString
      val base = Tables.load(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_totalprice".cast("double").as("o_totalprice"),
          ($"o_custkey" % 2).cast("int").as("bk"))
      Seq(0, 1).foreach { v =>
        PartitionedManifest.publishPartition(s, root, "bk", v.toString,
          base.filter($"bk" === v).repartition(4)) // interleaved spans
      }
      PartitionedManifest.commitSnapshot(s, root, "bk", Map.empty)
      PartitionedManifest.analyzeFileStats(s, root, "bk",
        Seq("o_orderkey"))
      val hi = math.floor(base.agg(org.apache.spark.sql.functions
        .max($"o_orderkey")).head.getLong(0) / 8.0)
      val (_, kept0, total0) = PartitionedManifest.scanWithFileSkipping(
        s, root, "bk", "int", "o_orderkey", 1.0, hi)
      require(total0 >= 8 && kept0 == total0,
        s"interleaved layout must defeat zone maps: kept $kept0/$total0")
      val (_, touched) = PartitionedManifest.compact(s, root, "bk",
        clusterBy = Seq("o_orderkey"), clusterFiles = 4)
      require(touched.sorted == Seq("0", "1"),
        s"both partitions must rewrite: $touched")
      PartitionedManifest.analyzeFileStats(s, root, "bk",
        Seq("o_orderkey"))
      val (df, kept1, total1) = PartitionedManifest.scanWithFileSkipping(
        s, root, "bk", "int", "o_orderkey", 1.0, hi)
      require(total1 >= 8 && kept1 * 2 <= total1,
        s"clustered layout must skip at least half: kept $kept1/$total1")
      require(df.inputFiles.length == kept1,
        "the plan must reference ONLY the surviving files")
      df.select($"o_orderkey", $"o_totalprice",
          $"bk".cast("long").as("bk"))
        .orderBy($"o_orderkey")
    }, oracle = Some("""
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             CAST(o_custkey % 2 AS BIGINT) AS bk
      FROM orders
      WHERE o_orderkey >= 1
        AND o_orderkey <= (SELECT FLOOR(MAX(o_orderkey) / 8.0) FROM orders)
      ORDER BY o_orderkey"""), bench = true),

    // MERGE-ON-READ (PartitionedManifest.commitMerge — the Iceberg v2
    // delete-file / Delta deletion-vector posture on the manifest
    // format): three small batches (upsert / delete / layered upsert +
    // insert) land on the BIG partition as delta-only version dirs —
    // require()d: each commit's new dir is a fraction of the partition's
    // base bytes (copy-on-write would rewrite the full partition per
    // batch: write amplification = partition size / batch size, the one
    // posture that inverts at 100 TB with hot partitions). Readers
    // resolve base ∪ layers with one delta-sized anti-join; CDC across
    // the whole MOR history plans ONLY the touched partition's files;
    // time travel to the pre-merge snapshot still serves the original
    // content; compaction FOLDS the delta chain back to a pure data dir
    // (require()d) with identical content. The oracle replays the merge
    // relationally, including the exceptAll-shaped CDC sections.
    QuerySpec("w20_merge_on_read", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{concat, lit, md5, when}
      import org.apache.hadoop.fs.{Path => HPath}
      import graft.engine.{ManifestTable, PartitionedManifest}
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w20").toString
      // pad: 128 incompressible chars per row, so the base/delta byte
      // ratio measures DATA, not parquet footer overhead
      val base = Tables.load(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_totalprice".cast("double").as("o_totalprice"),
          concat(
            md5(concat($"o_orderkey".cast("string"), lit("a"))),
            md5(concat($"o_orderkey".cast("string"), lit("b"))),
            md5(concat($"o_orderkey".cast("string"), lit("c"))),
            md5(concat($"o_orderkey".cast("string"), lit("d")))).as("pad"),
          ($"o_orderkey" % 2).cast("int").as("bk"))
      PartitionedManifest.seed(s, root, base, "bk")
      val s1 = PartitionedManifest.commitSnapshot(s, root, "bk",
        Map.empty, keepSnapshots = 6)
      val fs = new HPath(root).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      def liveDir() = ManifestTable.currentDataDir(s"$root/bk=0").get
      def bytesOf(d: String) =
        fs.getContentSummary(new HPath(d)).getLength
      def requireDeltaScaled(tag: String, baseBytes: Long): Unit = {
        val d = liveDir()
        require(fs.exists(new HPath(d, "_mor.tsv")),
          s"$tag: a MOR commit must layer a delta dir, not rewrite")
        require(bytesOf(d) * 3 <= baseBytes,
          s"$tag: bytes written must scale with the DELTA - " +
            s"wrote ${bytesOf(d)} against a ${baseBytes}-byte partition")
      }
      val baseBytes = bytesOf(liveDir())
      // batch 1: upsert ~1% of the hot partition (+100 on totalprice)
      val cur0 = PartitionedManifest.readPartition(s, root, "bk", "0")
      PartitionedManifest.commitMerge(s, root, "bk", Seq("o_orderkey"),
        upserts = Map("0" -> cur0.filter($"o_orderkey" % 100 === 2)
          .withColumn("o_totalprice", $"o_totalprice" + 100.0)),
        keepSnapshots = 6)
      requireDeltaScaled("batch1", baseBytes)
      // batch 2: delete ~1% by key
      PartitionedManifest.commitMerge(s, root, "bk", Seq("o_orderkey"),
        deletes = Map("0" -> cur0.filter($"o_orderkey" % 100 === 4)
          .select($"o_orderkey")),
        keepSnapshots = 6)
      requireDeltaScaled("batch2", baseBytes)
      // batch 3: layered upsert over batch 1's keys (+1000 more) plus
      // brand-new inserted keys — built from the MOR-resolved current
      // content, so readPartition mid-chain is exercised too
      val cur0b = PartitionedManifest.readPartition(s, root, "bk", "0")
      val s4 = PartitionedManifest.commitMerge(s, root, "bk",
        Seq("o_orderkey"),
        upserts = Map("0" ->
          cur0b.filter($"o_orderkey" % 200 === 2)
            .withColumn("o_totalprice", $"o_totalprice" + 1000.0)
            .unionByName(cur0b.filter($"o_orderkey" % 500 === 2)
              .select(($"o_orderkey" + 10000000L).as("o_orderkey"),
                lit(0.0).as("o_totalprice"), $"pad"))),
        keepSnapshots = 6)
      requireDeltaScaled("batch3", baseBytes)
      // CDC across the whole MOR history: metadata-first — only the
      // touched partition's files are ever planned
      val ch = PartitionedManifest.changesBetween(s, root, "bk", "int",
        s1, s4)
      require(ch.inputFiles.nonEmpty &&
          ch.inputFiles.forall(_.contains("/bk=0/")),
        "MOR CDC must plan ONLY the touched partition's files")
      val cdc = ch.select(
        when($"_change_type" === "insert", "cdc_ins")
          .otherwise("cdc_del").as("src"),
        $"o_orderkey", $"o_totalprice", $"pad", $"bk".cast("long").as("bk"))
      // time travel: the pre-merge snapshot still serves the original
      val snap1 = PartitionedManifest.readSnapshot(s, root, "bk", "int",
          Some(s1))
        .select(lit("snap1").as("src"), $"o_orderkey", $"o_totalprice",
          $"pad", $"bk".cast("long").as("bk"))
      // compaction folds the chain down to a pure data dir
      val (_, touched) = PartitionedManifest.compact(s, root, "bk",
        keepSnapshots = 6)
      require(touched.contains("0"),
        s"compaction must select the MOR partition: $touched")
      require(!fs.exists(new HPath(liveDir(), "_mor.tsv")),
        "compaction must fold the delta chain to a pure data dir")
      val live = PartitionedManifest.read(s, root, "bk", "int")
        .select(lit("live").as("src"), $"o_orderkey", $"o_totalprice",
          $"pad", $"bk".cast("long").as("bk"))
      live.unionByName(snap1).unionByName(cdc)
        .orderBy($"src", $"o_orderkey")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               md5(CAST(o_orderkey AS VARCHAR) || 'a') ||
               md5(CAST(o_orderkey AS VARCHAR) || 'b') ||
               md5(CAST(o_orderkey AS VARCHAR) || 'c') ||
               md5(CAST(o_orderkey AS VARCHAR) || 'd') AS pad,
               CAST(o_orderkey % 2 AS BIGINT) AS bk
        FROM orders),
      merged AS (
        SELECT o_orderkey,
               CASE WHEN bk = 0 AND o_orderkey % 200 = 2
                      THEN o_totalprice + 1100.0
                    WHEN bk = 0 AND o_orderkey % 100 = 2
                      THEN o_totalprice + 100.0
                    ELSE o_totalprice END AS o_totalprice,
               pad, bk
        FROM base WHERE NOT (bk = 0 AND o_orderkey % 100 = 4)
        UNION ALL
        SELECT o_orderkey + 10000000, 0.0, pad, 0
        FROM base WHERE bk = 0 AND o_orderkey % 500 = 2),
      ins AS (SELECT * FROM merged WHERE bk = 0
              EXCEPT ALL SELECT * FROM base WHERE bk = 0),
      del AS (SELECT * FROM base WHERE bk = 0
              EXCEPT ALL SELECT * FROM merged WHERE bk = 0)
      SELECT src, o_orderkey, o_totalprice, pad, bk FROM (
        SELECT 'live' AS src, * FROM merged
        UNION ALL SELECT 'snap1' AS src, * FROM base
        UNION ALL SELECT 'cdc_ins' AS src, * FROM ins
        UNION ALL SELECT 'cdc_del' AS src, * FROM del)
      ORDER BY src, o_orderkey"""), bench = true),

    // ZONE MAPS ON THE DEFAULT READ PATH (ZoneMapRule + ZoneMapFileIndex):
    // w13 proved file skipping through the explicit scanWithFileSkipping
    // API; here a PLAIN `spark.table(t).where(range)` — no special call —
    // prunes files, because manifest-synced relations carry the
    // graft.zonemaps property and the injected optimizer rule wraps
    // their file index. require()d at the PLAN level via the scan's
    // selected file listing: before ANALYZE the same query keeps every
    // file (the unanalyzed-never-skips contract), after ANALYZE it keeps
    // at most half, on BOTH the catalog-table path and the pinned read()
    // path. The row-level predicate re-applies, so the oracle is the
    // plain relational filter.
    QuerySpec("w21_zonemap_default_path", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.FileSourceScanExec
      import graft.engine.PartitionedManifest
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w21").toString
      val base = Tables.load(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_totalprice".cast("double").as("o_totalprice"),
          ($"o_custkey" % 2).cast("int").as("bk"))
      Seq(0, 1).foreach { v =>
        PartitionedManifest.publishPartition(s, root, "bk", v.toString,
          base.filter($"bk" === v)
            .repartitionByRange(4, $"o_orderkey")
            .sortWithinPartitions($"o_orderkey"))
      }
      PartitionedManifest.commitSnapshot(s, root, "bk", Map.empty)
      PartitionedManifest.syncCatalogTable(s, root, "w21_t", "bk", "int")
      // long literal bounds: a double literal would CAST the column side
      // and the (deliberately narrow) bound extraction keeps all files
      val hi = math.floor(base.agg(org.apache.spark.sql.functions
        .max($"o_orderkey")).head.getLong(0) / 8.0).toLong
      def plannedFiles(df: org.apache.spark.sql.DataFrame): Long =
        df.queryExecution.sparkPlan.collect {
          case f: FileSourceScanExec => f.selectedPartitions
            .totalNumberOfFiles
        }.sum
      def q() = s.table("w21_t")
        .where($"o_orderkey" >= 1L && $"o_orderkey" <= hi)
      // unanalyzed: the same plan keeps EVERY file (never skip on doubt)
      val before = plannedFiles(q())
      require(before >= 8,
        s"unanalyzed table must plan all files: planned $before")
      PartitionedManifest.analyzeFileStats(s, root, "bk",
        Seq("o_orderkey"))
      val after = plannedFiles(q())
      require(after * 2 <= before,
        s"default-path zone maps must skip at least half the files: " +
          s"$after of $before planned")
      // the pinned fresh-engine read() path prunes identically
      val pinned = PartitionedManifest.read(s, root, "bk", "int")
        .where($"o_orderkey" >= 1L && $"o_orderkey" <= hi)
      val pinnedFiles = plannedFiles(pinned)
      require(pinnedFiles == after,
        s"pinned read() must prune like the catalog table: " +
          s"$pinnedFiles vs $after")
      q().select($"o_orderkey", $"o_totalprice",
          $"bk".cast("long").as("bk"))
        .orderBy($"o_orderkey")
    }, oracle = Some("""
      SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             CAST(o_custkey % 2 AS BIGINT) AS bk
      FROM orders
      WHERE o_orderkey >= 1
        AND o_orderkey <= (SELECT FLOOR(MAX(o_orderkey) / 8.0) FROM orders)
      ORDER BY o_orderkey"""), bench = true),

    // MULTI-COLUMN / HIDDEN PARTITIONING (SpecManifest): the Iceberg
    // partition-spec contract on the pointer model — the table keys on
    // (year(o_orderdate), bucket(4, o_custkey)), both DERIVED by the
    // writer; a w03-style merge commits one atomic snapshot over the
    // touched leaves; CDC lists only leaves whose version dir moved
    // (require()d: every planned file sits under /y=1996/); explicit
    // two-level pruning and HIDDEN pruning (a bare o_custkey equality
    // also prunes to its bucket directory) are require()d at the plan
    // level via inputFiles. The oracle replays the merge relationally
    // (bucket values never surface — they are layout, not data).
    QuerySpec("w22_partition_spec", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, lit, year => yearOf}
      import graft.engine.SpecManifest
      import graft.engine.SpecManifest.{Bucket, PartField, PartitionSpec, Year}
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w22").toString
      val spec = PartitionSpec(Seq(
        PartField("y", "o_orderdate", Year),
        PartField("b", "o_custkey", Bucket(4))))
      val base = Tables.load(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_custkey".cast("long").as("o_custkey"),
          $"o_totalprice".cast("double").as("o_totalprice"),
          $"o_orderdate")
      val s1 = SpecManifest.seed(s, root, base, spec)
      // the delta touches ONE year: +100 on 1996's o_orderkey%10==0,
      // plus shifted-key inserts for 1996's o_orderkey%97==0
      val delta = base
        .filter(yearOf($"o_orderdate") === 1996 && $"o_orderkey" % 10 === 0)
        .withColumn("o_totalprice", $"o_totalprice" + 100.0)
        .unionByName(base
          .filter(yearOf($"o_orderdate") === 1996 &&
            $"o_orderkey" % 97 === 0)
          .select(($"o_orderkey" + 20000000L).as("o_orderkey"),
            $"o_custkey", lit(0.0).as("o_totalprice"), $"o_orderdate"))
      val nUpd = delta.filter($"o_orderkey" < 20000000L).count()
      val nIns = delta.filter($"o_orderkey" >= 20000000L).count()
      val tagged = spec.fields.foldLeft(delta)((d, f) =>
        d.withColumn(f.name, f.derived)).localCheckpoint()
      val cur = SpecManifest.read(s, root, spec)
      val touched = tagged.select($"y", $"b").distinct().collect()
        .map(r => Seq(r.getString(0), r.getString(1)))
      require(touched.forall(_.head == "1996") && touched.nonEmpty,
        s"delta must land in y=1996 leaves only: ${touched.toSeq}")
      val updates = touched.map { vs =>
        val curLeaf = cur.filter($"y" === vs(0) && $"b" === vs(1))
          .drop("y", "b")
        val dLeaf = tagged.filter($"y" === vs(0) && $"b" === vs(1))
          .drop("y", "b")
        vs.toSeq -> curLeaf.join(dLeaf.select($"o_orderkey"),
          Seq("o_orderkey"), "left_anti").unionByName(dLeaf)
      }.toMap
      val s2 = SpecManifest.commitSnapshot(s, root, spec, updates)
      // CDC is leaf-footprint-bounded on the COMPOSITE key: only the
      // touched year's buckets are ever planned
      val ch0 = SpecManifest.changesBetween(s, root, spec, s1, s2)
      require(ch0.inputFiles.nonEmpty &&
          ch0.inputFiles.forall(_.contains("/y=1996/")),
        "spec CDC must plan ONLY the touched year's leaves")
      val ch = ch0.localCheckpoint()
      val insCount = ch.filter($"_change_type" === "insert").count()
      val delCount = ch.filter($"_change_type" === "delete").count()
      require(insCount == nUpd + nIns && delCount == nUpd,
        s"CDC row effect wrong: ins=$insCount del=$delCount " +
          s"(nUpd=$nUpd nIns=$nIns)")
      // explicit TWO-LEVEL pruning: a (year, bucket) predicate plans
      // only that leaf's files
      val oneBucket = touched.head(1)
      val both = SpecManifest.read(s, root, spec)
        .where($"y" === "1996" && $"b" === oneBucket)
      require(both.inputFiles.nonEmpty && both.inputFiles.forall(
          _.contains(s"/y=1996/b=$oneBucket/")),
        "two-level partition pruning must plan one leaf")
      // HIDDEN pruning: a bare source-column equality also prunes to
      // its derived bucket directory across all years
      val ck = base.filter($"o_custkey" % 7 === 0)
        .select($"o_custkey").head().getLong(0)
      val hidden = SpecManifest.hiddenPrune(s,
        SpecManifest.read(s, root, spec), spec, Map("o_custkey" -> ck))
      val bVal = s.range(1).select(spec.fields(1).derive(lit(ck)).as("v"))
        .head().getString(0)
      require(hidden.inputFiles.nonEmpty && hidden.inputFiles.forall(
          _.contains(s"/b=$bVal/")),
        "hidden pruning must derive the bucket filter from the source " +
          "equality")
      require(hidden.select($"o_custkey").distinct().count() == 1,
        "hidden pruning must keep the row-level predicate")
      // ... and TRANSPARENTLY: a bare .where on the source column (no
      // helper) derives the same partition filter through the injected
      // HiddenPartitionRule. The rule runs in the LAST optimizer batch,
      // so the pruning shows in the physical scan's selected files (the
      // partition filter reaches FileSourceStrategy), not in
      // optimizedPlan-derived inputFiles.
      val bare = SpecManifest.read(s, root, spec)
        .where($"o_custkey" === ck)
      val bareFiles = bare.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.toPartitionArray
            .map(_.filePath.toString).toSeq
      }.flatten
      require(bareFiles.nonEmpty && bareFiles.forall(
          _.contains(s"/b=$bVal/")),
        "the optimizer rule must derive bucket pruning from a bare " +
          "source equality: " + bareFiles.take(3).mkString(","))
      // result: the merged table (bucket values are layout, never data)
      SpecManifest.read(s, root, spec)
        .select($"o_orderkey", $"o_totalprice", $"y")
        .orderBy($"o_orderkey")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               o_orderdate
        FROM orders),
      merged AS (
        SELECT o_orderkey,
               CASE WHEN year(o_orderdate) = 1996 AND o_orderkey % 10 = 0
                    THEN o_totalprice + 100.0 ELSE o_totalprice END
                 AS o_totalprice,
               o_orderdate
        FROM base
        UNION ALL
        SELECT o_orderkey + 20000000, 0.0, o_orderdate
        FROM base
        WHERE year(o_orderdate) = 1996 AND o_orderkey % 97 = 0)
      SELECT o_orderkey, o_totalprice,
             strftime(o_orderdate, '%Y') AS y
      FROM merged
      ORDER BY o_orderkey"""), bench = true),

    // MERGE-ON-READ × PARTITION SPEC (w20 × w22): CDC-style upsert
    // streams into the HOT leaves of a (year, bucket(id)) table write
    // only their delta — per touched leaf, bytes written scale with the
    // DELTA (require()d against the leaf's base bytes), the chain
    // resolves through every reader (read / readLeaf / changesBetween /
    // time travel), CDC stays leaf-footprint-bounded on the COMPOSITE
    // key, and compactLeaves() (optimistic, lock-free rewrite) folds
    // the chains back to pure data dirs.
    QuerySpec("w23_spec_merge_on_read", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{concat, lit, md5, when, year => yearOf}
      import org.apache.hadoop.fs.{Path => HPath}
      import graft.engine.{ManifestTable, SpecManifest}
      import graft.engine.SpecManifest.{Bucket, PartField, PartitionSpec, Year}
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w23").toString
      val spec = PartitionSpec(Seq(
        PartField("y", "o_orderdate", Year),
        PartField("b", "o_custkey", Bucket(4))))
      val base = Tables.load(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_custkey".cast("long").as("o_custkey"),
          $"o_totalprice".cast("double").as("o_totalprice"),
          $"o_orderdate",
          concat(
            md5(concat($"o_orderkey".cast("string"), lit("a"))),
            md5(concat($"o_orderkey".cast("string"), lit("b"))),
            md5(concat($"o_orderkey".cast("string"), lit("c"))),
            md5(concat($"o_orderkey".cast("string"), lit("d")))).as("pad"))
      val s1 = SpecManifest.seed(s, root, base, spec)
      val fs = new HPath(root).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      def bytesOf(d: String) =
        fs.getContentSummary(new HPath(d)).getLength
      val leaves96 = SpecManifest.leafKeys(s, root, spec)
        .filter(_.head == "1996")
      require(leaves96.nonEmpty, "orders must populate y=1996 leaves")
      val baseBytes: Map[String, Long] = leaves96.map { vs =>
        val lp = s"y=${vs(0)}/b=${vs(1)}"
        lp -> bytesOf(ManifestTable.currentDataDir(s"$root/$lp").get)
      }.toMap
      def requireDeltaScaled(tag: String,
          touched: Iterable[Seq[String]]): Unit = touched.foreach { vs =>
        val lp = s"y=${vs(0)}/b=${vs(1)}"
        val d = ManifestTable.currentDataDir(s"$root/$lp").get
        require(fs.exists(new HPath(d, "_mor.tsv")),
          s"$tag/$lp: a MOR commit must layer a delta dir, not rewrite")
        // x3 with a fixed allowance: parquet FOOTERS dominate a
        // toy-scale delta file (sf0.001 leaves are ~9 KB); the
        // constant vanishes at any real scale
        require(bytesOf(d) * 3 <= baseBytes(lp) + 24576,
          s"$tag/$lp: bytes written must scale with the DELTA - wrote " +
            s"${bytesOf(d)} against a ${baseBytes(lp)}-byte leaf")
      }
      // leaf-keyed grouping of a delta frame (leaf-count-bounded)
      def perLeaf(df: org.apache.spark.sql.DataFrame)
          : Map[Seq[String], org.apache.spark.sql.DataFrame] = {
        val tagged = spec.fields.foldLeft(df)((d, f) =>
          d.withColumn(f.name, f.derived))
        tagged.select($"y", $"b").distinct().collect()
          .map(r => Seq(r.getString(0), r.getString(1)))
          .map(vs => vs -> tagged
            .filter($"y" === vs(0) && $"b" === vs(1)).drop("y", "b"))
          .toMap
      }
      // batch 1: upsert ~10% of 1996 (+100 on totalprice)
      val up1 = perLeaf(base
        .filter(yearOf($"o_orderdate") === 1996 && $"o_orderkey" % 10 === 2)
        .withColumn("o_totalprice", $"o_totalprice" + 100.0))
      SpecManifest.commitMerge(s, root, spec, Seq("o_orderkey"),
        upserts = up1, keepSnapshots = 6)
      requireDeltaScaled("batch1", up1.keys)
      // batch 2: delete 1996's o_orderkey%10==4 by key
      val del2 = perLeaf(base
        .filter(yearOf($"o_orderdate") === 1996 && $"o_orderkey" % 10 === 4))
        .map { case (vs, df) => vs -> df.select($"o_orderkey") }
      SpecManifest.commitMerge(s, root, spec, Seq("o_orderkey"),
        deletes = del2, keepSnapshots = 6)
      requireDeltaScaled("batch2", del2.keys)
      // batch 3: layered upsert (+1000 over batch 1's %20==2 subset)
      // plus shifted-key inserts, built from the MOR-RESOLVED current
      // content — readLeaf mid-chain is exercised too. ONE checkpoint
      // materializes every leaf's resolved delta (leaf-count jobs
      // would re-resolve the chains once per leaf)
      val cur96 = leaves96.map { vs =>
        SpecManifest.readLeaf(s, root, spec, vs)
          .withColumn("_ly", lit(vs(0))).withColumn("_lb", lit(vs(1)))
      }.reduce(_.unionByName(_))
        .filter($"o_orderkey" % 20 === 2 || $"o_orderkey" % 90 === 2)
        .localCheckpoint()
      // ONE job decides which leaves carry delta rows (the per-leaf
      // frame below is nonempty iff its leaf appears here) — a
      // per-leaf isEmpty probe would be a separate job per leaf
      val live96 = cur96.select($"_ly", $"_lb").distinct().collect()
        .map(r => Seq(r.getString(0), r.getString(1))).toSet
      val up3 = leaves96.flatMap { vs =>
        if (!live96.contains(vs)) None
        else {
          val cur = cur96.filter($"_ly" === vs(0) && $"_lb" === vs(1))
            .drop("_ly", "_lb")
          val u = cur.filter($"o_orderkey" % 20 === 2)
            .withColumn("o_totalprice", $"o_totalprice" + 1000.0)
            .unionByName(cur.filter($"o_orderkey" % 90 === 2)
              .select(($"o_orderkey" + 1000000000L).as("o_orderkey"),
                $"o_custkey", lit(0.0).as("o_totalprice"), $"o_orderdate",
                $"pad"))
          Some(vs -> u)
        }
      }.toMap
      val s4 = SpecManifest.commitMerge(s, root, spec, Seq("o_orderkey"),
        upserts = up3, keepSnapshots = 6)
      requireDeltaScaled("batch3", up3.keys)
      // CDC across the whole MOR history: leaf-footprint-bounded on
      // the composite key — only 1996's leaves are ever planned
      val ch = SpecManifest.changesBetween(s, root, spec, s1, s4)
      require(ch.inputFiles.nonEmpty &&
          ch.inputFiles.forall(_.contains("/y=1996/")),
        "spec MOR CDC must plan ONLY the touched year's leaves")
      val cdc = ch.select(
        when($"_change_type" === "insert", "cdc_ins")
          .otherwise("cdc_del").as("src"),
        $"o_orderkey", $"o_totalprice", $"pad", $"y")
      // time travel: the pre-merge snapshot still serves the original
      val snap1 = SpecManifest.read(s, root, spec, Some(s1))
        .select(lit("snap1").as("src"), $"o_orderkey", $"o_totalprice",
          $"pad", $"y")
      // the optimistic fold-down converges every chain to a pure dir
      val (_, folded) = SpecManifest.compactLeaves(s, root, spec,
        keepSnapshots = 6)
      val touchedAll = (up1.keys ++ del2.keys ++ up3.keys)
        .map(vs => s"y=${vs(0)}/b=${vs(1)}").toSet
      require(folded.toSet == touchedAll,
        s"compactLeaves must fold exactly the MOR leaves: $folded " +
          s"vs $touchedAll")
      SpecManifest.leafKeys(s, root, spec).foreach { vs =>
        val d = ManifestTable.currentDataDir(
          s"$root/y=${vs(0)}/b=${vs(1)}").get
        require(!fs.exists(new HPath(d, "_mor.tsv")),
          s"fold must leave pure data dirs ($d)")
      }
      val live = SpecManifest.read(s, root, spec)
        .select(lit("live").as("src"), $"o_orderkey", $"o_totalprice",
          $"pad", $"y")
      live.unionByName(snap1).unionByName(cdc)
        .orderBy($"src", $"o_orderkey")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               md5(CAST(o_orderkey AS VARCHAR) || 'a') ||
               md5(CAST(o_orderkey AS VARCHAR) || 'b') ||
               md5(CAST(o_orderkey AS VARCHAR) || 'c') ||
               md5(CAST(o_orderkey AS VARCHAR) || 'd') AS pad,
               strftime(o_orderdate, '%Y') AS y
        FROM orders),
      merged AS (
        SELECT o_orderkey,
               CASE WHEN y = '1996' AND o_orderkey % 20 = 2
                      THEN o_totalprice + 1100.0
                    WHEN y = '1996' AND o_orderkey % 10 = 2
                      THEN o_totalprice + 100.0
                    ELSE o_totalprice END AS o_totalprice,
               pad, y
        FROM base WHERE NOT (y = '1996' AND o_orderkey % 10 = 4)
        UNION ALL
        SELECT o_orderkey + 1000000000, 0.0, pad, y
        FROM base WHERE y = '1996' AND o_orderkey % 90 = 2),
      ins AS (SELECT * FROM merged WHERE y = '1996'
              EXCEPT ALL SELECT * FROM base WHERE y = '1996'),
      del AS (SELECT * FROM base WHERE y = '1996'
              EXCEPT ALL SELECT * FROM merged WHERE y = '1996')
      SELECT src, o_orderkey, o_totalprice, pad, y FROM (
        SELECT 'live' AS src, * FROM merged
        UNION ALL SELECT 'snap1' AS src, * FROM base
        UNION ALL SELECT 'cdc_ins' AS src, * FROM ins
        UNION ALL SELECT 'cdc_del' AS src, * FROM del)
      ORDER BY src, o_orderkey"""), bench = true),

    // PARTITION SPEC EVOLUTION (the Iceberg contract): bucket(4) →
    // bucket(8) as the table grows, WITHOUT rewriting a byte — old
    // leaves keep their layout (and stay merge-on-read-able under
    // their own spec), new commits land under the evolved spec, and
    // ONE read serves both generations: shared fields (y) keep their
    // stored partition columns (year filters prune BOTH pins), the
    // new bucket field is re-derived where it predates the data, and
    // a bare source-column equality prunes EACH generation through
    // its own spec via the transparent hidden-partition rule
    // (plan-asserted on the physical scans' selected files).
    QuerySpec("w24_spec_evolution", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{lit, year => yearOf}
      import org.apache.hadoop.fs.{Path => HPath}
      import graft.engine.{ManifestTable, SpecManifest}
      import graft.engine.SpecManifest.{Bucket, PartField, PartitionSpec, Year}
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w24").toString
      val spec1 = PartitionSpec(Seq(
        PartField("y", "o_orderdate", Year),
        PartField("b", "o_custkey", Bucket(4))))
      val spec2 = PartitionSpec(Seq(
        PartField("y", "o_orderdate", Year),
        PartField("b8", "o_custkey", Bucket(8))))
      val base = Tables.load(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_custkey".cast("long").as("o_custkey"),
          $"o_totalprice".cast("double").as("o_totalprice"),
          $"o_orderdate")
      val old = base.filter(yearOf($"o_orderdate") < 1996)
      // ONE new-generation year keeps the harness leaf-count bounded
      // (the generational mechanics are identical at any leaf count)
      val newer = base.filter(yearOf($"o_orderdate") === 1996)
      val s1 = SpecManifest.seed(s, root, old, spec1)
      // name discipline: re-using 'b' with a changed transform refuses
      try {
        SpecManifest.evolveSpec(s, root, PartitionSpec(Seq(
          PartField("y", "o_orderdate", Year),
          PartField("b", "o_custkey", Bucket(8)))))
        sys.error("evolveSpec must refuse a reused name")
      } catch {
        case e: IllegalArgumentException =>
          require(e.getMessage.contains("FRESH"), e.getMessage)
      }
      SpecManifest.evolveSpec(s, root, spec2)
      def perLeaf(spec: PartitionSpec,
          df: org.apache.spark.sql.DataFrame)
          : Map[Seq[String], org.apache.spark.sql.DataFrame] = {
        val tagged = spec.fields.foldLeft(df)((d, f) =>
          d.withColumn(f.name, f.derived)).localCheckpoint()
        val ns = spec.names
        tagged.select(ns.head, ns.tail: _*).distinct().collect()
          .map(r => Seq(r.getString(0), r.getString(1)))
          .map(vs => vs -> ns.zipWithIndex.foldLeft(tagged) {
            case (d, (n, i)) => d.filter(d(n) === vs(i))
          }.drop(ns: _*)).toMap
      }
      // 1996+ lands as NEW leaves under the evolved spec
      val s2 = SpecManifest.commitSnapshot(s, root, spec2,
        perLeaf(spec2, newer), keepSnapshots = 6)
      val leaves1 = SpecManifest.leafKeys(s, root, spec1)
      val leaves2 = SpecManifest.leafKeys(s, root, spec2)
      require(leaves1.nonEmpty && leaves2.nonEmpty &&
          leaves1.forall(_.head.toInt < 1996) &&
          leaves2.forall(_.head.toInt == 1996),
        s"generations must coexist: $leaves1 / $leaves2")
      // CDC across the evolution commit: only gen-2 leaves moved
      val ch = SpecManifest.changesBetween(s, root, spec2, s1, s2)
      require(ch.inputFiles.nonEmpty &&
          ch.inputFiles.forall(_.contains("/b8=")),
        "evolution CDC must plan only the new generation's leaves")
      require(ch.filter($"_change_type" === "delete").isEmpty,
        "an additive evolution commit has no deletes")
      // an OLD-generation leaf still merges, under ITS OWN spec (MOR)
      val up1 = perLeaf(spec1, old
        .filter(yearOf($"o_orderdate") === 1995 && $"o_orderkey" % 10 === 2)
        .withColumn("o_totalprice", $"o_totalprice" + 100.0))
      SpecManifest.commitMerge(s, root, spec1, Seq("o_orderkey"),
        upserts = up1, keepSnapshots = 6)
      val fs = new HPath(root).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      up1.keys.foreach { vs =>
        val d = ManifestTable.currentDataDir(
          s"$root/y=${vs(0)}/b=${vs(1)}").get
        require(fs.exists(new HPath(d, "_mor.tsv")),
          s"old-generation merge must layer, not rewrite ($d)")
      }
      // fold the old generation's chains back down
      val (_, folded) = SpecManifest.compactLeaves(s, root, spec2,
        keepSnapshots = 6)
      require(folded.toSet ==
          up1.keys.map(vs => s"y=${vs(0)}/b=${vs(1)}").toSet,
        s"fold must converge exactly the merged leaves: $folded")
      // transparent hidden pruning across BOTH generations: a bare
      // source equality prunes each pin to ITS derived bucket dir
      val ck = base.filter($"o_custkey" % 7 === 3)
        .select($"o_custkey").head().getLong(0)
      val b4 = s.range(1).select(spec1.fields(1).derive(lit(ck)).as("v"))
        .head().getString(0)
      val b8 = s.range(1).select(spec2.fields(1).derive(lit(ck)).as("v"))
        .head().getString(0)
      def scanFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.toPartitionArray
              .map(_.filePath.toString).toSeq
        }.flatten
      val allFiles = scanFiles(SpecManifest.read(s, root, spec2))
      val bareFiles = scanFiles(SpecManifest.read(s, root, spec2)
        .where($"o_custkey" === ck))
      require(bareFiles.nonEmpty && bareFiles.size < allFiles.size &&
          bareFiles.forall(p =>
            p.contains(s"/b=$b4/") || p.contains(s"/b8=$b8/")),
        s"bare equality must prune both generations " +
          s"(${bareFiles.size}/${allFiles.size}): " +
          bareFiles.take(3).mkString(","))
      // the SHARED field stays a stored partition column: a year
      // filter prunes to one year's leaves in whichever generation
      val y95 = SpecManifest.read(s, root, spec2).where($"y" === "1995")
      require(y95.inputFiles.nonEmpty &&
          y95.inputFiles.forall(_.contains("/y=1995/")),
        "year pruning must survive the evolution")
      val y96 = SpecManifest.read(s, root, spec2).where($"y" === "1996")
      require(y96.inputFiles.nonEmpty &&
          y96.inputFiles.forall(_.contains("/y=1996/")),
        "gen-2 year pruning must hold too")
      // result: one stable shape across generations (b8 is layout)
      SpecManifest.read(s, root, spec2)
        .select($"o_orderkey", $"o_totalprice", $"y")
        .orderBy($"o_orderkey")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               strftime(o_orderdate, '%Y') AS y
        FROM orders)
      SELECT o_orderkey,
             CASE WHEN y = '1995' AND o_orderkey % 10 = 2
                  THEN o_totalprice + 100.0 ELSE o_totalprice END
               AS o_totalprice,
             y
      FROM base
      WHERE y IN ('1995', '1996')
      ORDER BY o_orderkey"""), bench = true),

    // OPTIMIZE ZORDER (compact(clusterZOrder=true) — Delta's OPTIMIZE
    // ZORDER BY (a, b) / Iceberg's z-order rewrite strategy): w19's
    // lexicographic range-split serves only its LEADING column; the
    // Morton interleave gives BOTH dimensions file-level pruning. The
    // seed layout hash-interleaves 16 files (every file spans both key
    // ranges — require()d: zone maps skip NOTHING on either column);
    // one z-order rewrite makes a 1/8-range scan on EITHER column drop
    // at least half the files (require()d, plan-checked: the scan
    // references only survivors). Skipping is IO elision only — the
    // oracle is the two plain relational filters, identical before and
    // after the rewrite.
    QuerySpec("w25_optimize_zorder", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{lit, max}
      import graft.engine.PartitionedManifest
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w25").toString
      val base = Tables.load(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_custkey".cast("long").as("o_custkey"),
          $"o_totalprice".cast("double").as("o_totalprice"))
      PartitionedManifest.publishPartition(s, root, "bk", "0",
        base.repartition(16)) // interleaved spans on BOTH dims
      PartitionedManifest.commitSnapshot(s, root, "bk", Map.empty)
      val cols = Seq("o_orderkey", "o_custkey")
      PartitionedManifest.analyzeFileStats(s, root, "bk", cols)
      val kHi = math.floor(base.agg(max($"o_orderkey")).head.getLong(0)
        / 8.0)
      val cHi = math.floor(base.agg(max($"o_custkey")).head.getLong(0)
        / 8.0)
      val (_, k0, kt0) = PartitionedManifest.scanWithFileSkipping(
        s, root, "bk", "int", "o_orderkey", 1.0, kHi)
      val (_, c0, ct0) = PartitionedManifest.scanWithFileSkipping(
        s, root, "bk", "int", "o_custkey", 1.0, cHi)
      require(kt0 >= 16 && k0 == kt0 && c0 == ct0,
        s"hash layout must defeat zone maps on both dims: " +
          s"$k0/$kt0, $c0/$ct0")
      val (_, touched) = PartitionedManifest.compact(s, root, "bk",
        clusterBy = Seq("o_custkey", "o_orderkey"), clusterFiles = 16,
        clusterZOrder = true)
      require(touched == Seq("0"), s"the partition must rewrite: $touched")
      PartitionedManifest.analyzeFileStats(s, root, "bk", cols)
      val (dfK, k1, kt1) = PartitionedManifest.scanWithFileSkipping(
        s, root, "bk", "int", "o_orderkey", 1.0, kHi)
      val (dfC, c1, ct1) = PartitionedManifest.scanWithFileSkipping(
        s, root, "bk", "int", "o_custkey", 1.0, cHi)
      require(kt1 >= 16 && k1 * 2 <= kt1,
        s"z-order must prune o_orderkey range scans: kept $k1/$kt1")
      require(c1 * 2 <= ct1,
        s"z-order must prune o_custkey range scans too: kept $c1/$ct1")
      require(dfK.inputFiles.length == k1 &&
          dfC.inputFiles.length == c1,
        "the plans must reference ONLY the surviving files")
      dfK.select(lit("byk").as("src"), $"o_orderkey", $"o_custkey",
          $"o_totalprice")
        .unionByName(dfC.select(lit("byc").as("src"), $"o_orderkey",
          $"o_custkey", $"o_totalprice"))
        .orderBy($"src", $"o_orderkey", $"o_custkey")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_custkey AS BIGINT) AS o_custkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM orders)
      SELECT src, o_orderkey, o_custkey, o_totalprice FROM (
        SELECT 'byk' AS src, * FROM base
        WHERE o_orderkey >= 1 AND o_orderkey <=
          (SELECT FLOOR(MAX(o_orderkey) / 8.0) FROM base)
        UNION ALL
        SELECT 'byc' AS src, * FROM base
        WHERE o_custkey >= 1 AND o_custkey <=
          (SELECT FLOOR(MAX(o_custkey) / 8.0) FROM base))
      ORDER BY src, o_orderkey, o_custkey"""), bench = true),

    // STREAMING SINK INTO A SPEC TABLE (graft-spec-table — w18
    // generalized to composite hidden partitioning): the sink DERIVES
    // each row's (identity, bucket) leaf through the writer transforms
    // (producers never supply partition values), batch 0 bootstraps
    // the table (create-on-first-commit adopts the spec as v1) and
    // seeds every leaf, batch 1 rides merge-on-read — one atomic
    // commitMerge whose touched leaves layer delta dirs (require()d:
    // _mor.tsv present, so bytes per batch scale with the batch, not
    // the hot leaves). Exactly-once: a directly replayed batchId is a
    // no-op (require()d). The oracle replays both batches relationally.
    QuerySpec("w26_spec_table_sink", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.lit
      import org.apache.hadoop.fs.{Path => HPath}
      import graft.engine.{ManifestTable, SpecManifest}
      import graft.engine.SpecManifest.{Bucket, Identity, PartField, PartitionSpec}
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w26").toString
      val ckpt = Files.createTempDirectory("graft-w26-ck").toString
      val inDir = Files.createTempDirectory("graft-w26-in").toString
      val spec = PartitionSpec(Seq(
        PartField("g", "grp", Identity),
        PartField("b", "k", Bucket(2))))
      val base = Tables.load(s, dir, "supplier")
        .select($"s_suppkey".cast("long").as("k"),
          $"s_acctbal".cast("double").as("amount"),
          ($"s_nationkey" % 3).cast("int").as("grp"))
      base.write.mode("overwrite").parquet(inDir)
      val q = s.readStream.schema(base.schema).parquet(inDir)
        .writeStream.format("graft-spec-table")
        .option("root", root).option("spec", spec.renderCompact)
        .option("keyCol", "k").option("mergeOnRead", "true")
        .option("checkpointLocation", ckpt)
        .outputMode("update").start()
      try {
        q.processAllAvailable() // batch 0: bootstrap + seed every leaf
        // updates only: every touched leaf exists by construction, so
        // the batch provably rides the merge-on-read path at any scale
        // (inserts into fresh leaves are w18/w23 territory)
        val b2 = base.filter($"k" % 5 === 0)
          .withColumn("amount", $"amount" + 7.5)
        b2.write.mode("append").parquet(inDir)
        q.processAllAvailable() // batch 1: merge-on-read delta
      } finally q.stop()
      require(SpecManifest.snapshots(s, root).length == 2,
        "one snapshot commit per micro-batch")
      // the merge batch layered deltas — it did NOT rewrite the leaves
      val fs = new HPath(root).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      val morLeaves = SpecManifest.leafKeys(s, root, spec).filter { vs =>
        val d = ManifestTable.currentDataDir(
          s"$root/g=${vs(0)}/b=${vs(1)}").get
        fs.exists(new HPath(d, "_mor.tsv"))
      }
      require(morLeaves.nonEmpty,
        "the merge batch must land as merge-on-read layers")
      // exactly-once: a replayed batchId must be a no-op
      val sink = new graft.streaming.SpecTableSinkProvider().createSink(
        s.sqlContext, Map("root" -> root, "spec" -> spec.renderCompact,
          "keyCol" -> "k", "mergeOnRead" -> "true"), Nil,
        org.apache.spark.sql.streaming.OutputMode.Update())
      sink.addBatch(0, base.limit(1).withColumn("amount", lit(-1.0)))
      require(SpecManifest.snapshots(s, root).length == 2,
        "replayed batchId must not re-commit")
      SpecManifest.read(s, root, spec)
        .select($"k", $"amount", $"g".cast("long").as("g"))
        .orderBy($"k")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(s_suppkey AS BIGINT) AS k,
               CAST(s_acctbal AS DOUBLE) AS amount,
               CAST(s_nationkey % 3 AS BIGINT) AS g
        FROM supplier),
      b2 AS (
        SELECT k, amount + 7.5 AS amount, g FROM base WHERE k % 5 = 0)
      SELECT k, amount, g
      FROM (SELECT * FROM base WHERE k % 5 <> 0
            UNION ALL SELECT * FROM b2)
      ORDER BY k"""), bench = true),

    // RETENTION MAINTENANCE (expireSnapshots + cleanOrphans — Iceberg's
    // expire_snapshots / remove_orphan_files as first-class gates): a
    // table accumulates four commits at a wide keep horizon, then age
    // expiry trims to wall-clock retention with the TAGGED baseline
    // surviving (require()d: only the untagged mid-history snapshot
    // expires, the baseline still time-travels byte-exact), orphan
    // cleanup removes stranded scratch and an unreferenced version dir
    // behind the grace window (require()d: in-grace survives, stale
    // goes, live dirs untouched), and as-of-timestamp resolves the
    // newest commit. The oracle replays the surviving content — live
    // merged state plus the tagged baseline — relationally.
    QuerySpec("w27_retention_maintenance", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.lit
      import org.apache.hadoop.fs.{Path => HPath}
      import graft.engine.PartitionedManifest
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w27").toString
      val base = Tables.load(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("k"),
          $"o_totalprice".cast("double").as("p"),
          ($"o_orderkey" % 2).cast("int").as("bk"))
      PartitionedManifest.seed(s, root, base, "bk")
      val s1 = PartitionedManifest.commitSnapshot(s, root, "bk",
        Map.empty, keepSnapshots = 6)
      PartitionedManifest.tagSnapshot(s, root, "baseline", Some(s1))
      val c2 = PartitionedManifest.commitSnapshot(s, root, "bk",
        Map("0" -> base.filter($"bk" === 0)
          .withColumn("p", $"p" + 10.0).drop("bk")), keepSnapshots = 6)
      PartitionedManifest.commitSnapshot(s, root, "bk",
        Map("1" -> base.filter($"bk" === 1)
          .withColumn("p", $"p" + 20.0).drop("bk")), keepSnapshots = 6)
      val cur0 = PartitionedManifest.readPartition(s, root, "bk", "0")
      val c4 = PartitionedManifest.commitSnapshot(s, root, "bk",
        Map("0" -> cur0.filter($"k" % 7 =!= 0)), keepSnapshots = 6)
      // age expiry: wall-clock retention with the tag honored
      val now = System.currentTimeMillis() + 1000
      val expired = PartitionedManifest.expireSnapshots(s, root, now,
        keepLast = 2)
      require(expired == Seq(c2),
        s"only the untagged mid-history snapshot expires: $expired")
      val kept = PartitionedManifest.snapshots(s, root)
      require(kept.contains(s1) && kept.length == 3,
        s"tag + newest-2 must survive: $kept")
      require(PartitionedManifest.snapshotAsOf(s, root, now)
        .contains(c4), "asOf(now) must resolve the newest commit")
      // orphan cleanup: grace window, then a stale sweep
      val fs = new HPath(root).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      fs.mkdirs(new HPath(s"$root/.commit-dead"))
      fs.mkdirs(new HPath(s"$root/bk=0/v999999-dead"))
      require(PartitionedManifest.cleanOrphans(s, root,
          graceMs = 3600 * 1000).isEmpty,
        "in-grace entries must survive the sweep")
      val deleted = PartitionedManifest.cleanOrphans(s, root,
        graceMs = -1000)
      require(deleted.exists(_.endsWith(".commit-dead")) &&
          deleted.exists(_.endsWith("v999999-dead")),
        s"stale orphans must go: $deleted")
      // the tagged baseline still time-travels; live is the merged state
      val live = PartitionedManifest.read(s, root, "bk", "int")
        .select(lit("live").as("src"), $"k", $"p",
          $"bk".cast("long").as("bk"))
      val baseline = PartitionedManifest.readSnapshot(s, root, "bk",
          "int", PartitionedManifest.resolveRef(s, root, Some("baseline")))
        .select(lit("baseline").as("src"), $"k", $"p",
          $"bk".cast("long").as("bk"))
      live.unionByName(baseline).orderBy($"src", $"k", $"bk")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS k,
               CAST(o_totalprice AS DOUBLE) AS p,
               CAST(o_orderkey % 2 AS BIGINT) AS bk
        FROM orders),
      live AS (
        SELECT k, p + 10.0 AS p, bk FROM base
        WHERE bk = 0 AND k % 7 <> 0
        UNION ALL
        SELECT k, p + 20.0, bk FROM base WHERE bk = 1)
      SELECT src, k, p, bk FROM (
        SELECT 'live' AS src, * FROM live
        UNION ALL SELECT 'baseline' AS src, * FROM base)
      ORDER BY src, k, bk"""), bench = true),

    // SNAPSHOT/HISTORY inspection tables (Iceberg's `table.snapshots`
    // and `table.history` on the graft layouts): one row per kept
    // snapshot with its operation label, parent, and entry count —
    // and one row per ROOT pointer movement (which the snapshot files
    // alone cannot show: a fast-forward moves the pointer without
    // writing a snapshot). Zero data bytes: headers + the
    // `_history.tsv` journal only. The oracle recomputes the leaf
    // counts from the raw data and pins the full operation sequence.
    QuerySpec("w28_inspection_tables", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions.{col, lit, year => yearOf}
      import graft.engine.SpecManifest
      import graft.engine.SpecManifest.{PartField, PartitionSpec, Year}
      Tables.registerAll(s, dir)
      val root = Files.createTempDirectory("graft-w28").toString
      val spec = PartitionSpec(Seq(PartField("y", "o_orderdate", Year)))
      val base = Tables.load(s, dir, "orders")
        .select($"o_orderkey".cast("long").as("o_orderkey"),
          $"o_totalprice".cast("double").as("o_totalprice"),
          $"o_orderdate")
      SpecManifest.seed(s, root, base, spec) // commit
      // merge-on-read into 1996's leaf, then fold it down
      val up = base.filter(yearOf($"o_orderdate") === 1996 &&
        $"o_orderkey" % 100 === 0)
        .withColumn("o_totalprice", lit(0.0))
      SpecManifest.commitMerge(s, root, spec, Seq("o_orderkey"),
        upserts = Map(Seq("1996") -> up), keepSnapshots = 10) // merge
      SpecManifest.compactLeaves(s, root, spec,
        keepSnapshots = 10) // compact
      val sm = SpecManifest.snapshotsMetadata(s, root)
        .orderBy($"snapshot").collect()
      // parent chain: each kept snapshot's parent is its predecessor
      require(sm.length == 3 &&
        (1 until 3).forall(i => sm(i).getAs[String]("parent") ==
          sm(i - 1).getAs[String]("snapshot")),
        s"parent chain broken: ${sm.toSeq}")
      val hm = SpecManifest.historyMetadata(s, root).collect()
      require(hm.length == 3 && hm.last.getAs[Boolean]("isCurrent"),
        s"history must show 3 movements, newest current: ${hm.toSeq}")
      val smRows = sm.zipWithIndex.map { case (r, i) =>
        (i + 1L, "snapshot", r.getAs[String]("operation"),
          Option(r.getAs[Long]("entries")))
      }
      val hmRows = hm.zipWithIndex.map { case (r, i) =>
        (i + 4L, "history", r.getAs[String]("action"), None: Option[Long])
      }
      (smRows ++ hmRows).toSeq
        .toDF("idx", "src", "op", "entries")
        .select($"idx", $"src", $"op", $"entries".cast("long"))
        .orderBy($"idx")
    }, oracle = Some("""
      WITH n AS (SELECT CAST(COUNT(DISTINCT strftime(o_orderdate, '%Y'))
                   AS BIGINT) AS c FROM orders)
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS idx, 'snapshot' AS src,
               'commit' AS op, (SELECT c FROM n) AS entries
        UNION ALL SELECT 2, 'snapshot', 'merge', (SELECT c FROM n)
        UNION ALL SELECT 3, 'snapshot', 'compact', (SELECT c FROM n)
        UNION ALL SELECT 4, 'history', 'commit', NULL
        UNION ALL SELECT 5, 'history', 'merge', NULL
        UNION ALL SELECT 6, 'history', 'compact', NULL)
      ORDER BY idx""")),

    // THE SQL SURFACE of the table format (DataSource V2 TableCatalog
    // + analyzer rules): a spec table driven end-to-end through pure
    // spark.sql — CREATE TABLE … PARTITIONED BY (years(d),
    // bucket(4, k)), INSERT INTO … SELECT, MERGE INTO (update + insert
    // through one leaf-scoped commit), VERSION AS OF time travel — with
    // hidden-partition pruning plan-asserted ON THE SQL PATH (the read
    // substitutes onto the same pinned relation the Scala readers
    // serve). The reference's consumers are SQL sessions against named
    // tables (packets/test_int4_to_int8/02_step.sql:3-6); this closes
    // that posture for the graft format.
    QuerySpec("w29_sql_table_format", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.execution.FileSourceScanExec
      Tables.registerAll(s, dir)
      // the catalog binds its warehouse at first use and is cached by
      // the session's CatalogManager — set once, recreate the table
      // inside it on re-runs (bench runs each query twice per session)
      if (s.conf.getOption("spark.sql.catalog.gw29").isEmpty) {
        s.conf.set("spark.sql.catalog.gw29", "graft.sql.GraftCatalog")
        s.conf.set("spark.sql.catalog.gw29.warehouse",
          Files.createTempDirectory("graft-w29").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS gw29.db")
      s.sql("DROP TABLE IF EXISTS gw29.db.orders_t")
      s.sql("""CREATE TABLE gw29.db.orders_t
        (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE,
         o_orderdate DATE)
        PARTITIONED BY (years(o_orderdate), bucket(4, o_custkey))""")
      s.sql("""INSERT INTO gw29.db.orders_t
        SELECT CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT),
               CAST(o_totalprice AS DOUBLE), o_orderdate
        FROM orders""")
      val root =
        s.conf.get("spark.sql.catalog.gw29.warehouse") + "/db/orders_t"
      graft.engine.SpecManifest.tagSnapshot(s, root, "seeded")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW w29_delta AS
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_custkey AS BIGINT) AS o_custkey,
               CAST(o_totalprice + 100.0 AS DOUBLE) AS o_totalprice,
               o_orderdate
        FROM orders
        WHERE year(o_orderdate) = 1996 AND o_orderkey % 10 = 0
        UNION ALL
        SELECT CAST(o_orderkey + 20000000 AS BIGINT),
               CAST(o_custkey AS BIGINT), CAST(0.0 AS DOUBLE),
               o_orderdate
        FROM orders
        WHERE year(o_orderdate) = 1996 AND o_orderkey % 97 = 0""")
      s.sql("""MERGE INTO gw29.db.orders_t t USING w29_delta s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      // pruning ON THE SQL PATH: a bare year range plans only that
      // year's leaves; a bucket-source equality plans one bucket
      def filesOf(q: String): Seq[String] =
        s.sql(q).queryExecution.sparkPlan.collect {
          case f: FileSourceScanExec =>
            f.selectedPartitions.toPartitionArray
              .map(_.filePath.toString).toSeq
        }.flatten
      val rf = filesOf("""SELECT o_totalprice FROM gw29.db.orders_t
        WHERE o_orderdate BETWEEN DATE'1995-01-01' AND DATE'1995-12-31'""")
      require(rf.nonEmpty &&
        rf.forall(_.contains("/o_orderdate_year=1995/")),
        s"SQL year-range pruning failed: ${rf.take(3)}")
      val ck = s.sql("SELECT o_custkey FROM orders WHERE o_custkey % 7 = 0")
        .head().getLong(0)
      val bf = filesOf(
        s"SELECT o_totalprice FROM gw29.db.orders_t WHERE o_custkey = $ck")
      require(bf.nonEmpty && bf.map(_.replaceAll(".*/o_custkey_bucket=", "")
          .replaceAll("/.*", "")).distinct.size == 1,
        s"SQL bucket pruning failed: ${bf.take(3)}")
      // live + time-travelled union, fully through SQL syntax
      s.sql("""SELECT src, o_orderkey, o_totalprice, y FROM (
        SELECT 'live' AS src, o_orderkey, o_totalprice,
               CAST(year(o_orderdate) AS BIGINT) AS y
        FROM gw29.db.orders_t
        UNION ALL
        SELECT 'seeded', o_orderkey, o_totalprice,
               CAST(year(o_orderdate) AS BIGINT)
        FROM gw29.db.orders_t VERSION AS OF 'seeded')
        ORDER BY src, o_orderkey""")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS k,
               CAST(o_totalprice AS DOUBLE) AS p, o_orderdate AS d
        FROM orders),
      merged AS (
        SELECT k,
               CASE WHEN year(d) = 1996 AND k % 10 = 0
                    THEN p + 100.0 ELSE p END AS p, d
        FROM base
        UNION ALL
        SELECT k + 20000000, 0.0, d FROM base
        WHERE year(d) = 1996 AND k % 97 = 0)
      SELECT src, o_orderkey, o_totalprice, y FROM (
        SELECT 'live' AS src, k AS o_orderkey, p AS o_totalprice,
               CAST(year(d) AS BIGINT) AS y
        FROM merged
        UNION ALL
        SELECT 'seeded', k, p, CAST(year(d) AS BIGINT) FROM base)
      ORDER BY src, o_orderkey"""), bench = true),

    // SQL DML ON THE MERGE-ON-READ PATH: when the partition source IS
    // the merge key, a SQL MERGE lands as delta layers (require()d:
    // the touched leaves' live dirs carry `_mor.tsv` — bytes written
    // scale with the delta, never the leaf), a SQL DELETE keyed the
    // same way follows suit, and readers resolve the chains
    // transparently. The oracle replays the whole MERGE+DELETE
    // relationally.
    QuerySpec("w30_sql_mor_dml", (s, dir) => {
      import s.implicits._
      import org.apache.hadoop.fs.{Path => HPath}
      Tables.registerAll(s, dir)
      if (s.conf.getOption("spark.sql.catalog.gw30").isEmpty) {
        s.conf.set("spark.sql.catalog.gw30", "graft.sql.GraftCatalog")
        s.conf.set("spark.sql.catalog.gw30.warehouse",
          Files.createTempDirectory("graft-w30").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS gw30.db")
      s.sql("DROP TABLE IF EXISTS gw30.db.ord")
      s.sql("""CREATE TABLE gw30.db.ord
        (o_orderkey BIGINT, o_totalprice DOUBLE)
        PARTITIONED BY (bucket(4, o_orderkey))""")
      s.sql("""INSERT INTO gw30.db.ord
        SELECT CAST(o_orderkey AS BIGINT), CAST(o_totalprice AS DOUBLE)
        FROM orders""")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW w30_delta AS
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(0.0 AS DOUBLE) AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT CAST(o_orderkey + 30000000 AS BIGINT),
               CAST(1.0 AS DOUBLE)
        FROM orders WHERE o_orderkey % 97 = 0""")
      // the bucket source IS the merge key: this MERGE must land as
      // DELTA layers, not leaf rewrites
      s.sql("""MERGE INTO gw30.db.ord t USING w30_delta s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
      val root = s.conf.get("spark.sql.catalog.gw30.warehouse") + "/db/ord"
      val fs = new HPath(root).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      val morLeaves = (0 until 4).count { b =>
        val pr = s"$root/o_orderkey_bucket=$b"
        graft.engine.ManifestTable.currentVersion(pr)
          .exists(d => fs.exists(new HPath(s"$pr/$d/_mor.tsv")))
      }
      require(morLeaves == 4,
        s"the SQL MERGE must layer deltas on every touched leaf " +
          s"(got $morLeaves of 4 MOR-live)")
      // a same-keyed SQL DELETE cannot layer on a chain keyed by the
      // merge key with FULL-ROW delete keys — it takes the COW path;
      // correctness is the oracle's business either way
      s.sql("DELETE FROM gw30.db.ord WHERE o_totalprice = 1.0 " +
        "AND o_orderkey % 2 = 1")
      s.sql("""SELECT o_orderkey, o_totalprice FROM gw30.db.ord
        ORDER BY o_orderkey""")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS k,
               CAST(o_totalprice AS DOUBLE) AS p
        FROM orders),
      merged AS (
        SELECT k, CASE WHEN k % 10 = 0 THEN 0.0 ELSE p END AS p
        FROM base
        UNION ALL
        SELECT k + 30000000, 1.0 FROM base WHERE k % 97 = 0)
      SELECT k AS o_orderkey, p AS o_totalprice
      FROM merged
      WHERE NOT (p = 1.0 AND k % 2 = 1)
      ORDER BY o_orderkey"""), bench = true),

    // THE FULL SQL MERGE CLAUSE SURFACE on a graft table: multiple
    // conditional WHEN MATCHED clauses (DELETE + UPDATE), multiple
    // conditional WHEN NOT MATCHED inserts, and WHEN NOT MATCHED BY
    // SOURCE (DELETE + UPDATE) — first matching clause wins per row,
    // all landing in ONE leaf-scoped snapshot (merge-on-read deltas
    // here: the bucket source IS the merge key and every clause is
    // key- and leaf-preserving). The oracle replays every clause
    // relationally.
    QuerySpec("w31_sql_merge_clauses", (s, dir) => {
      Tables.registerAll(s, dir)
      if (s.conf.getOption("spark.sql.catalog.gw31").isEmpty) {
        s.conf.set("spark.sql.catalog.gw31", "graft.sql.GraftCatalog")
        s.conf.set("spark.sql.catalog.gw31.warehouse",
          Files.createTempDirectory("graft-w31").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS gw31.db")
      s.sql("DROP TABLE IF EXISTS gw31.db.cust")
      s.sql("""CREATE TABLE gw31.db.cust
        (c_custkey BIGINT, c_acctbal DOUBLE, status STRING)
        PARTITIONED BY (bucket(4, c_custkey))""")
      s.sql("""INSERT INTO gw31.db.cust
        SELECT CAST(c_custkey AS BIGINT), CAST(c_acctbal AS DOUBLE),
               'live'
        FROM customer""")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW w31_delta AS
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
               CAST(c_acctbal + 50.0 AS DOUBLE) AS nb
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT CAST(1000000 + c_custkey AS BIGINT), CAST(-5.0 AS DOUBLE)
        FROM customer WHERE c_custkey % 97 = 0""")
      s.sql("""MERGE INTO gw31.db.cust t USING w31_delta s
        ON t.c_custkey = s.c_custkey
        WHEN MATCHED AND s.nb < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET c_acctbal = s.nb, status = 'updated'
        WHEN NOT MATCHED AND s.nb < 0 THEN
          INSERT (c_custkey, c_acctbal, status)
          VALUES (s.c_custkey, -s.nb, 'seeded-neg')
        WHEN NOT MATCHED THEN
          INSERT (c_custkey, c_acctbal, status)
          VALUES (s.c_custkey, s.nb, 'new')
        WHEN NOT MATCHED BY SOURCE AND t.c_acctbal < 0 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'stale'""")
      // the merge key IS the bucket source and every clause preserves
      // keys and leaves: the whole multi-clause MERGE must have landed
      // as merge-on-read deltas, bytes scaling with the delta
      val root =
        s.conf.get("spark.sql.catalog.gw31.warehouse") + "/db/cust"
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      val morLeaves = (0 until 4).count { b =>
        val pr = s"$root/c_custkey_bucket=$b"
        graft.engine.ManifestTable.currentVersion(pr).exists(d =>
          fs.exists(new org.apache.hadoop.fs.Path(s"$pr/$d/_mor.tsv")))
      }
      require(morLeaves == 4,
        s"the multi-clause MERGE must layer deltas on every leaf " +
          s"(got $morLeaves of 4 MOR-live)")
      s.sql("""SELECT c_custkey, c_acctbal, status FROM gw31.db.cust
        ORDER BY c_custkey""")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(c_custkey AS BIGINT) AS k,
               CAST(c_acctbal AS DOUBLE) AS b
        FROM customer),
      src AS (
        SELECT k, b + 50.0 AS nb FROM base WHERE k % 7 = 0
        UNION ALL
        SELECT 1000000 + k, -5.0 FROM base WHERE k % 97 = 0),
      result AS (
        SELECT t.k, s.nb AS b, 'updated' AS status
        FROM base t JOIN src s ON t.k = s.k
        WHERE s.nb >= 0
        UNION ALL
        SELECT t.k, t.b, 'stale'
        FROM base t
        WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.k = t.k)
          AND t.b >= 0
        UNION ALL
        SELECT s.k, CASE WHEN s.nb < 0 THEN -s.nb ELSE s.nb END,
               CASE WHEN s.nb < 0 THEN 'seeded-neg' ELSE 'new' END
        FROM src s
        WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.k = s.k))
      SELECT k AS c_custkey, b AS c_acctbal, status
      FROM result ORDER BY c_custkey"""), bench = true),

    // SQL ALTER TABLE on the graft catalog — the reference's FLAGSHIP
    // migration shape (packets/test_int4_to_int8/01_step.sql:9 adds a
    // bigint column, 06_step.sql swaps the key) driven end-to-end
    // through spark.sql: ADD COLUMN + widen INT→BIGINT are
    // METADATA-ONLY (require()d: leaf version dirs byte-identical
    // across both ALTERs), reads serve NULL-filled/widened rows
    // natively, a SQL UPDATE backfills copy-on-write, and VERSION AS
    // OF keeps serving the pre-alter schema (require()d: old column
    // set, old type). The oracle replays both epochs relationally.
    QuerySpec("w32_sql_alter_schema", (s, dir) => {
      Tables.registerAll(s, dir)
      if (s.conf.getOption("spark.sql.catalog.gw32").isEmpty) {
        s.conf.set("spark.sql.catalog.gw32", "graft.sql.GraftCatalog")
        s.conf.set("spark.sql.catalog.gw32.warehouse",
          Files.createTempDirectory("graft-w32").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS gw32.db")
      s.sql("DROP TABLE IF EXISTS gw32.db.acct")
      s.sql("""CREATE TABLE gw32.db.acct
        (c_custkey BIGINT, c_nationkey INT, c_acctbal DOUBLE)
        PARTITIONED BY (bucket(4, c_custkey))""")
      s.sql("""INSERT INTO gw32.db.acct
        SELECT CAST(c_custkey AS BIGINT), CAST(c_nationkey AS INT),
               CAST(c_acctbal AS DOUBLE)
        FROM customer""")
      val root =
        s.conf.get("spark.sql.catalog.gw32.warehouse") + "/db/acct"
      graft.engine.SpecManifest.tagSnapshot(s, root, "v1")
      def leafDirs(): Seq[String] = (0 until 4).flatMap(b =>
        graft.engine.ManifestTable.currentVersion(
          s"$root/c_custkey_bucket=$b"))
      val before = leafDirs()
      s.sql("ALTER TABLE gw32.db.acct ADD COLUMN balcat STRING")
      s.sql("ALTER TABLE gw32.db.acct ALTER COLUMN c_nationkey " +
        "TYPE BIGINT")
      require(leafDirs() == before,
        "ALTER TABLE must be metadata-only - no leaf may move")
      // widened read BEFORE any rewrite: int32 files serve as BIGINT
      require(s.sql("SELECT sum(c_nationkey) FROM gw32.db.acct")
        .head().get(0) != null, "widened read failed")
      // SQL backfill of the added column (copy-on-write)
      s.sql("""UPDATE gw32.db.acct SET balcat =
        CASE WHEN c_acctbal >= 5000.0 THEN 'high' ELSE 'low' END""")
      // time travel: the pre-alter epoch keeps its own schema
      val tt = s.sql("SELECT * FROM gw32.db.acct VERSION AS OF 'v1'")
      require(tt.columns.toSeq ==
        Seq("c_custkey", "c_nationkey", "c_acctbal") &&
        tt.schema("c_nationkey").dataType ==
          org.apache.spark.sql.types.IntegerType,
        s"time travel must keep the pre-alter schema: " +
          s"${tt.schema.simpleString}")
      s.sql("""SELECT src, c_custkey, c_nationkey, c_acctbal, balcat
        FROM (
          SELECT 'live' AS src, c_custkey, c_nationkey, c_acctbal, balcat
          FROM gw32.db.acct
          UNION ALL
          SELECT 'v1', c_custkey, CAST(c_nationkey AS BIGINT), c_acctbal,
                 CAST(NULL AS STRING)
          FROM gw32.db.acct VERSION AS OF 'v1')
        ORDER BY src, c_custkey""")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(c_custkey AS BIGINT) AS k,
               CAST(c_nationkey AS BIGINT) AS n,
               CAST(c_acctbal AS DOUBLE) AS b
        FROM customer)
      SELECT src, k AS c_custkey, n AS c_nationkey, b AS c_acctbal,
             balcat
      FROM (
        SELECT 'live' AS src, k, n, b,
               CASE WHEN b >= 5000.0 THEN 'high' ELSE 'low' END AS balcat
        FROM base
        UNION ALL
        SELECT 'v1', k, n, b, CAST(NULL AS VARCHAR) FROM base)
      ORDER BY src, c_custkey"""), bench = true),

    // SQL-ADDRESSABLE MAINTENANCE (CALL procedures on the graft
    // catalog — Iceberg's `CALL catalog.system.…` posture via Spark 4's
    // native ProcedureCatalog): a pure-SQL session tags, MERGEs (MOR),
    // folds the delta chains (CALL compact — require()d: all 4 touched
    // leaves fold), tags the folded state, and rolls back to the seed
    // (CALL rollback) — then serves BOTH epochs through time travel.
    // The history inspection table is require()d to record the
    // merge → compact → rollback sequence. The oracle replays both
    // epochs relationally.
    QuerySpec("w33_sql_maintenance", (s, dir) => {
      Tables.registerAll(s, dir)
      if (s.conf.getOption("spark.sql.catalog.gw33").isEmpty) {
        s.conf.set("spark.sql.catalog.gw33", "graft.sql.GraftCatalog")
        s.conf.set("spark.sql.catalog.gw33.warehouse",
          Files.createTempDirectory("graft-w33").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS gw33.db")
      s.sql("DROP TABLE IF EXISTS gw33.db.ord")
      s.sql("""CREATE TABLE gw33.db.ord
        (o_orderkey BIGINT, o_totalprice DOUBLE)
        PARTITIONED BY (bucket(4, o_orderkey))""")
      s.sql("""INSERT INTO gw33.db.ord
        SELECT CAST(o_orderkey AS BIGINT), CAST(o_totalprice AS DOUBLE)
        FROM orders""")
      s.sql("CALL gw33.system.tag('db.ord', 'seed')")
      // keyed MERGE lands as MOR deltas on every leaf
      s.sql("""MERGE INTO gw33.db.ord t
        USING (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
                      CAST(0.0 AS DOUBLE) AS o_totalprice
               FROM orders WHERE o_orderkey % 10 = 0) src
        ON t.o_orderkey = src.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = src.o_totalprice""")
      val folded = s.sql("CALL gw33.system.compact('db.ord')")
        .collect().map(_.getString(0)).toSeq
      require(folded.count(_.startsWith("folded ")) == 4,
        s"CALL compact must fold all 4 MOR leaves: $folded")
      s.sql("CALL gw33.system.tag('db.ord', 'merged')")
      s.sql("CALL gw33.system.rollback('db.ord', 'seed')")
      val ops = s.sql("SELECT action FROM gw33.db.ord.history " +
        "ORDER BY madeCurrentMs").collect().map(_.getString(0)).toSeq
      require(ops.containsSlice(Seq("merge", "compact", "rollback")),
        s"history must record the SQL maintenance sequence: $ops")
      s.sql("""SELECT src, o_orderkey, o_totalprice FROM (
        SELECT 'rolled' AS src, o_orderkey, o_totalprice
        FROM gw33.db.ord
        UNION ALL
        SELECT 'merged', o_orderkey, o_totalprice
        FROM gw33.db.ord VERSION AS OF 'merged')
        ORDER BY src, o_orderkey""")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS k,
               CAST(o_totalprice AS DOUBLE) AS p
        FROM orders)
      SELECT src, k AS o_orderkey, p AS o_totalprice FROM (
        SELECT 'merged' AS src, k,
               CASE WHEN k % 10 = 0 THEN 0.0 ELSE p END AS p
        FROM base
        UNION ALL
        SELECT 'rolled', k, p FROM base)
      ORDER BY src, o_orderkey"""), bench = true),

    // NULL MERGE-KEY SEMANTICS (SQL:2016 / Delta): a target row whose
    // merge-key column is NULL never equi-joins the source, so it IS
    // "not matched by source" — and must be affected by the first
    // matching BY-SOURCE clause EXACTLY ONCE (the r17 judge-found bug
    // kept it on DELETE and duplicated it on UPDATE: key-equality
    // removal never anti-joins a NULL). The engine routes NULL-keyed
    // removals through the copy-on-write exceptAll path; the oracle
    // replays the clauses relationally, where NOT EXISTS naturally
    // covers the NULL keys.
    QuerySpec("w34_sql_merge_null_keys", (s, dir) => {
      Tables.registerAll(s, dir)
      if (s.conf.getOption("spark.sql.catalog.gw34").isEmpty) {
        s.conf.set("spark.sql.catalog.gw34", "graft.sql.GraftCatalog")
        s.conf.set("spark.sql.catalog.gw34.warehouse",
          Files.createTempDirectory("graft-w34").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS gw34.db")
      s.sql("DROP TABLE IF EXISTS gw34.db.cust")
      s.sql("""CREATE TABLE gw34.db.cust
        (c_custkey BIGINT, c_acctbal DOUBLE, status STRING)
        PARTITIONED BY (bucket(4, c_custkey))""")
      // every 13th key is planted NULL — the shape the bug hit
      s.sql("""INSERT INTO gw34.db.cust
        SELECT CASE WHEN c_custkey % 13 = 0 THEN NULL
                    ELSE CAST(c_custkey AS BIGINT) END,
               CAST(c_acctbal AS DOUBLE), 'live'
        FROM customer""")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW w34_delta AS
        SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
               CAST(c_acctbal + 50.0 AS DOUBLE) AS nb
        FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 13 <> 0
        UNION ALL
        SELECT CAST(2000000 + c_custkey AS BIGINT), CAST(7.0 AS DOUBLE)
        FROM customer WHERE c_custkey % 97 = 0""")
      s.sql("""MERGE INTO gw34.db.cust t USING w34_delta s
        ON t.c_custkey = s.c_custkey
        WHEN MATCHED THEN UPDATE SET c_acctbal = s.nb, status = 'updated'
        WHEN NOT MATCHED THEN
          INSERT (c_custkey, c_acctbal, status)
          VALUES (s.c_custkey, s.nb, 'new')
        WHEN NOT MATCHED BY SOURCE AND t.c_acctbal < 1000.0 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET status = 'stale'""")
      s.sql("""SELECT c_custkey, c_acctbal, status FROM gw34.db.cust
        ORDER BY c_custkey, c_acctbal, status""")
    }, oracle = Some("""
      WITH base AS (
        SELECT CASE WHEN c_custkey % 13 = 0 THEN NULL
               ELSE CAST(c_custkey AS BIGINT) END AS k,
               CAST(c_acctbal AS DOUBLE) AS b
        FROM customer),
      src AS (
        SELECT CAST(c_custkey AS BIGINT) AS k,
               CAST(c_acctbal + 50.0 AS DOUBLE) AS nb
        FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 13 <> 0
        UNION ALL
        SELECT CAST(2000000 + c_custkey AS BIGINT), CAST(7.0 AS DOUBLE)
        FROM customer WHERE c_custkey % 97 = 0),
      result AS (
        SELECT t.k, s.nb AS b, 'updated' AS status
        FROM base t JOIN src s ON t.k = s.k
        UNION ALL
        SELECT t.k, t.b, 'stale'
        FROM base t
        WHERE NOT EXISTS (SELECT 1 FROM src WHERE src.k = t.k)
          AND NOT (t.b < 1000.0)
        UNION ALL
        SELECT s.k, s.nb, 'new'
        FROM src s
        WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.k = s.k))
      SELECT k AS c_custkey, b AS c_acctbal, status
      FROM result ORDER BY c_custkey, c_acctbal, status"""),
      bench = true),

    // CLUSTERED / Z-ORDER OPTIMIZE ON SPEC TABLES, SQL-ADDRESSABLE:
    // `CALL g.system.rewrite_layout(t, mode, cols, files, target_mb)`
    // rewrites every leaf of the composite-partitioned (100 TB-shape)
    // table into Morton-interleaved sorted files, folding MOR chains
    // as it goes, so zone maps prune range scans on EITHER dimension
    // (require()d: kept files <= half of total on both dims; repeated
    // identical CALL rewrites nothing). The oracle replays the content
    // relationally — layout must never change results.
    QuerySpec("w35_optimize_spec_layout", (s, dir) => {
      import org.apache.spark.sql.execution.FileSourceScanExec
      Tables.registerAll(s, dir)
      if (s.conf.getOption("spark.sql.catalog.gw35").isEmpty) {
        s.conf.set("spark.sql.catalog.gw35", "graft.sql.GraftCatalog")
        s.conf.set("spark.sql.catalog.gw35.warehouse",
          Files.createTempDirectory("graft-w35").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS gw35.db")
      s.sql("DROP TABLE IF EXISTS gw35.db.ord")
      s.sql("""CREATE TABLE gw35.db.ord
        (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE)
        PARTITIONED BY (bucket(2, o_orderkey))""")
      s.sql("""INSERT INTO gw35.db.ord
        SELECT CAST(o_orderkey AS BIGINT), CAST(o_custkey AS BIGINT),
               CAST(o_totalprice AS DOUBLE)
        FROM orders""")
      // a keyed MERGE layers MOR deltas — the layout rewrite folds them
      s.sql("""MERGE INTO gw35.db.ord t
        USING (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
                      CAST(0.0 AS DOUBLE) AS p
               FROM orders WHERE o_orderkey % 10 = 0) src
        ON t.o_orderkey = src.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = src.p""")
      def call(q: String): Seq[String] =
        s.sql(q).collect().map(_.getString(0)).toSeq
          .filterNot(_.startsWith("snapshot "))
      // 16 files per leaf: each z-run then fixes the TOP TWO bits of
      // both dims (8 would fix only one — a 1/8-range scan would touch
      // exactly half the files, a boundary assert)
      val z = call("CALL gw35.system.rewrite_layout('db.ord', " +
        "'zorder', 'o_custkey,o_orderkey', 16, 0, '')")
      require(z.count(_.startsWith("rewrote ")) == 2,
        s"both leaves must rewrite: $z")
      call("CALL gw35.system.analyze('db.ord', 'o_orderkey,o_custkey')")
      def plannedFiles(df: org.apache.spark.sql.DataFrame): Long =
        df.queryExecution.sparkPlan.collect {
          case f: FileSourceScanExec =>
            f.selectedPartitions.totalNumberOfFiles
        }.sum
      val mx = s.sql("SELECT max(o_orderkey), max(o_custkey) " +
        "FROM gw35.db.ord").head()
      val kHi = mx.getLong(0) / 8L
      val cHi = mx.getLong(1) / 8L
      val total = plannedFiles(s.sql("SELECT * FROM gw35.db.ord"))
      require(total >= 32, s"16 files x 2 leaves expected: $total")
      val byK = s.sql("SELECT * FROM gw35.db.ord " +
        s"WHERE o_orderkey >= 1 AND o_orderkey <= $kHi")
      val byC = s.sql("SELECT * FROM gw35.db.ord " +
        s"WHERE o_custkey >= 1 AND o_custkey <= $cHi")
      val (keptK, keptC) = (plannedFiles(byK), plannedFiles(byC))
      require(keptK * 2 <= total,
        s"z-order must prune o_orderkey ranges: kept $keptK of $total")
      require(keptC * 2 <= total,
        s"z-order must prune o_custkey ranges: kept $keptC of $total")
      // convergent: the identical CALL selects nothing
      val again = call("CALL gw35.system.rewrite_layout('db.ord', " +
        "'zorder', 'o_custkey,o_orderkey', 16, 0, '')")
      require(again == Seq("no leaves need this layout"),
        s"repeated identical rewrite must be a no-op: $again")
      s.sql(s"""SELECT src, o_orderkey, o_custkey, o_totalprice FROM (
        SELECT 'byk' AS src, o_orderkey, o_custkey, o_totalprice
        FROM gw35.db.ord WHERE o_orderkey >= 1 AND o_orderkey <= $kHi
        UNION ALL
        SELECT 'byc', o_orderkey, o_custkey, o_totalprice
        FROM gw35.db.ord WHERE o_custkey >= 1 AND o_custkey <= $cHi)
        ORDER BY src, o_orderkey, o_custkey""")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(o_custkey AS BIGINT) AS o_custkey,
               CASE WHEN o_orderkey % 10 = 0 THEN 0.0
                    ELSE CAST(o_totalprice AS DOUBLE) END AS o_totalprice
        FROM orders)
      SELECT src, o_orderkey, o_custkey, o_totalprice FROM (
        SELECT 'byk' AS src, * FROM base
        WHERE o_orderkey >= 1 AND o_orderkey <=
          CAST(FLOOR((SELECT MAX(o_orderkey) FROM base) / 8) AS BIGINT)
        UNION ALL
        SELECT 'byc', * FROM base
        WHERE o_custkey >= 1 AND o_custkey <=
          CAST(FLOOR((SELECT MAX(o_custkey) FROM base) / 8) AS BIGINT))
      ORDER BY src, o_orderkey, o_custkey"""), bench = true),

    // CORRELATED SUBQUERIES IN DML CONDITIONS: `DELETE … WHERE EXISTS
    // (SELECT … WHERE corr = t.col)` is the reference's own
    // tracker-wipe idiom (actiontracker.py:272-291). The engine plans
    // the condition as a Catalyst Filter over the fresh read —
    // RewritePredicateSubquery decorrelates it into semi/anti joins —
    // and the per-leaf rewrite subtracts the affected rows as an
    // exact multiset. The oracle replays both statements relationally.
    QuerySpec("w36_sql_dml_correlated", (s, dir) => {
      Tables.registerAll(s, dir)
      if (s.conf.getOption("spark.sql.catalog.gw36").isEmpty) {
        s.conf.set("spark.sql.catalog.gw36", "graft.sql.GraftCatalog")
        s.conf.set("spark.sql.catalog.gw36.warehouse",
          Files.createTempDirectory("graft-w36").toString)
      }
      s.sql("CREATE NAMESPACE IF NOT EXISTS gw36.db")
      s.sql("DROP TABLE IF EXISTS gw36.db.cust")
      s.sql("DROP TABLE IF EXISTS gw36.db.banned")
      s.sql("""CREATE TABLE gw36.db.cust
        (c_custkey BIGINT, c_acctbal DOUBLE, c_mktsegment STRING)
        PARTITIONED BY (bucket(4, c_custkey))""")
      s.sql("""INSERT INTO gw36.db.cust
        SELECT CAST(c_custkey AS BIGINT), CAST(c_acctbal AS DOUBLE),
               c_mktsegment
        FROM customer""")
      s.sql("""CREATE TABLE gw36.db.banned (c_custkey BIGINT)
        PARTITIONED BY (bucket(2, c_custkey))""")
      s.sql("""INSERT INTO gw36.db.banned
        SELECT CAST(c_custkey AS BIGINT) FROM customer
        WHERE c_custkey % 11 = 0""")
      s.sql("""DELETE FROM gw36.db.cust t WHERE EXISTS
        (SELECT 1 FROM gw36.db.banned b
         WHERE b.c_custkey = t.c_custkey)""")
      s.sql("""UPDATE gw36.db.cust t SET c_mktsegment = 'next-banned'
        WHERE EXISTS (SELECT 1 FROM gw36.db.banned b
                      WHERE b.c_custkey = t.c_custkey + 1)""")
      s.sql("""SELECT c_custkey, c_acctbal, c_mktsegment
        FROM gw36.db.cust ORDER BY c_custkey""")
    }, oracle = Some("""
      WITH base AS (
        SELECT CAST(c_custkey AS BIGINT) AS k,
               CAST(c_acctbal AS DOUBLE) AS b, c_mktsegment AS s
        FROM customer),
      banned AS (SELECT k FROM base WHERE k % 11 = 0),
      afterdel AS (
        SELECT * FROM base t
        WHERE NOT EXISTS (SELECT 1 FROM banned WHERE banned.k = t.k))
      SELECT k AS c_custkey, b AS c_acctbal,
             CASE WHEN EXISTS (SELECT 1 FROM banned
                               WHERE banned.k = t.k + 1)
                  THEN 'next-banned' ELSE s END AS c_mktsegment
      FROM afterdel t ORDER BY c_custkey"""), bench = true),

    QuerySpec("w04_scd2_upsert", (s, dir) => {
      Tables.registerAll(s, dir)
      graft.engine.PartitionedManifest.ensurePacketPublishSteps()
      val conf = RunnerConf(
        stateDir = Files.createTempDirectory("graft-w04-state").toString,
        placeholders = Map(
          "scd_src" -> Files.createTempDirectory("graft-w04-src").toString,
          "scd_delta" -> Files.createTempDirectory("graft-w04-delta").toString,
          "scd_stage" -> Files.createTempDirectory("graft-w04-stage").toString))
      val res = new PacketRunner(s, conf).run(s"$packetsDir/test_scd2")
      require(res.resultCode("spark") == "success",
        s"scd2 packet failed: ${res.notices.mkString("; ")}")
      s.sql("""SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
                      CAST(valid_from AS STRING) AS valid_from,
                      CAST(valid_to AS STRING) AS valid_to,
                      CAST(CAST(is_current AS INT) AS BIGINT) AS is_current
               FROM scd_dim ORDER BY c_custkey, valid_from""")
    }, oracle = Some("""
      WITH rows2 AS (
        SELECT c_custkey, c_mktsegment, '2024-01-01' AS valid_from,
               '9999-12-31' AS valid_to, 1 AS is_current
        FROM customer WHERE c_custkey % 50 <> 0
        UNION ALL
        SELECT c_custkey, c_mktsegment, '2024-01-01', '2024-06-01', 0
        FROM customer WHERE c_custkey % 50 = 0
        UNION ALL
        SELECT c_custkey, c_mktsegment || ' (v2)', '2024-06-01',
               '9999-12-31', 1
        FROM customer WHERE c_custkey % 50 = 0
        UNION ALL
        SELECT 1000000 + c_custkey, 'NEWSEG', '2024-06-01', '9999-12-31', 1
        FROM customer WHERE c_custkey % 97 = 0)
      SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment,
             valid_from, valid_to, CAST(is_current AS BIGINT) AS is_current
      FROM rows2 ORDER BY c_custkey, valid_from""")),

    QuerySpec("w03_merge_upsert", (s, dir) => {
      Tables.registerAll(s, dir)
      graft.engine.PartitionedManifest.ensurePacketPublishSteps()
      val conf = RunnerConf(
        stateDir = Files.createTempDirectory("graft-w03-state").toString,
        placeholders = Map(
          "mrg_src" -> Files.createTempDirectory("graft-w03-src").toString,
          "mrg_delta" -> Files.createTempDirectory("graft-w03-delta").toString,
          "mrg_stage" -> Files.createTempDirectory("graft-w03-stage").toString))
      val res = new PacketRunner(s, conf).run(s"$packetsDir/test_merge")
      require(res.resultCode("spark") == "success",
        s"merge packet failed: ${res.notices.mkString("; ")}")
      s.sql("""SELECT c_custkey, c_name, c_acctbal FROM mrg_tbl
               ORDER BY c_custkey""")
    }, oracle = Some("""
      WITH delta AS (
        SELECT c_custkey, c_name || ' (upd)' AS c_name,
               c_acctbal + 100.0 AS c_acctbal
        FROM customer WHERE c_custkey % 100 = 0
        UNION ALL
        SELECT 1000000 + c_custkey * 20 + 1,
               'new customer ' || CAST(c_custkey AS STRING),
               CAST(0.0 AS DOUBLE)
        FROM customer WHERE c_custkey % 97 = 0)
      SELECT CAST(m.c_custkey AS BIGINT) AS c_custkey, m.c_name,
             CAST(m.c_acctbal AS DOUBLE) AS c_acctbal
      FROM (
        SELECT c.c_custkey, c.c_name, c.c_acctbal FROM customer c
        WHERE NOT EXISTS
          (SELECT 1 FROM delta d WHERE d.c_custkey = c.c_custkey)
        UNION ALL SELECT * FROM delta) m
      ORDER BY c_custkey"""))
  )
}
