package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming extension (the reference is batch-only —
  * SURVEY.md §2.2 "Streaming: none"; this is §7 step 8 beyond-parity).
  *
  * The `events` fixture drives three canonical shapes:
  *  - watermarked tumbling/sliding window aggregation,
  *  - stateful sessionization via flatMapGroupsWithState,
  *  - append-mode sink, exactly-once per micro-batch.
  *
  * Scale posture: state is keyed by (window, event_type) / user_id and
  * lives in the state store (RocksDB-backed on a real cluster); the
  * watermark bounds state size. No collect, no global sort.
  */
object EventsStreaming {

  /** Schema of the events fixture with ts at micros (see Tables.load). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Watermarked tumbling-window counts per event type. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total"))

  /** Watermarked SLIDING-window counts (each event lands in
    * window/slide overlapping windows). */
  def slidingCounts(events: DataFrame, window_ : String = "1 hour",
      slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("event_type"), col("n"))

  /** Exactly-once-per-id ingest dedup — the streaming twin of d01:
    * duplicate event_ids arriving within the watermark horizon are
    * dropped, and an id's state is freed once the watermark passes it,
    * so state stays bounded by the horizon instead of growing with the
    * stream. */
  def dedupByKey(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming corpus curation — the p02 composition on an unbounded
    * document stream: quality gate → language gate → fingerprint dedup.
    * Every scoring stage is a pure column expression (streams untouched);
    * the batch dedup window becomes dropDuplicatesWithinWatermark on the
    * fingerprint, so dedup state holds only the horizon's fingerprints —
    * at continuous-ingest scale the state store is bounded by the
    * watermark, not corpus history. */
  def curate(docs: DataFrame, tsCol: String,
      watermark: String = "1 hour"): DataFrame = {
    import graft.operators.TextAnalysis
    val scored = TextAnalysis.qualityFeatures(docs, col("text"))
      .withColumn("lang_detected", TextAnalysis.langId(col("text")))
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    scored
      .filter(col("n_words") >= 10 && col("quality_score") >= 0.3 &&
        col("lang_detected") === "en")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("n_words"), col("quality_score"), col("fp"))
  }

  /** Streaming twin of the d02 MinHash-LSH NEAR-dup (batch
    * Dedup.minhashLsh): an ingest pipeline that near-dedups in batch but
    * only exact-dedups its stream silently diverges — this closes that
    * gap. Emits (w_start, band, doc_id, keep_id): doc_id shares an LSH
    * band with keep_id (the bucket's min id) inside one event-time
    * window, i.e. the same band-collision candidate rule as the batch
    * operator, with the same deterministic keep-lowest winner as d07.
    *
    * Shape: the fused tokens→shingles→signature expression runs
    * per-document (streams untouched), band keys explode to `bands`
    * (ts, band, id) rows, and ONE windowed aggregation per (window,
    * band) holds min-id + a CAPPED sorted member list — the only
    * stateful operator, so append mode emits each bucket exactly once
    * when the watermark closes its window. Aggregation is commutative,
    * which makes the result provably ARRIVAL-ORDER-INDEPENDENT
    * (test-pinned by a shuffled replay), unlike a first-seen-wins
    * dropDuplicates formulation whose winner depends on replay order.
    *
    * Scale posture: state per (window, band) is ≤ cap+2 longs — bounded
    * by the watermark horizon × band cardinality, never by corpus
    * history; the text never enters the shuffle (signature rows are
    * `bands` longs per doc, the d02 posture); a boilerplate band bucket
    * (every doc sharing one gram) degrades to ONE capped row, not a
    * quadratic pair blow-up. Singleton buckets emit nothing.
    */
  def nearDupBands(docs: DataFrame, tsCol: String,
      watermark: String = "1 hour", window_ : String = "1 hour",
      numPerm: Int = 64, bands: Int = 16, cap: Int = 64): DataFrame = {
    import graft.operators.{Dedup, TextAnalysis}
    val rowsPerBand = numPerm / bands
    val wm = if (docs.isStreaming) docs.withWatermark(tsCol, watermark)
      else docs
    val banded = wm.select(col(tsCol), col("doc_id"),
      explode(Dedup.bandKeys(
        graft.functions.MinHash.minhashTokensSig(
          TextAnalysis.tokens(col("text")), 3, numPerm),
        bands, rowsPerBand)).as("band"))
    // keep-lowest members via the BOUNDED MinKLongs aggregator: its
    // partial and its state-store row hold <= cap longs no matter how
    // hot the bucket (a collect_set formulation only truncates the
    // EMITTED slice — its state grows with bucket membership, exactly
    // the boilerplate-bucket hazard the cap exists for). Deterministic
    // under any arrival order: sorted merge-truncate is commutative.
    val minK = udaf(new graft.functions.MinKLongs(cap))
    banded
      .groupBy(window(col(tsCol), window_), col("band"))
      .agg(min(col("doc_id")).as("keep_id"),
        minK(col("doc_id")).as("members"))
      .select(col("window.start").as("w_start"), col("band"),
        explode(col("members")).as("doc_id"), col("keep_id"))
      .filter(col("doc_id") =!= col("keep_id"))
  }

  /** Streaming twin of the d03 SimHash near-dup (batch
    * Dedup.simhashPairs): the hamming-ball candidate rule on an unbounded
    * stream. Blocks on the same 4 x 16-bit signature chunks as the batch
    * operator (pigeonhole: any pair within Hamming distance 3 shares at
    * least one chunk), verifies `bit_count(xor) <= maxHamming`, and emits
    * (w_start, chunk, id_a, id_b, hamming) per event-time window.
    *
    * Shape: the fused tokens→simhash64 expression runs per-document
    * (streams untouched); each doc explodes to exactly 4 (chunk, value)
    * keys carrying (id, sig) — two longs, never the text; ONE windowed
    * aggregation per (window, chunk-key) holds a capped sorted member
    * list — the only stateful operator, so append mode emits each bucket
    * exactly once when the watermark closes its window. The pair
    * expansion and hamming verify are STATELESS post-aggregation
    * projections over the emitted (<= cap)-member row. Aggregation is
    * commutative → result is arrival-order independent (test-pinned by a
    * shuffled replay). A pair colliding in several chunks emits once per
    * chunk (chunk is part of the output key) — the batch operator's
    * cross-chunk min-hamming dedup would be a second stateful
    * aggregation, which append-mode streaming disallows; consumers
    * `distinct` on (id_a, id_b) instead.
    *
    * Scale posture: state per (window, chunk-key) is <= cap (id, sig)
    * structs — enforced INSIDE the aggregation by the bounded MinKIdSigs
    * buffer, so the state store is bounded by watermark horizon x
    * chunk-key cardinality, never corpus history; a boilerplate bucket
    * (thousands of identical signatures) degrades to one capped row and
    * a cap² local pair expansion, not unbounded state.
    *
    * Cap semantics vs batch (deliberate divergence, recall-side only):
    * bucket members beyond the cap lose their pairs entirely, keeping
    * state bounded — the batch operator's chunkCap=4096 instead caps
    * only the indexed side and still probes every member (and collapses
    * equal signatures into lossless star pairs first). A bucket at or
    * under cap emits identically to an uncapped bucket; oversized
    * buckets keep their cap-smallest members connected. Raise `cap` to
    * trade state for recall.
    */
  def simhashNearDup(docs: DataFrame, tsCol: String,
      watermark: String = "1 hour", window_ : String = "1 hour",
      maxHamming: Int = 3, cap: Int = 64): DataFrame = {
    import graft.operators.Dedup
    val wm = if (docs.isStreaming) docs.withWatermark(tsCol, watermark)
      else docs
    val chunked = wm
      .select(col(tsCol), col("doc_id"),
        Dedup.simhash(col("text")).as("sig"))
      .select(col(tsCol), col("doc_id"), col("sig"),
        explode(transform(sequence(lit(0), lit(3)),
          c => struct(c.as("c"),
            call_function("shiftright", col("sig"), c * 16)
              .bitwiseAND(0xFFFFL).as("v")))).as("chunk"))
    // bounded bucket membership: MinKIdSigs keeps <= cap (id, sig) pairs
    // in the aggregation partial AND the state-store row (a collect_set
    // would grow state with the bucket; see nearDupBands)
    val minK = udaf(new graft.functions.MinKIdSigs(cap))
    chunked
      .groupBy(window(col(tsCol), window_), col("chunk"))
      .agg(minK(col("doc_id"), col("sig")).as("members"))
      .filter(size(col("members")) > 1)
      // stateless pair expansion: members x members, ordered pairs only
      .select(col("window.start").as("w_start"), col("chunk"),
        explode(col("members")).as("a"), col("members"))
      .select(col("w_start"), col("chunk"), col("a"),
        explode(col("members")).as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("w_start"), col("chunk.c").cast("long").as("chunk"),
        col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sig").bitwiseXOR(col("b.sig")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Streaming twin of the p05 per-source quota
    * (operators/Quota.keepTopKPerGroup): cap every source's contribution
    * per event-time window, keeping its best k rows by score. An ingest
    * pipeline that curates batch corpora with quotas but streams
    * uncapped silently over-samples hot domains — this closes that gap.
    *
    * Shape: the SAME bounded [[graft.functions.TopKByScore]] Aggregator
    * the batch operator uses, under a windowed groupBy — its partial
    * buffers keep <= k candidates per (window, source, partition) and
    * merge commutatively, so state per key is <= k (score, id) pairs,
    * the result is arrival-order independent (test-pinned by a shuffled
    * replay), and append mode emits each (window, source) exactly once
    * at watermark close. Same DESC-score / ASC-id tie rule as batch, so
    * a window's emission equals the batch operator run on that window's
    * slice, row for row.
    *
    * @return (w_start, groupCol, rank 1..k, id, score)
    */
  def quotaTopK(rows: DataFrame, tsCol: String, groupCol: String,
      idCol: String, scoreCol: String, k: Int,
      watermark: String = "1 hour", window_ : String = "1 hour"): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    val wm = if (rows.isStreaming) rows.withWatermark(tsCol, watermark)
      else rows
    wm.select(col(tsCol), col(groupCol),
        col(scoreCol).cast("double").as("score"),
        col(idCol).cast("long").as("id"))
      .groupBy(window(col(tsCol), window_), col(groupCol))
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("window.start").as("w_start"), col(groupCol),
        posexplode(col("top")).as(Seq("rank", "s")))
      .select(col("w_start"), col(groupCol),
        (col("rank") + 1).cast("long").as("rank"),
        col("s.id").as(idCol), col("s.score").as("score"))
  }

  /** One document arrival for the streaming near-dup twin. */
  final case class VecArrival(vec_id: Long, embedding: Seq[Float])

  /** Streaming twin of the s19 INGEST path: continuous IVF list
    * assignment. New vectors are assigned to their inverted list by the
    * same codegen'd integer-exact argmin the batch stager uses (the
    * centroids — nlist quantized vectors — ride into every executor as a
    * literal, the broadcast-dimension pattern), so a
    * `writeStream.partitionBy("list_id")` sink APPENDS each micro-batch
    * into the exact layout [[graft.operators.Similarity.ivfStagedTopK]]
    * serves: probes keep pruning to their nprobe directories while the
    * index grows, no rebuild, no state (stateless projection — the
    * stream side of "assignment is an ingest-time step").
    * StreamingSpec pins stream==batch assignment AND that a probe over
    * the mixed batch+streamed directory still file-prunes and matches
    * the in-memory index. */
  def ivfAssign(vectors: DataFrame,
      centroids: Array[Array[Int]]): DataFrame = {
    import graft.functions.VectorFunctions
    vectors.withColumn("list_id", VectorFunctions.int8NearestList(
      VectorFunctions.int8Quantize(col("embedding")), centroids))
  }

  /** Streaming twin of the t22 ENCODE-ingest path: documents arriving
    * on a stream are BPE-encoded with a FROZEN tokenizer — the staged t24 merge table
    * AND a pinned (seg, tok_id) vocabulary (both ingest-time, like the
    * IVF centroids; per-batch id re-derivation would assign different
    * ids to the same token, the bug the twin test would catch)
    * and their (doc_id, token_ids) rows land in the same staged
    * layout [[graft.operators.TextAnalysis.bpeEncodeIds]] fills in
    * batch. `foreachBatch` because the per-doc array assembly is a
    * grouped aggregate — each micro-batch carries complete documents,
    * so the batch encoder runs as-is. At-least-once safety is REAL, not
    * assumed: each micro-batch writes (mode=overwrite) its own
    * batchId-keyed subdirectory, so a replayed batch REWRITES its
    * directory instead of appending duplicate (doc_id, token_ids) rows
    * into the corpus — a blind append would silently double documents
    * after any failure/restart. Readers scan the layout with
    * `recursiveFileLookup` (flat ingest files + b<id>/ stream dirs).
    * StreamingSpec pins stream==batch arrays over the mixed directory
    * AND replay-idempotency. */
  def encodeIdsBatch(spark: org.apache.spark.sql.SparkSession,
      outDir: String, merges: Seq[(String, String)],
      vocabIds: DataFrame)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    graft.operators.TextAnalysis
      .bpeEncodeIdsWithVocab(batch, "doc_id", "text", merges, vocabIds)
      .write.mode("overwrite").parquet(s"$outDir/b$batchId")
  }

  /** Streaming twin of the t27 LM quality-filter serving path:
    * documents arriving on a stream score against the FROZEN staged
    * bigram LM (model counts + vocab size + tercile cut-points, all
    * ingest-time artifacts) — the CCNet production deployment, where
    * the filter runs in the ingest stream and the model never moves.
    * Scoring is per-document work (model left-joins + a row-local
    * threshold compare; unseen pairs smooth through add-one), so
    * stream==batch values hold exactly. `foreachBatch` because the
    * per-doc NLL sum is a grouped aggregate and each micro-batch
    * carries complete documents. At-least-once safe the same way as
    * [[encodeIdsBatch]]: each batch overwrites its own batchId-keyed
    * subdirectory, so a replayed batch rewrites instead of duplicating
    * scored rows. */
  def lmScoreBatch(spark: org.apache.spark.sql.SparkSession,
      outDir: String, sfDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    graft.operators.TextAnalysis
      .bigramLmBucketsFromArtifact(spark, batch, "doc_id", "text", sfDir)
      .write.mode("overwrite").parquet(s"$outDir/b$batchId")
  }

  /** Streaming twin of the p29 quality-staged curriculum: documents
    * arriving on a stream are assigned their curriculum STAGE from the
    * frozen t27 artifact's cut-points plus their reproducible shuffle
    * key — row-local work, no global rank, so a micro-batch landing
    * long after the cut-points froze still gets exactly the stage the
    * batch curriculum would give it. The global training ORDER is a
    * property of the accumulated set, not of any single row: sorting
    * everything assigned so far by (stage, k, doc_id) IS the batch
    * curriculum's order (StreamingSpec pins it). Replay-idempotent the
    * [[encodeIdsBatch]] way: each batch overwrites its batchId-keyed
    * subdirectory. */
  def curriculumAssignBatch(spark: org.apache.spark.sql.SparkSession,
      outDir: String, sfDir: String, seed: String)(
      batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    graft.operators.TextAnalysis
      .curriculumAssignFromArtifact(spark, batch, "doc_id", "text",
        sfDir, seed)
      .write.mode("overwrite").parquet(s"$outDir/b$batchId")
  }

  /** MAINTENANCE for the streaming-ingest layout — the small-file
    * problem streaming CREATES, closed by the machinery batch
    * maintenance already has: [[encodeIdsBatch]]-style sinks accumulate
    * one b<id>/ directory per micro-batch (that per-batch isolation IS
    * the replay-idempotency guarantee), so after N batches the layout
    * holds N directory listings of sliver files. This one-shot pass
    * reads the whole mixed layout (flat ingest files + b<id>/ dirs) and
    * publishes it as a [[graft.engine.ManifestTable]] version behind
    * ONE atomic pointer swap: readers of the table root see the
    * complete old or new compacted version, never a mixture, and
    * re-running re-publishes the same rows (keep-2 GC collects the
    * duplicate — idempotent). The source layout is left untouched; cut
    * readers over to the table root and re-run the pass on whatever
    * schedule the ingest volume needs. Run it at a QUIESCED point (the
    * stream stopped, or between triggers from the stream's own
    * listener): a replayed micro-batch's b<id> overwrite deletes that
    * directory mid-scan, so a pass racing the stream can fail on
    * listed-then-deleted files or publish a version missing the
    * replayed batch — scheduling around triggers is the contract, not
    * a recoverable race. `targetPartitions` bounds the output file
    * count; 0 = let the reader's own small-file binning
    * (maxPartitionBytes) decide. */
  def compactIngestLayout(spark: org.apache.spark.sql.SparkSession,
      layoutDir: String, tableRoot: String,
      targetPartitions: Int = 0): String = {
    val all = spark.read.option("recursiveFileLookup", "true")
      .parquet(layoutDir)
    val sized =
      if (targetPartitions > 0) all.repartition(targetPartitions) else all
    graft.engine.ManifestTable.publish(spark, tableRoot, sized)
  }

  /** Streaming twin of the w03 merge path: a stream of keyed upserts
    * folds into a [[graft.engine.PartitionedManifest]] table through
    * `foreachBatch` — each micro-batch anti-joins the touched
    * partitions' CURRENT versions against its delta keys, unions the
    * delta, and commits ONE snapshot, so readers see the whole
    * micro-batch's merge atomically across every touched partition
    * (the cross-partition guarantee the batch packet gets from
    * commitSnapshot), and partitions no batch touches are never
    * rewritten. No state store: the table IS the state, and the fold
    * is idempotent per batch (re-running a batch re-publishes the same
    * merged rows as a fresh version — at-least-once safe). The caller
    * pre-dedupes keys WITHIN a batch (upsert semantics need one row
    * per key per commit; StreamingSpec feeds unique keys).
    *
    * At 100 TB: per batch, cost = the delta's partition footprint
    * (read current + rewrite of ONLY the touched partitions), exactly
    * the batch merge's posture — a micro-batch is just a small delta. */
  def mergePublishBatch(spark: org.apache.spark.sql.SparkSession,
      root: String, partCol: String, keyCol: String)(
      batch: DataFrame, batchId: Long): Unit = {
    import graft.engine.{ManifestTable, PartitionedManifest}
    // checkpoint FIRST: the old isEmpty probe executed the incremental
    // plan once and the checkpoint executed it again; now one
    // materialization serves the emptiness test (zero collected
    // partition values) and every downstream read
    val delta = batch.localCheckpoint() // freeze: read once per partition
    val touched = delta.select(col(partCol).cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    if (touched.isEmpty) return
    val updates = touched.map { v =>
      val d = delta.filter(col(partCol).cast("string") === v).drop(partCol)
      val merged = ManifestTable
        .currentDataDir(s"$root/$partCol=$v") match {
          case Some(_) =>
            // MOR-resolving current read (a raw parquet read of a
            // merge-on-read live dir would see only the delta files)
            val cur = PartitionedManifest.readPartition(spark, root,
              partCol, v)
            cur.join(d.select(col(keyCol)), Seq(keyCol), "left_anti")
              .unionByName(d)
          case None => d // brand-new partition
        }
      v -> merged
    }.toMap
    PartitionedManifest.commitSnapshot(spark, root, partCol, updates)
  }

  final case class DocArrival(doc_id: Long, text: String,
      ts: java.sql.Timestamp)

  /** Stream-static enrichment — the canonical "join the live stream to a
    * dimension table" shape: the static side is broadcast, so the stream
    * side never shuffles and no state store is involved — unlike
    * stream-stream joins there is nothing to watermark. The static plan
    * re-EXECUTES per micro-batch, but for FILE sources the file LISTING
    * is pinned when the DataFrame is built (an overwritten parquet dim
    * breaks the query; refreshable dims need a table/Delta source or a
    * foreachBatch re-read — documented, test-pinned contract). At 100 TB
    * the stream's scale is irrelevant to this join: cost is per-batch
    * broadcast of the dim (bounded) times stream partitions. Inner by
    * default; `how = "left_outer"` keeps unmatched events flowing. */
  def enrich(events: DataFrame, dim: DataFrame, key: String,
      how: String = "inner"): DataFrame =
    events.join(broadcast(dim), Seq(key), how)

  /** Stream-STREAM interval join — the p21 multi-touch window as two live
    * streams, using Spark's native stream-stream join: every purchase
    * pairs with every view by the same user inside the trailing window.
    * Both sides carry watermarks and the join condition bounds event time
    * on BOTH ends, which is exactly what lets the engine drop view state
    * once the watermark passes `window` behind (unbounded state
    * otherwise — the planner rejects an unbounded-time stream-stream
    * join in append mode without these constraints).
    *
    * Scale posture: state is the in-horizon slice of both streams keyed
    * by (user, time), exactly the candidate set; the batch twin is the
    * p21 grid range join, and Spark's micro-batch join reaches the same
    * pair set because an inner join over complete (within-watermark)
    * inputs is arrival-order independent — pinned by the shuffled-replay
    * test.
    *
    * @return (user_id, purchase_id, view_id, tp, tv) — one row per
    *         (purchase, touch) pair, tp/tv in epoch micros
    */
  def touchPairs(views: DataFrame, purchases: DataFrame,
      window_ : String = "24 hours",
      watermark: String = "1 hour"): DataFrame = {
    val v = views
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    v.join(p, expr(
        s"""user_id = p_user AND
            v_ts >= p_ts - INTERVAL $window_ AND v_ts <= p_ts"""))
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        unix_micros(col("p_ts")).as("tp"), unix_micros(col("v_ts")).as("tv"))
  }

  /** One scored arrival for the streaming quota twin. */
  final case class ScoredArrival(doc_id: Long, source: String,
      n_chars: Long, ts: java.sql.Timestamp)

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)
  final case class AsOfMatch(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp, view_event_id: Option[Long],
      view_value: Option[Double])
  // reflectively constructed by the state encoder (see SessionState)
  final case class LastSeen(ts: Long, id: Long, value: Double)
  final case class SessionAgg(user_id: Long, n_events: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp)
  // not `private`: the state encoder's generated code constructs it
  // reflectively in the timeout-firing path (codegen cannot see private
  // members of the enclosing object)
  final case class SessionState(n: Long, start: Long, last: Long)

  /** Streaming twin of the p04 as-of join (operators/AsOf.scala):
    * last-touch attribution on a live stream — every `probeType` event
    * (purchase) is emitted with the newest `refType` event (view) at or
    * before it for the same user.
    *
    * State is ONE (ts, id, value) triple per user — O(users), not
    * O(events) — and never expires: the latest view stays relevant for
    * the stream's whole life, which is exactly the state a 1000-executor
    * RocksDB store holds comfortably. Within a micro-batch the slice is
    * sorted by (ts, side, id) with views before purchases at equal ts —
    * the batch operator's inclusive-match + greatest-tiebreak rule.
    * Append-mode caveat, by design: a view arriving LATER than an
    * already-emitted purchase (cross-batch out-of-order) cannot
    * retro-update that purchase — streaming attribution is
    * emit-on-arrival, and the batch twin is the replayable gold answer
    * (the spec pins stream == batch on an in-order replay).
    *
    * Batch: same handler after repartition + partition-local sort (the
    * sessionize trick — no extra exchange, zero per-key buffering). */
  def asofAttribution(spark: SparkSession, events: Dataset[Event],
      probeType: String = "purchase", refType: String = "view")
      : Dataset[AsOfMatch] = {
    import spark.implicits._
    val streaming = events.isStreaming
    val relevant = events
      .filter(col("event_type").isin(probeType, refType))
    val prepared =
      if (streaming) relevant
      else relevant.repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"),
          // views before probes at equal ts = inclusive match
          when(col("event_type") === refType, 0).otherwise(1),
          col("event_id"))
    prepared.groupBy(col("user_id")).as[Long, Event]
      .flatMapGroupsWithState[LastSeen, AsOfMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[LastSeen]) =>
          val ordered =
            if (streaming)
              it.toSeq.sortBy(e =>
                (e.ts.getTime, if (e.event_type == refType) 0 else 1,
                  e.event_id)).iterator
            else it
          var st = state.getOption.orNull
          val out = Seq.newBuilder[AsOfMatch]
          ordered.foreach { e =>
            if (e.event_type == refType) {
              val t = e.ts.getTime
              // newest wins; equal-ts ties to the greatest event_id —
              // the batch operator's deterministic tie rule
              if (st == null || t > st.ts ||
                  (t == st.ts && e.event_id > st.id))
                st = LastSeen(t, e.event_id, e.value)
            } else {
              out += AsOfMatch(userId, e.event_id, e.ts,
                Option(st).map(_.id), Option(st).map(_.value))
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Stateful sessionization: a session closes after `gapMs` of
    * inactivity.
    *
    * Streaming: an EVENT-TIME timeout (watermark-driven) flushes the open
    * session once the watermark passes last_event + gap — quiet keys close
    * deterministically on stream PROGRESS, not wall clock, so a replayed
    * stream yields identical sessions. Per-key work is bounded by the
    * micro-batch slice (sorted in the handler; partition-local sort is
    * disallowed on streams).
    *
    * Batch: the input is repartitioned by key and partition-locally sorted
    * (user_id, ts, event_id). The stateful operator's required ordering
    * (key asc) is a prefix of that sort and its required distribution is
    * satisfied by the repartition, so Catalyst inserts NO further exchange
    * or sort and each key's iterator arrives ts-ordered — the fold is
    * single-pass with zero per-key buffering (a hot key's full history
    * never materializes on one iterator buffer). Timeouts never fire in
    * batch; closed sessions are emitted inline. */
  def sessionize(spark: SparkSession, events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L,
      watermark: String = "30 minutes"): Dataset[SessionAgg] = {
    import spark.implicits._
    val streaming = events.isStreaming
    val prepared =
      if (streaming) events.withWatermark("ts", watermark)
      else events.repartition(col("user_id"))
        .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    // key by the COLUMN, not a lambda: groupByKey(_.user_id) would append
    // a fresh grouping column Catalyst cannot relate to user_id, forcing
    // its own exchange + sort and discarding the secondary sort above
    prepared.groupBy(col("user_id")).as[Long, Event]
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: emit the open session, drop state
            val st = state.get
            state.remove()
            if (st.n > 0L)
              Iterator(SessionAgg(userId, st.n,
                new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.last)))
            else Iterator.empty
          } else {
            // batch iterators are pre-sorted (see above); a micro-batch
            // slice is sorted here, bounded by the trigger size
            val ordered =
              if (streaming)
                it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).iterator
              else it
            var st = state.getOption.getOrElse(SessionState(0L, 0L, Long.MinValue))
            val out = Seq.newBuilder[SessionAgg]
            ordered.foreach { e =>
              val t = e.ts.getTime
              if (st.n == 0L) st = SessionState(1L, t, t)
              else if (t - st.last > gapMs) {
                out += SessionAgg(userId, st.n,
                  new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.last))
                st = SessionState(1L, t, t)
              } else {
                // a late-but-in-watermark event from an EARLIER batch may
                // precede the state's bounds: extend, never rewind (a
                // rewound `last` would corrupt session_end and fire the
                // event-time timeout early)
                st = SessionState(st.n + 1,
                  math.min(st.start, t), math.max(st.last, t))
              }
            }
            state.update(st)
            // close when the WATERMARK (not the clock) passes the gap;
            // must stay strictly above the current watermark
            if (streaming)
              state.setTimeoutTimestamp(
                math.max(st.last + gapMs, state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }

  final case class CdcChange(k: Long, op: String, ts: java.sql.Timestamp,
      seq: Long, v: Double)
  /** One changelog emission: the key's new current row plus the
    * (ts_ms, seq) version of the change that produced it, so a sink can
    * order upserts without trusting arrival order. */
  final case class CdcCurrent(k: Long, present: Boolean, v: Double,
      ts_ms: Long, seq: Long)
  // reflectively constructed by the state encoder (see SessionState)
  final case class CdcState(ts: Long, seq: Long, present: Boolean, v: Double)

  /** Streaming twin of the p13 CDC apply (operators/Cdc.scala): fold a
    * live I/U/D change feed into per-key current state, emitting the new
    * current row whenever a key's state changes ('D' emits
    * present=false — a retraction the sink applies as a delete).
    *
    * ORDER-INDEPENDENT by construction, unlike the as-of twin: the state
    * keeps the (ts, seq) of the applied change and ignores any arriving
    * change that is older, so latest-wins holds under arbitrary
    * cross-batch reordering and the LAST emission per key always equals
    * the batch fold's answer (the spec replays the feed shuffled to pin
    * exactly that). State is one (ts, seq, present, v) per key —
    * O(keys), the dimension-table cardinality, which is what a RocksDB
    * state store holds comfortably at cluster scale. */
  def cdcFold(spark: SparkSession, changes: Dataset[CdcChange])
      : Dataset[CdcCurrent] = {
    import spark.implicits._
    changes.groupBy(col("k")).as[Long, CdcChange]
      .flatMapGroupsWithState[CdcState, CdcCurrent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: Long, it: Iterator[CdcChange], state: GroupState[CdcState]) =>
          var st = state.getOption.orNull
          var changed = false
          it.foreach { c =>
            val t = c.ts.getTime
            if (st == null || t > st.ts || (t == st.ts && c.seq > st.seq)) {
              st = CdcState(t, c.seq, c.op != "D", c.v)
              changed = true
            }
          }
          if (changed) {
            state.update(st)
            Iterator.single(CdcCurrent(k, st.present, st.v, st.ts, st.seq))
          } else Iterator.empty
      }
  }

  /** One per-user funnel row (times in epoch micros, the p07 unit). */
  final case class FunnelRow(user_id: Long, t_signup: Option[Long],
    t_view: Option[Long], t_purchase: Option[Long])
  // reflectively constructed by the state encoder (see SessionState)
  final case class FunnelState(s: Long, views: Seq[Long],
    purchases: Seq[Long], maxT: Long)

  private def tMicros(ts: java.sql.Timestamp): Long =
    (ts.getTime / 1000L) * 1000000L + ts.getNanos / 1000L

  /** Exact-pruned state fold for the gated funnel. The gates only move
    * DOWN as events arrive (min-signup is monotone non-increasing, hence
    * so is the admissible-view threshold, hence the view answer, hence
    * the purchase threshold), which yields an exact prune: among views at
    * or above the current min-signup only the MINIMUM can ever be the
    * final answer under ANY still-reachable final signup time, so the
    * rest are dropped; views BELOW it must be retained (a later-arriving
    * earlier signup may admit them). Purchases prune identically against
    * the current view answer. In-order streams therefore hold O(1) state
    * per user; out-of-order arrivals grow it only by events that could
    * still genuinely change the answer, all bounded by the watermark
    * horizon. */
  private[graft] def funnelStep(st: FunnelState, tpe: String, t: Long,
      stages: (String, String, String)): FunnelState = {
    val bumped = tpe match {
      case stages._1 => st.copy(s = math.min(st.s, t))
      case stages._2 => st.copy(views = st.views :+ t)
      case stages._3 => st.copy(purchases = st.purchases :+ t)
      case _ => st
    }
    val withMax = bumped.copy(maxT = math.max(bumped.maxT, t))
    val (vBelow, vAbove) = withMax.views.partition(_ < withMax.s)
    val keptViews = vBelow ++ vAbove.minOption
    val kept = vAbove.minOption match {
      case None => withMax.copy(views = keptViews)
      case Some(tv) =>
        val (pBelow, pAbove) = withMax.purchases.partition(_ < tv)
        withMax.copy(views = keptViews, purchases = pBelow ++ pAbove.minOption)
    }
    kept
  }

  private[graft] def funnelFinish(userId: Long, st: FunnelState)
      : Option[FunnelRow] =
    if (st.s == Long.MaxValue) None // p07 keys the funnel on signups
    else {
      val v = st.views.filter(_ >= st.s).minOption
      val p = v.flatMap(tv => st.purchases.filter(_ >= tv).minOption)
      Some(FunnelRow(userId, Some(st.s), v, p))
    }

  /** Streaming twin of the p07 conversion funnel: per user, the earliest
    * signup, the earliest view at-or-after it, and the earliest purchase
    * at-or-after THAT — emitted once the event-time watermark passes the
    * user's last event plus `quietMs` (funnels are complete facts, so
    * emission waits for stream progress to close the user, the
    * sessionize pattern — never the wall clock).
    *
    * ORDER-INDEPENDENT by construction (see [[funnelStep]]): the pruned
    * state reaches the same answer under arbitrary cross-batch
    * reordering, so stream == batch is pinned under a shuffled replay —
    * stronger than the as-of twin's in-order contract, which a gated
    * funnel needs because its stages chain (one out-of-order signup
    * re-gates everything after it). A user producing events again after
    * emission re-opens fresh state and emits a second row — the
    * attribution-window semantics at horizon scale.
    *
    * Batch: the same fold with inline emission — no sort is even needed,
    * order-independence makes the unsorted group iterator exact. */
  def funnel(spark: SparkSession, events: Dataset[Event],
      stages: (String, String, String) = ("signup", "view", "purchase"),
      watermark: String = "1 hour",
      quietMs: Long = 30 * 60 * 1000L): Dataset[FunnelRow] = {
    import spark.implicits._
    val streaming = events.isStreaming
    val prepared =
      if (streaming) events.withWatermark("ts", watermark) else events
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val relevant = prepared
      .filter(col("event_type").isin(stages._1, stages._2, stages._3))
    relevant.groupBy(col("user_id")).as[Long, Event]
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Append, timeoutConf) {
        (userId: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            funnelFinish(userId, st).iterator
          } else {
            var st = state.getOption.getOrElse(
              FunnelState(Long.MaxValue, Seq.empty, Seq.empty, Long.MinValue))
            it.foreach { e =>
              st = funnelStep(st, e.event_type, tMicros(e.ts), stages)
            }
            if (streaming) {
              state.update(st)
              state.setTimeoutTimestamp(math.max(st.maxT / 1000L + quietMs,
                state.getCurrentWatermarkMs() + 1))
              Iterator.empty
            } else funnelFinish(userId, st).iterator
          }
      }
  }

  /** One frame arrival for the streaming scene-cut twin: event time is
    * the frame's presentation timestamp (monotone in frame_idx within a
    * video — true of any real decode order, and the contract that makes
    * watermark-ordered emission exact). */
  final case class Frame(video_id: Long, frame_idx: Long, h: Long,
      ts: java.sql.Timestamp)

  /** One emitted shot-boundary decision (the m07 row). */
  final case class SceneCut(video_id: Long, frame_idx: Long, hamming: Long,
      is_cut: Boolean)

  /** Per-video scene-cut state: the newest FLUSHED frame (the comparison
    * anchor) plus the out-of-order frames still above the watermark. */
  final case class SceneState(lastIdx: Long, lastHash: Long,
      hasLast: Boolean, pending: List[(Long, Long, Long)])

  /** Streaming twin of the m07 scene-cut pass (Multimodal.sceneCuts):
    * consecutive-frame hash Hamming jumps on an unbounded frame stream.
    *
    * The batch operator is a lag window — inexpressible directly on a
    * stream (append-mode windows cannot look across rows). Instead:
    * frames buffer per video until the WATERMARK passes their
    * presentation time, then flush in frame order against the last
    * flushed frame's hash. Because presentation time is monotone in
    * frame_idx (the input contract), no frame that could still arrive
    * can precede a flushed one, so emitted decisions are final — a
    * shuffled replay emits the batch answer exactly (StreamingSpec).
    *
    * Scale posture: state per video is the O(1) anchor plus only the
    * frames inside the watermark horizon (late-disorder window), never
    * video history; only (idx, hash, ts) triples are keyed and
    * shuffled — frame payloads were reduced to 8-byte hashes upstream,
    * the same hash-first posture as batch m07. Event-time timeouts
    * flush quiet videos on stream progress, not wall clock.
    */
  def sceneCuts(spark: SparkSession, frames: Dataset[Frame],
      threshold: Int, watermark: String = "10 seconds")
      : Dataset[SceneCut] = {
    import spark.implicits._
    val streaming = frames.isStreaming
    val prepared =
      if (streaming) frames.withWatermark("ts", watermark)
      else frames.repartition(col("video_id"))
        .sortWithinPartitions(col("video_id"), col("frame_idx"))
    val timeoutConf =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    prepared.groupBy(col("video_id")).as[Long, Frame]
      .flatMapGroupsWithState[SceneState, SceneCut](
        OutputMode.Append, timeoutConf) {
        (vid: Long, it: Iterator[Frame], state: GroupState[SceneState]) =>
          // batch: everything is final; stream: only frames at or below
          // the watermark are (a later frame has later event time)
          val wm =
            if (streaming) state.getCurrentWatermarkMs() else Long.MaxValue
          val st0 = state.getOption.getOrElse(
            SceneState(Long.MinValue, 0L, false, Nil))
          val incoming =
            it.map(f => (f.frame_idx, f.h, f.ts.getTime)).toList
          val (ready, hold) = (st0.pending ++ incoming)
            .sortBy(_._1).partition(_._3 <= wm)
          val out = List.newBuilder[SceneCut]
          var (lastIdx, lastHash, hasLast) =
            (st0.lastIdx, st0.lastHash, st0.hasLast)
          ready.foreach { case (idx, h, _) =>
            if (hasLast) {
              val ham = java.lang.Long.bitCount(h ^ lastHash).toLong
              out += SceneCut(vid, idx, ham, ham >= threshold)
            }
            lastIdx = idx; lastHash = h; hasLast = true
          }
          if (streaming) {
            state.update(SceneState(lastIdx, lastHash, hasLast, hold))
            // wake when the watermark can free the oldest held frame;
            // must stay strictly above the current watermark
            if (hold.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(hold.iterator.map(_._3).min, wm + 1))
          } else state.update(SceneState(lastIdx, lastHash, hasLast, Nil))
          out.result().iterator
      }
  }

  /** Streaming decontamination gate — the d06 benchmark-leak check
    * applied at INGEST: an unbounded document stream drops every doc
    * sharing a word n-gram with the (bounded) eval set, entirely
    * STATELESSLY. The eval grams compile into the plan as a literal
    * array and the test is one `arrays_overlap` over the doc's own
    * gram array — no state store, no watermark, no shuffle of the
    * stream; every micro-batch row is decided locally, so the gate
    * adds zero latency classes. Exact (not Bloom): the d10 Bloom
    * expression is the scale path that FRONTS this check when the
    * eval set outgrows a literal; semantics here match batch d06
    * bit-for-bit (StreamingSpec pins the complement identity).
    */
  def decontaminate(docs: DataFrame, textCol: String,
      evalGrams: Seq[String], n: Int = 8): DataFrame = {
    require(evalGrams.nonEmpty, "empty eval gram set")
    val evalArr = array(evalGrams.map(lit(_)): _*)
    docs.filter(!arrays_overlap(
      graft.operators.Dedup.shingles(col(textCol), n), evalArr))
  }
}
