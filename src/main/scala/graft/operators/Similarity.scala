package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *  - bruteForceTopK: exact cosine top-k — the correctness baseline.
  *    Scales as one scan + TakeOrderedAndProject (no shuffle of the
  *    full table; per-partition top-k then k·numPartitions merge).
  *  - lshTopK: sign-bit LSH restricts the scan to matching (and
  *    neighboring, via multi-probe) buckets; at 100 TB the bucket column
  *    becomes a partition key so probes touch only matching files
  *    (partition pruning).
  */
object Similarity {

  /** Exact top-k by cosine against one query vector (as a literal array).
    * TakeOrderedAndProject plan — no global sort. */
  def bruteForceTopK(
      embs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    embs.select(col(idCol),
      VectorFunctions.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Metadata-FILTERED exact top-k — the vector-database "filtered
    * search" shape: restrict the corpus by (a) an attribute predicate on
    * the embedding table itself and (b) a metadata table (keep only ids
    * passing a filter on a second table), THEN rank by cosine.
    *
    * Strategy is pre-filter, not post-filter: at 6% selectivity a
    * post-filter top-k would have to over-retrieve ~17× to survive the
    * filter; pre-filtering instead pushes the attribute predicate into
    * the parquet scan (PushedFilters — plan-asserted) and broadcasts the
    * filtered metadata ids as a left_semi, so the expensive per-vector
    * distance only runs on survivors. At 100 TB: scan prunes row groups
    * on the attribute, the semi-join ships only ids, and the result is
    * still TakeOrderedAndProject (k·partitions rows, no global sort). */
  def filteredTopK(
      embs: DataFrame, idCol: String, vecCol: String, pred: Column,
      keepIds: DataFrame, keepIdCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    embs.filter(pred)
      .join(broadcast(keepIds.select(col(keepIdCol).as(idCol))),
        Seq(idCol), "left_semi")
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** LSH-bucketed ANN: score only vectors whose bucket is within
    * `probes` Hamming distance of the query's bucket (multi-probe LSH).
    *
    * The Σ_{i<=probes} C(bits,i) probe bucket VALUES are enumerated on
    * the driver and pushed as an IN-set predicate — not a per-row
    * Hamming computation over the full corpus — so a layout partitioned
    * or bucketed by `bucket` prunes files/partitions at the scan
    * (94%+ of a 100 TB corpus is never read). Recall < 1.0 by
    * construction; verified against bruteForceTopK in tests. */
  def lshTopK(
      embs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, bits: Int = 12, probes: Int = 1): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    val qBucket: Long = embs.sparkSession.range(1)
      .select(VectorFunctions.lshBucket(q, bits).as("b")).head().getLong(0)
    val probeBuckets: Seq[Long] = (0 to probes).flatMap { d =>
      (0 until bits).combinations(d)
        .map(_.foldLeft(qBucket)((acc, j) => acc ^ (1L << j)))
    }
    embs
      .withColumn("bucket", VectorFunctions.lshBucket(col(vecCol), bits))
      .filter(col("bucket").isin(probeBuckets: _*))
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Maximum-inner-product search (MIPS): top-k by RAW dot product —
    * the recommender/two-tower serving objective, genuinely different
    * from cosine whenever norms vary (a long vector can out-score a
    * better-aligned short one). Exact scan; the codegen'd dot kernel is
    * the same sequential fold the SQL oracle's list sum performs, and
    * TakeOrderedAndProject keeps it a scan + heap, never a global sort.
    */
  def mipsTopK(
      embs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    embs.select(col(idCol),
        VectorFunctions.dot(col(vecCol), q).as("dot"))
      .orderBy(col("dot").desc, col(idCol))
      .limit(k)
  }

  /** MIPS under LSH — the Shrivastava–Li (NeurIPS'14) asymmetric
    * transform: corpus vectors scale into the unit ball (x/M for
    * M ≥ max‖x‖) and gain the coordinate √(1 − ‖x/M‖²); the query
    * gains a 0. Then q'·x' = (q·x)/M with ‖x'‖ = 1, so COSINE order on
    * the augmented space IS inner-product order on the original — and
    * every cosine-family index (the sign-bit LSH here, IVF, PQ alike)
    * serves MIPS unchanged. Recall vs [[mipsTopK]] is the LSH trade,
    * pinned in DedupSpec; the augmentation itself is exact (spec pins
    * full-scan augmented-cosine order == dot order).
    */
  def mipsLshTopK(
      embs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, bits: Int = 12,
      probes: Int = 2): DataFrame = {
    val m = embs.select(
        max(VectorFunctions.l2norm(col(vecCol))).as("m"))
      .head().getDouble(0)
    require(m > 0, "corpus has no non-zero vector")
    val aug = embs.withColumn("__scaled",
        transform(col(vecCol), e => e.cast("double") / lit(m)))
      .withColumn("__aug", concat(col("__scaled"),
        array(sqrt(greatest(lit(0.0),
          lit(1.0) - VectorFunctions.dot(col("__scaled"), col("__scaled")))))))
    val qn = math.sqrt(query.map(v => v.toDouble * v).sum)
    require(qn > 0, "zero query vector")
    val qAug: Seq[Double] = query.map(_ / qn) :+ 0.0
    val qCol = array(qAug.map(lit(_)): _*)
    val qBucket: Long = embs.sparkSession.range(1)
      .select(VectorFunctions.lshBucket(qCol, bits).as("b")).head().getLong(0)
    val probeBuckets: Seq[Long] = (0 to probes).flatMap { d =>
      (0 until bits).combinations(d)
        .map(_.foldLeft(qBucket)((acc, j) => acc ^ (1L << j)))
    }
    aug
      .withColumn("bucket", VectorFunctions.lshBucket(col("__aug"), bits))
      .filter(col("bucket").isin(probeBuckets: _*))
      .select(col(idCol),
        (VectorFunctions.dot(col(vecCol), array(query.map(lit(_)): _*)))
          .as("dot"))
      .orderBy(col("dot").desc, col(idCol))
      .limit(k)
  }

  /** RANGE (radius) search over a probe TABLE: every corpus vector with
    * `cosine >= tau` of each probe — the "all matches above threshold"
    * complement of top-k, and the distributed-probe complement of
    * [[lshTopK]] (whose probe is one driver-side vector). Both sides
    * compute the same codegen'd sign-bit LSH bucket; each probe then
    * EXPLODES to its Hamming<=1 bucket neighborhood (bits+1 distinct
    * values), which turns multi-probe matching into a plain EQUI-join on
    * `bucket` — broadcastable for an eval-sized probe set, shuffle-on-
    * bucket co-location otherwise; never a per-row Hamming scan of the
    * corpus. A (probe, doc) pair matches at most one variant (the
    * variants are distinct buckets), so no post-join dedup is needed.
    * Exact cosine verification keeps precision 1; recall is the explicit
    * LSH neighborhood trade, measured against brute force in DedupSpec.
    */
  def rangeSearch(
      corpus: DataFrame, probes: DataFrame, idCol: String, vecCol: String,
      qIdCol: String, qVecCol: String, tau: Double,
      bits: Int = 12): DataFrame = {
    val cb = corpus.select(col(idCol).as("doc_id"), col(vecCol).as("cv"))
      .withColumn("bucket", VectorFunctions.lshBucket(col("cv"), bits))
    val pb = probes.select(col(qIdCol).as("q_id"), col(qVecCol).as("qv"))
      .withColumn("b0", VectorFunctions.lshBucket(col("qv"), bits))
    val nbrs = array((col("b0") +: (0 until bits).map(i =>
      col("b0").bitwiseXOR(lit(1L << i)))): _*)
    pb.select(col("q_id"), col("qv"), explode(nbrs).as("bucket"))
      .join(cb, Seq("bucket"))
      .select(col("q_id"), col("doc_id"),
        VectorFunctions.cosine(col("qv"), col("cv")).as("cos"))
      .filter(col("cos") >= tau)
  }

  /** IVF (inverted-file) ANN — the classic coarse-quantizer scale path
    * (complements lshTopK): train k-means centroids once (fixed seed,
    * Spark ML — idiomatic distributed Lloyd iterations), assign every
    * vector to its nearest centroid's "inverted list", and serve a query
    * by scanning only the `nprobe` lists whose centroids are closest to
    * it.
    *
    * Scale posture: the assignment is an INGEST-time step — at 100 TB the
    * corpus is written `bucketBy(list_id)` / partitioned on `list_id`, so
    * the per-query `isin` on nprobe list ids prunes files at the scan
    * exactly like lshTopK's probe-bucket IN-set (nothing outside the
    * probed lists is read); centroids (nlist × dim doubles) live on the
    * driver/broadcast. Recall < 1.0 by construction; verified against
    * bruteForceTopK in tests. */
  def ivfAssign(
      embs: DataFrame, vecCol: String,
      nlist: Int, seed: Long = 42L): (Array[Array[Double]], DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val featured = embs.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>")))
    // random init + few Lloyd iterations: a coarse quantizer only needs
    // rough Voronoi cells (k-means|| init costs extra full passes that
    // buy nothing for recall here)
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(3)
      .setInitMode("random")
      .setFeaturesCol("__features").setPredictionCol("list_id")
      .fit(featured)
    (model.clusterCenters.map(_.toArray),
      model.transform(featured).drop("__features"))
  }

  /** A staged IVF index: driver-side centroids + the list-assigned corpus
    * (materialized). At 100 TB the `assigned` side is the bucketBy(list_id)
    * table on disk; here it is a localCheckpoint (freed by the
    * ContextCleaner when the index is collected). */
  final case class IvfIndex(centroids: Array[Array[Double]], assigned: DataFrame)

  // ingest-time staging: one trained index per (session, key, nlist, seed) —
  // queries must never pay Lloyd iterations (the reference point: an IVF
  // query scans nprobe inverted lists, it does not build the quantizer).
  // Bounded LRU, NOT a WeakHashMap keyed by session: the cached DataFrame
  // references its session, which would pin the weak key forever; the cap
  // bounds pinned sessions/checkpoints instead (evicted entries' blocks
  // are freed by the ContextCleaner once unreferenced).
  private val IvfCacheCap = 8
  private val ivfCache =
    new java.util.LinkedHashMap[(String, String, Int, Long), IvfIndex](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Int, Long), IvfIndex]): Boolean =
        size() > IvfCacheCap
    }

  private def ivfKey(embs: DataFrame, indexKey: String, nlist: Int,
      seed: Long): (String, String, Int, Long) =
    (graft.SessionKey.of(embs.sparkSession), indexKey, nlist, seed)

  /** Train + assign once per session per `indexKey`; subsequent calls are
    * cache hits (the PgCatalog.ensureRegistered pattern). Training runs
    * OUTSIDE the cache monitor so concurrent stagings of different keys
    * never serialize; a racing duplicate train is possible and first-wins. */
  def ivfIndex(embs: DataFrame, vecCol: String, indexKey: String,
      nlist: Int, seed: Long = 42L): IvfIndex = {
    val key = ivfKey(embs, indexKey, nlist, seed)
    val cached = ivfCache.synchronized(Option(ivfCache.get(key)))
    cached.getOrElse {
      val (c, a) = ivfAssign(embs, vecCol, nlist, seed)
      val built = IvfIndex(c, a.localCheckpoint())
      ivfCache.synchronized {
        Option(ivfCache.get(key)).getOrElse { ivfCache.put(key, built); built }
      }
    }
  }

  /** Serve one query from a staged index: pick the `nprobe` nearest
    * centroids driver-side (nlist rows), scan only those lists. */
  def ivfProbe(index: IvfIndex, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nprobe: Int): DataFrame = {
    val qd = query.map(_.toDouble).toArray
    def dist2(c: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < c.length) { val d = c(i) - qd(i); s += d * d; i += 1 }
      s
    }
    val probed = index.centroids.zipWithIndex
      .sortBy { case (c, i) => (dist2(c), i) }
      .take(nprobe).map(x => Integer.valueOf(x._2)).toSeq
    val q = array(query.map(v => lit(v)): _*)
    index.assigned.filter(col("list_id").isin(probed: _*))
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** One-shot convenience: train (or reuse, when `indexKey` is given) and
    * probe. Pass `indexKey` everywhere a session serves repeated queries. */
  def ivfTopK(
      embs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nlist: Int = 16, nprobe: Int = 4,
      indexKey: Option[String] = None): DataFrame = {
    val index = indexKey match {
      case Some(key) => ivfIndex(embs, vecCol, key, nlist)
      case None =>
        val (c, a) = ivfAssign(embs, vecCol, nlist)
        IvfIndex(c, a)
    }
    ivfProbe(index, idCol, vecCol, query, k, nprobe)
  }

  /** Seeded IVF — the fully DETERMINISTIC inverted-file variant (the
    * float-kmeans ivfTopK above keeps its recall tests but its Lloyd
    * iterations sum floats in partition order, so no second engine can
    * replay it): the coarse quantizer is the int8-QUANTIZED embeddings of
    * the `nlist` smallest ids — FAISS's "sample training points, zero
    * Lloyd iterations" IVF init — and assignment + probe selection are
    * exact integer squared-L2 argmins (ties → lowest centroid index).
    * Every stage is integer math, so a SQL oracle rebuilds the whole
    * index end to end; scoring inside the probed lists is the same
    * sequential-fold float cosine s01 hash-matches.
    *
    * Scale posture: identical to ivfTopK — assignment is ingest-time
    * (list_id the bucketBy/partition key, probes prune files via the
    * IN-set), centroids are nlist quantized vectors on the driver.
    */
  def ivfSeededTopK(
      embs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = seededCentroids(embs, idCol, vecCol, nlist)
    val probed = seededProbeLists(embs.sparkSession, centroids, query, nprobe)
    val q = array(query.map(v => lit(v)): _*)
    embs
      .withColumn("list_id", VectorFunctions.int8NearestList(
        VectorFunctions.int8Quantize(col(vecCol)), centroids))
      .filter(col("list_id").isin(probed: _*))
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** The seeded coarse quantizer: int8-quantized embeddings of the
    * `nlist` smallest ids (FAISS's sampled-points init, zero Lloyd
    * iterations) — nlist rows to the driver, nothing else. */
  private[graft] def seededCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, nlist: Int): Array[Array[Int]] =
    corpus.orderBy(col(idCol)).limit(nlist)
      .select(VectorFunctions.int8Quantize(col(vecCol)).as("q"))
      .collect().map(_.getSeq[Int](0).toArray)

  /** Driver-side probe selection: the `nprobe` centroids nearest the
    * quantized query by exact integer squared-L2 (ties → lowest index). */
  private[graft] def seededProbeLists(spark: SparkSession,
      centroids: Array[Array[Int]], query: Seq[Float],
      nprobe: Int): Seq[Integer] = {
    val q = array(query.map(v => lit(v)): _*)
    val qq: Array[Int] = spark.range(1)
      .select(VectorFunctions.int8Quantize(q).as("qq")).head()
      .getSeq[Int](0).toArray
    def dist2(c: Array[Int]): Long = {
      var s = 0L; var i = 0
      while (i < c.length) { val d = (qq(i) - c(i)).toLong; s += d * d; i += 1 }
      s
    }
    centroids.zipWithIndex
      .sortBy { case (c, i) => (dist2(c), i) }
      .take(nprobe).map(x => Integer.valueOf(x._2)).toSeq
  }

  // ---------------------------------------------------------------------
  // Persisted IVF: the ingest-time staged table the scale posture above
  // keeps promising ("list_id becomes the partition key at 100 TB"),
  // made real: the assignment is WRITTEN partitioned by list_id and a
  // probe reads only its nprobe partition directories off disk.

  /** Staged seeded-IVF table name, content-keyed by sfDir. */
  def ivfStagedTable(dir: String): String = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"ivf_lists_$tag"
  }

  private val ivfStagedKeys = scala.collection.mutable.Set.empty[(String, String)]

  /** Write the seeded-IVF assignment ONCE per (session, sfDir) as a
    * parquet table PARTITIONED BY `list_id` (the BucketedTables ingest
    * pattern — staging is an ingest cost, queries read `spark.table`).
    * A killed JVM can leave the managed location while the in-memory
    * catalog forgets the table; drop both halves before staging. */
  def ensureIvfStaged(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, vecCol: String, nlist: Int): Unit =
    ivfStagedKeys.synchronized {
      val key = (graft.SessionKey.of(spark), dir)
      if (!ivfStagedKeys(key)) {
        val table = ivfStagedTable(dir)
        spark.sql(s"DROP TABLE IF EXISTS `$table`")
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), table)
        loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(loc, true)
        val centroids = seededCentroids(corpus, idCol, vecCol, nlist)
        corpus
          .withColumn("list_id", VectorFunctions.int8NearestList(
            VectorFunctions.int8Quantize(col(vecCol)), centroids))
          .write.mode("overwrite").format("parquet")
          .partitionBy("list_id").saveAsTable(table)
        ivfStagedKeys += key
      }
    }

  /** Serve a top-k probe from the STAGED table. The centroids re-derive
    * from the staged rows themselves (the nlist smallest ids are corpus
    * members by construction — nlist rows to the driver), the probe
    * lists are chosen driver-side, and the scan's `list_id IN (probed)`
    * prunes PARTITION DIRECTORIES — only nprobe of nlist lists are read
    * off disk (numFiles-asserted in PlanAuditSpec exactly like p22's
    * Hilbert runs). Result-identical to [[ivfSeededTopK]]: same
    * centroids, same assignment, same exact-cosine scoring — so it
    * shares s03's full DuckDB oracle. */
  def ivfStagedTopK(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, vecCol: String, query: Seq[Float], k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    ensureIvfStaged(spark, dir, corpus, idCol, vecCol, nlist)
    val staged = spark.table(ivfStagedTable(dir))
    val centroids = seededCentroids(staged, idCol, vecCol, nlist)
    val probed = seededProbeLists(spark, centroids, query, nprobe)
    val q = array(query.map(v => lit(v)): _*)
    staged.filter(col("list_id").isin(probed: _*))
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Product-quantization (PQ) ANN — the FAISS-family code-compression
    * scale path: the vector splits into `m` subvectors, each subspace
    * gets a `ksub`-entry codebook, and every corpus vector is stored as
    * just `m` small codes. A query is answered by one scan of the CODES
    * with per-subspace lookup tables (ADC) — at 100 TB the codes table
    * is ~dim·4/m × smaller than the raw float corpus (64-dim float32 →
    * 4 bytes/vector at m=4), which is the difference between scanning
    * 100 TB and scanning 400 GB; encode is ingest-time, like s03's
    * list assignment.
    *
    * Two stages, the production ADC-then-refine shape: the code scan
    * ranks every vector by RECONSTRUCTED cosine (per-subspace integer
    * dot/norm lookup tables — raw quantized-L2 would ignore the
    * per-vector max-abs scales and track cosine poorly), keeps a
    * `shortlist` via TakeOrderedAndProject (per-partition bounded
    * heaps, no corpus shuffle), and only the shortlist is re-scored
    * with the exact float cosine. At scale the stored vector rides the
    * shortlist heap (FAISS's refine), so the corpus is still read once.
    *
    * Every stage is deterministic — codebooks are the int8-quantized
    * subvectors of the `ksub` smallest corpus ids (the s03 seeded
    * sampled-points init — zero Lloyd iterations), encode is an exact
    * integer squared-L2 argmin per subspace (ties → lowest code), ADC
    * sums are exact longs with one correctly-rounded sqrt+divide, and
    * the refine cosine is the s01 sequential fold — so a SQL oracle
    * replays the whole index end to end. Recall < 1.0 by construction;
    * asserted against bruteForceTopK in tests.
    *
    * @return (idCol, cos) — k rows, descending exact cosine over the
    *         ADC shortlist
    */
  // ingest-time staging for PQ codebooks — one derivation job per
  // (session, key, m, ksub), the ivfCache pattern: a PQ query pays one
  // scan of the CODES, it does not re-derive the quantizer. Bounded LRU
  // for the same reason as ivfCache (SessionKey key, no session pin).
  private val PqCacheCap = 8
  private val pqCache =
    new java.util.LinkedHashMap[(String, String, Int, Int), Array[Array[Array[Int]]]](
      16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String, Int, Int), Array[Array[Array[Int]]]])
          : Boolean = size() > PqCacheCap
    }

  private def pqDerive(embs: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int): Array[Array[Array[Int]]] = {
    val sample: Array[Array[Int]] = embs.orderBy(col(idCol)).limit(ksub)
      .select(VectorFunctions.int8Quantize(col(vecCol)).as("q"))
      .collect().map(_.getSeq[Int](0).toArray)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    // codebooks(j): the ksub candidate subvectors for subspace j
    Array.tabulate(m)(j => sample.map(_.slice(j * sub, (j + 1) * sub)))
  }

  /** PQ codebooks: the int8-quantized subvectors of the `ksub` smallest
    * corpus ids (seeded sampled-points init — zero Lloyd iterations).
    * With `indexKey` the derivation runs once per session and is reused
    * by every subsequent probe (the codebook is an ingest-time artifact,
    * like s03's list assignment — a query must never pay for it). */
  def pqCodebooks(embs: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, indexKey: Option[String] = None)
      : Array[Array[Array[Int]]] = indexKey match {
    case None => pqDerive(embs, idCol, vecCol, m, ksub)
    case Some(key) =>
      val ck = (graft.SessionKey.of(embs.sparkSession), key, m, ksub)
      val cached = pqCache.synchronized(Option(pqCache.get(ck)))
      cached.getOrElse {
        val built = pqDerive(embs, idCol, vecCol, m, ksub)
        pqCache.synchronized {
          Option(pqCache.get(ck)).getOrElse { pqCache.put(ck, built); built }
        }
      }
  }

  /** Quantize one query vector with the engine's own Int8Quantize
    * expression (one 1-row job — bit-identical to the corpus path). */
  private def quantizeQuery(embs: DataFrame, query: Seq[Float]): Array[Int] =
    embs.sparkSession.range(1)
      .select(VectorFunctions.int8Quantize(
        array(query.map(v => lit(v)): _*)).as("qq")).head()
      .getSeq[Int](0).toArray

  def pqTopK(
      embs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, m: Int = 8, ksub: Int = 16,
      shortlist: Int = 100, indexKey: Option[String] = None): DataFrame = {
    val codebooks = pqCodebooks(embs, idCol, vecCol, m, ksub, indexKey)
    pqAdcRefine(embs, idCol, vecCol, codebooks,
      quantizeQuery(embs, query), query, k, shortlist)
  }

  /** The PQ serve path shared by [[pqTopK]] and [[ivfPqTopK]]: encode
    * `scan` with the given (corpus-trained) codebooks, rank by ADC
    * reconstructed cosine, keep `shortlist`, exact-refine to top k.
    * `scan` may be the full corpus or an IVF-pruned subset — the
    * codebooks stay a whole-corpus ingest-time artifact either way. */
  private def pqAdcRefine(
      scan: DataFrame, idCol: String, vecCol: String,
      codebooks: Array[Array[Array[Int]]], qq: Array[Int],
      query: Seq[Float], k: Int, shortlist: Int): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val q = array(query.map(v => lit(v)): _*)
    val (dotLut, nrmLut, qNorm) = adcLuts(codebooks, qq)
    val qvec = VectorFunctions.int8Quantize(col(vecCol))
    // encode: per-subspace argmin code over the sliced quantized vector
    val codeCols = (0 until m).map { j =>
      VectorFunctions.int8NearestList(
        slice(qvec, j * sub + 1, sub), codebooks(j))
    }
    scan
      .withColumn("__codes", array(codeCols: _*))
      .select(col(idCol), col(vecCol),
        (lutSum(dotLut, col("__codes")).cast("double") /
          (sqrt(lutSum(nrmLut, col("__codes")).cast("double")) *
           sqrt(lit(qNorm.toDouble)))).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(shortlist)
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** ADC lookup tables, m·ksub longs each on the driver:
    *   dot(j)(c)  = Σ_i qq_ji · cb_ji   (query ⋅ codebook entry)
    *   nrm(j)(c)  = Σ_i cb_ji²          (reconstruction norm piece)
    * plus the query's own quantized norm. */
  private def adcLuts(codebooks: Array[Array[Array[Int]]], qq: Array[Int])
      : (Array[Array[Long]], Array[Array[Long]], Long) = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    val dotLut: Array[Array[Long]] = Array.tabulate(m) { j =>
      codebooks(j).map { c =>
        var s = 0L; var i = 0
        while (i < sub) { s += qq(j * sub + i).toLong * c(i); i += 1 }
        s
      }
    }
    val nrmLut: Array[Array[Long]] = Array.tabulate(m) { j =>
      codebooks(j).map { c =>
        var s = 0L; var i = 0
        while (i < sub) { s += c(i).toLong * c(i); i += 1 }
        s
      }
    }
    val qNorm: Long = qq.foldLeft(0L)((acc, x) => acc + x.toLong * x)
    (dotLut, nrmLut, qNorm)
  }

  /** Σ_j lut(j)(codes(j)) as one codegen-friendly literal-array lookup. */
  private def lutSum(lut: Array[Array[Long]], codes: Column): Column =
    aggregate(
      zip_with(
        array(lut.map(row => array(row.map(lit): _*)): _*),
        codes, (row, c) => element_at(row, c + 1)),
      lit(0L), (acc, x) => acc + x)

  /** IVF×PQ composite ANN — the architecture every large-scale vector
    * store actually runs (FAISS `IVFx,PQy`): the seeded coarse quantizer
    * (s03) prunes the corpus to the `nprobe` inverted lists nearest the
    * query, the PQ code scan (s09) ranks ONLY those survivors by ADC
    * reconstructed cosine, and the exact float cosine refines the
    * shortlist. The two stages multiply: at 100 TB the list filter
    * prunes files (list_id the bucketBy/partition key — nothing outside
    * the probed lists is read), and what IS read is the m-code column,
    * not the raw floats — nprobe/nlist × dim·4/m less IO than brute
    * force.
    *
    * Both halves stay exactly their standalone selves: the PQ codebooks
    * are a WHOLE-corpus ingest-time artifact (re-deriving per probed
    * subset would mean a per-query training pass — wrong at scale), the
    * centroid/probe/assignment argmins are exact integer L2, and every
    * downstream stage is [[pqTopK]]'s arithmetic verbatim — so the
    * composite inherits a full SQL oracle by concatenating the s03 and
    * s09 CTEs. Recall < 1.0 by construction (two approximation layers);
    * degenerates to exact brute force at nprobe=nlist with an exhaustive
    * shortlist (test-pinned).
    */
  def ivfPqTopK(
      embs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16, shortlist: Int = 100,
      indexKey: Option[String] = None): DataFrame = {
    // coarse stage — s03's seeded centroids, integer-exact probe pick
    val centroids: Array[Array[Int]] = embs.orderBy(col(idCol)).limit(nlist)
      .select(VectorFunctions.int8Quantize(col(vecCol)).as("q"))
      .collect().map(_.getSeq[Int](0).toArray)
    val qq = quantizeQuery(embs, query)
    def dist2(c: Array[Int]): Long = {
      var s = 0L; var i = 0
      while (i < c.length) { val d = (qq(i) - c(i)).toLong; s += d * d; i += 1 }
      s
    }
    val probed = centroids.zipWithIndex
      .sortBy { case (c, i) => (dist2(c), i) }
      .take(nprobe).map(x => Integer.valueOf(x._2)).toSeq
    val survivors = embs
      .withColumn("__list_id", VectorFunctions.int8NearestList(
        VectorFunctions.int8Quantize(col(vecCol)), centroids))
      .filter(col("__list_id").isin(probed: _*))
      .drop("__list_id")
    // compressed stage — s09's ADC scan + refine over the survivors,
    // codebooks trained on the FULL corpus (ingest-time artifact)
    val codebooks = pqCodebooks(embs, idCol, vecCol, m, ksub, indexKey)
    pqAdcRefine(survivors, idCol, vecCol, codebooks, qq, query, k, shortlist)
  }

  // ---------------------------------------------------------------------
  // Persisted PQ: the codebooks AND the encoded code table staged as
  // parquet tables at ingest — the s19 treatment for s09's session-LRU
  // gap: a restarted engine must serve ADC scans from the staged codes,
  // never re-derive them over the full corpus (at 100 TB that re-scan is
  // precisely what PQ exists to avoid).

  /** Staged PQ table names (codes, codebooks), content-keyed by
    * (sfDir, m, ksub). */
  def pqStagedTables(dir: String, m: Int, ksub: Int): (String, String) = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir m=$m ksub=$ksub".getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    (s"pq_codes_$tag", s"pq_codebooks_$tag")
  }

  private val pqStagedKeys = scala.collection.mutable.Set.empty[(String, String)]

  /** Write the PQ index ONCE per (session, sfDir, m, ksub): the
    * codebooks as a tiny (j, code, subvec) table and the corpus codes as
    * (id, codes array<int>) range-partitioned by id — ~m bytes/vector
    * instead of dim·4, the artifact an ADC scan reads. Encode runs the
    * exact [[pqAdcRefine]] argmin expressions, so staged-vs-in-memory
    * results are identical by construction. */
  def ensurePqStaged(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, vecCol: String, m: Int, ksub: Int): Unit =
    pqStagedKeys.synchronized {
      val (codesTable, booksTable) = pqStagedTables(dir, m, ksub)
      val key = (graft.SessionKey.of(spark), codesTable)
      if (!pqStagedKeys(key)) {
        val codebooks = pqDerive(corpus, idCol, vecCol, m, ksub)
        val sub = codebooks.head.head.length
        for (t <- Seq(codesTable, booksTable)) {
          spark.sql(s"DROP TABLE IF EXISTS `$t`")
          val loc = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"), t)
          loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(loc, true)
        }
        import spark.implicits._
        codebooks.zipWithIndex.flatMap { case (book, j) =>
          book.zipWithIndex.map { case (vec, c) => (j, c, vec.toSeq) }
        }.toSeq.toDF("j", "code", "subvec")
          .coalesce(1)
          .write.mode("overwrite").format("parquet").saveAsTable(booksTable)
        val qvec = VectorFunctions.int8Quantize(col(vecCol))
        val codeCols = (0 until m).map { j =>
          VectorFunctions.int8NearestList(
            slice(qvec, j * sub + 1, sub), codebooks(j))
        }
        corpus
          .select(col(idCol), array(codeCols: _*).as("codes"))
          .repartitionByRange(col(idCol))
          .write.mode("overwrite").format("parquet").saveAsTable(codesTable)
        pqStagedKeys += key
      }
    }

  /** Load the staged codebooks back into the driver-side shape (m·ksub
    * rows — bounded like the centroid collects). */
  def pqStagedCodebooks(spark: SparkSession, dir: String, m: Int,
      ksub: Int): Array[Array[Array[Int]]] = {
    val (_, booksTable) = pqStagedTables(dir, m, ksub)
    val rows = spark.table(booksTable)
      .select(col("j"), col("code"), col("subvec"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Int](2).toArray))
    Array.tabulate(m) { j =>
      val book = rows.filter(_._1 == j).sortBy(_._2)
      require(book.length == ksub, s"staged codebook $j has ${book.length}")
      book.map(_._3)
    }
  }

  /** Staged IVF×PQ table names (codes, codebooks), content-keyed by
    * (sfDir, nlist, m, ksub). */
  def ivfPqStagedTables(dir: String, nlist: Int, m: Int,
      ksub: Int): (String, String) = {
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$dir nlist=$nlist m=$m ksub=$ksub".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    (s"ivfpq_codes_$tag", s"ivfpq_codebooks_$tag")
  }

  private val ivfPqStagedKeys =
    scala.collection.mutable.Set.empty[(String, String)]

  /** Stage the FULL production ANN index ONCE per (session, sfDir,
    * nlist, m, ksub): corpus codes written `partitionBy(list_id)` —
    * the s19 directory pruning AND the s20 code compression in one
    * artifact (a probe reads nprobe/nlist of the directories, and what
    * it reads is m bytes/vector, not dim·4) — plus the codebooks
    * table. Coarse assignment and encode are the exact [[ivfPqTopK]]
    * expressions, so staged-vs-in-memory results are identical. */
  def ensureIvfPqStaged(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, vecCol: String, nlist: Int, m: Int,
      ksub: Int): Unit =
    ivfPqStagedKeys.synchronized {
      val (codesTable, booksTable) = ivfPqStagedTables(dir, nlist, m, ksub)
      val key = (graft.SessionKey.of(spark), codesTable)
      if (!ivfPqStagedKeys(key)) {
        for (t <- Seq(codesTable, booksTable)) {
          spark.sql(s"DROP TABLE IF EXISTS `$t`")
          val loc = new org.apache.hadoop.fs.Path(
            spark.conf.get("spark.sql.warehouse.dir"), t)
          loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(loc, true)
        }
        val centroids = seededCentroids(corpus, idCol, vecCol, nlist)
        val codebooks = pqDerive(corpus, idCol, vecCol, m, ksub)
        val sub = codebooks.head.head.length
        import spark.implicits._
        codebooks.zipWithIndex.flatMap { case (book, j) =>
          book.zipWithIndex.map { case (vec, c) => (j, c, vec.toSeq) }
        }.toSeq.toDF("j", "code", "subvec")
          .coalesce(1)
          .write.mode("overwrite").format("parquet").saveAsTable(booksTable)
        val qvec = VectorFunctions.int8Quantize(col(vecCol))
        val codeCols = (0 until m).map { j =>
          VectorFunctions.int8NearestList(
            slice(qvec, j * sub + 1, sub), codebooks(j))
        }
        corpus
          .withColumn("list_id", VectorFunctions.int8NearestList(
            qvec, centroids))
          .select(col(idCol), array(codeCols: _*).as("codes"),
            col("list_id"))
          .write.mode("overwrite").format("parquet")
          .partitionBy("list_id").saveAsTable(codesTable)
        ivfPqStagedKeys += key
      }
    }

  /** Serve IVF×PQ from the STAGED index — the production architecture,
    * persisted end to end: the probe's `list_id IN` prunes partition
    * DIRECTORIES (only nprobe of nlist lists are read off disk), the
    * surviving scan is codes-only (m bytes/vector), the bounded ADC
    * shortlist collects to the driver, and the exact-cosine refine
    * re-reads just those ids through a pushed parquet filter. Same
    * centroids, probes, codebooks, encode, ADC, and refine as
    * [[ivfPqTopK]] — result-identical, shares s13's oracle. */
  def ivfPqStagedTopK(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, vecCol: String, query: Seq[Float], k: Int,
      nlist: Int = 16, nprobe: Int = 4, m: Int = 8, ksub: Int = 16,
      shortlist: Int = 50): DataFrame = {
    ensureIvfPqStaged(spark, dir, corpus, idCol, vecCol, nlist, m, ksub)
    val (codesTable, booksTable) = ivfPqStagedTables(dir, nlist, m, ksub)
    val centroids = seededCentroids(corpus, idCol, vecCol, nlist)
    val probed = seededProbeLists(spark, centroids, query, nprobe)
    val rows = spark.table(booksTable)
      .select(col("j"), col("code"), col("subvec")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Int](2).toArray))
    val codebooks = Array.tabulate(m) { j =>
      val book = rows.filter(_._1 == j).sortBy(_._2)
      require(book.length == ksub, s"staged codebook $j has ${book.length}")
      book.map(_._3)
    }
    val qq = quantizeQuery(corpus, query)
    val (dotLut, nrmLut, qNorm) = adcLuts(codebooks, qq)
    val shortIds: Seq[Any] = spark.table(codesTable)
      .filter(col("list_id").isin(probed: _*))
      .select(col(idCol),
        (lutSum(dotLut, col("codes")).cast("double") /
          (sqrt(lutSum(nrmLut, col("codes")).cast("double")) *
           sqrt(lit(qNorm.toDouble)))).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(shortlist)
      .select(col(idCol)).collect().map(_.get(0)).toSeq
    val q = array(query.map(v => lit(v)): _*)
    corpus.filter(col(idCol).isin(shortIds: _*))
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Serve a PQ top-k from the STAGED index: the ADC ranking scans the
    * codes TABLE (a (id, codes) read — the dim·4/m IO reduction is now
    * physical, plan-asserted), the bounded shortlist ids come back to
    * the driver (≤ `shortlist` rows, like the probe-list collects), and
    * only those ids are re-read from the raw corpus for the exact-cosine
    * refine — an `id IN (...)` pushed parquet filter, not a second full
    * scan. Same codebooks, same argmin encode, same ADC arithmetic, same
    * refine as [[pqTopK]] — result-identical, so it shares s09's full
    * oracle. */
  def pqStagedTopK(spark: SparkSession, dir: String, corpus: DataFrame,
      idCol: String, vecCol: String, query: Seq[Float], k: Int,
      m: Int = 8, ksub: Int = 16, shortlist: Int = 100): DataFrame = {
    ensurePqStaged(spark, dir, corpus, idCol, vecCol, m, ksub)
    val (codesTable, _) = pqStagedTables(dir, m, ksub)
    val codebooks = pqStagedCodebooks(spark, dir, m, ksub)
    val qq = quantizeQuery(corpus, query)
    val (dotLut, nrmLut, qNorm) = adcLuts(codebooks, qq)
    val codes = spark.table(codesTable)
    val shortIds: Seq[Any] = codes
      .select(col(idCol),
        (lutSum(dotLut, col("codes")).cast("double") /
          (sqrt(lutSum(nrmLut, col("codes")).cast("double")) *
           sqrt(lit(qNorm.toDouble)))).as("__adc"))
      .orderBy(col("__adc").desc, col(idCol))
      .limit(shortlist)
      .select(col(idCol)).collect().map(_.get(0)).toSeq
    val q = array(query.map(v => lit(v)): _*)
    corpus.filter(col(idCol).isin(shortIds: _*))
      .select(col(idCol), VectorFunctions.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** BATCHED product-quantization search — the shape a production ANN
    * index actually serves: probes arrive as a SET, and the whole set is
    * answered by ONE scan of the PQ codes (vs. [[pqTopK]] in a loop =
    * one corpus scan per probe — q scans for q probes, wrong at 100 TB).
    *
    * One-pass construction, per stage:
    *  - the codebook derives ONCE (cached via `indexKey` like the IVF
    *    centroids — an ingest-time artifact);
    *  - every probe's ADC dot-LUT (m·ksub longs) and norm are computed
    *    on the driver from one bounded probe-quantization job, then ride
    *    a BROADCAST (q_id, lut, qnorm) relation — the corpus side never
    *    shuffles;
    *  - the corpus encodes once (`m` argmin codes per row), each row
    *    scores against every probe's LUT via the broadcast nested-loop,
    *    and the per-probe ADC shortlist accumulates in
    *    [[graft.functions.TopKByScoreVec]] — a bounded heap whose
    *    map-side partial keeps ≤ shortlist candidates per (probe,
    *    partition), the stored vector riding the heap (FAISS's refine)
    *    so no second corpus pass is needed to re-score;
    *  - the exploded shortlists (shortlist·q rows total) re-score with
    *    the exact float cosine against the broadcast probe vectors and
    *    the final top-k re-ranks through the s04 [[TopKByScore]] udaf.
    *
    * Arithmetic is stage-for-stage identical to [[pqTopK]] (same integer
    * LUT sums, same double division, same DESC/id tie-breaks), so the
    * per-probe results match the looped form bit-for-bit and the same
    * SQL oracle replays it.
    *
    * @return (q_id, rank, idCol, cos) with rank 1..k per probe
    */
  def pqBatchTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      probes: DataFrame, probeId: String, probeVec: String,
      k: Int, m: Int = 8, ksub: Int = 16, shortlist: Int = 100,
      indexKey: Option[String] = None): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val codebooks = pqCodebooks(corpus, corpusId, corpusVec, m, ksub, indexKey)
    val sub = codebooks.head.head.length
    // the probe set stays a DATAFRAME end-to-end: quantization (the
    // engine's own Int8Quantize, bit-identical to the corpus path), the
    // per-probe integer dot-LUT (the codegen'd PqDotLut kernel — same
    // sequential folds the former driver loop ran) and the probe norm
    // are all executor-side projections in the scan that reads the
    // probes, so a 1M-probe table never materializes m·ksub longs per
    // probe on the driver; only the broadcast ships the finished LUTs
    val lutDf = probes
      .select(col(probeId).cast("long").as("q_id"),
        VectorFunctions.int8Quantize(col(probeVec)).as("__pq"))
      .select(col("q_id"),
        VectorFunctions.pqDotLut(col("__pq"), codebooks).as("__dot"),
        aggregate(col("__pq"), lit(0L),
          (acc, x) => acc + x.cast("long") * x.cast("long")).as("__qn"))
    // probe-INDEPENDENT pieces, evaluated once per corpus row before the
    // probe fan-out: the m codes and the reconstruction-norm LUT sum
    val nrmLut: Array[Array[Long]] = Array.tabulate(m) { j =>
      codebooks(j).map(c => c.foldLeft(0L)((s, x) => s + x.toLong * x))
    }
    val qvec = VectorFunctions.int8Quantize(col(corpusVec))
    val codeCols = (0 until m).map { j =>
      VectorFunctions.int8NearestList(
        slice(qvec, j * sub + 1, sub), codebooks(j))
    }
    def lutSum(lut: Column): Column = aggregate(
      zip_with(lut, col("__codes"), (row, c) => element_at(row, c + 1)),
      lit(0L), (acc, x) => acc + x)
    val nrmLit = array(nrmLut.map(row => array(row.map(lit): _*)): _*)
    val topShort = udaf(new graft.functions.TopKByScoreVec(shortlist))
    val topk = udaf(new graft.functions.TopKByScore(k))
    val qv = probes.select(col(probeId).cast("long").as("q_id"),
      col(probeVec).as("__qv"))
    corpus
      .withColumn("__codes", array(codeCols: _*))
      .select(col(corpusId).cast("long").as("id"), col(corpusVec).as("__v"),
        lutSum(nrmLit).as("__nrm"), col("__codes"))
      .crossJoin(broadcast(lutDf))
      .select(col("q_id"),
        (lutSum(col("__dot")).cast("double") /
          (sqrt(col("__nrm").cast("double")) *
           sqrt(col("__qn").cast("double")))).as("score"),
        col("id"), col("__v").as("vec"))
      .groupBy(col("q_id"))
      // the udaf takes the ScoredVec FIELDS as its argument list
      .agg(topShort(col("score"), col("id"), col("vec")).as("cand"))
      .select(col("q_id"), explode(col("cand")).as("s"))
      .select(col("q_id"), col("s.id").as("id"), col("s.vec").as("vec"))
      .join(broadcast(qv), Seq("q_id"))
      .select(col("q_id"),
        VectorFunctions.cosine(col("vec"), col("__qv")).as("score"),
        col("id"))
      .groupBy(col("q_id"))
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("rank", "s")))
      .select(col("q_id"), (col("rank") + 1).cast("long").as("rank"),
        col("s.id").as(corpusId), col("s.score").as("cos"))
  }

  /** Exact top-k over int8-QUANTIZED vectors: the storage/bandwidth
    * scale path — at 100 TB the quantized corpus is written once at
    * ingest (4× smaller than float32, 8× than float64) and every query
    * scans int arrays whose cosine arithmetic is EXACT integer math in
    * doubles (sums < 2^53), so results are bit-reproducible across
    * engines (full SQL oracle, unlike float k-means). Cosine is
    * scale-invariant, so the per-vector quantization scale is never
    * stored. Recall vs the float baseline is bounded by the int8
    * rounding (~1e-2 cosine error) and asserted in tests. */
  def quantizedTopK(
      embs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(v => lit(v)): _*)
    val qq = VectorFunctions.int8Quantize(q).cast("array<double>")
    embs.select(col(idCol),
        VectorFunctions.cosine(
          VectorFunctions.int8Quantize(col(vecCol)).cast("array<double>"),
          qq).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Maximal-marginal-relevance (MMR) diverse retrieval: greedily pick
    * `k` results maximizing λ·cos(d, q) − (1−λ)·max_{s∈picked} cos(d, s)
    * — relevance minus redundancy, the re-rank RAG retrievers run so
    * the k passages aren't k paraphrases. Ties → lowest id.
    *
    * Scale shape: the corpus pays ONE brute-force scan (the s01
    * TakeOrderedAndProject) to produce a `poolSize` candidate pool;
    * the O(pool²) pairwise cosines and the O(k·pool) greedy loop run
    * on the driver over that bounded pool — the fan-out pattern
    * (bounded-by-construction driver work after a distributed scan).
    * Every arithmetic step is replayable: candidate cosines are the
    * engine's own sequential-fold doubles (collected, never
    * recomputed), the objective is binary64 `λ·q − (1−λ)·m` with the
    * subtraction 1−λ evaluated identically in the SQL oracle's
    * recursive CTE, and the pairwise matrix uses the same CosineSim
    * expression — so selection replays bit-for-bit.
    *
    * @return (rank, idCol, qcos) — the k picks in selection order
    */
  def mmrTopK(
      embs: DataFrame, idCol: String, vecCol: String,
      query: Seq[Float], k: Int, lambda: Double = 0.7,
      poolSize: Int = 30): DataFrame = {
    val spark = embs.sparkSession
    val qcosRows = bruteForceTopK(embs, idCol, vecCol, query, poolSize)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val ids = qcosRows.map(_._1)
    val qcos = qcosRows.toMap
    val pv = embs.filter(col(idCol).isin(ids.map(Long.box): _*))
      .select(col(idCol).as("a_id"), col(vecCol).as("a_v"))
    val pc: Map[(Long, Long), Double] = pv
      .crossJoin(pv.select(col("a_id").as("b_id"), col("a_v").as("b_v")))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        VectorFunctions.cosine(col("a_v"), col("b_v")).as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val mu = 1 - lambda // one binary64 subtraction, mirrored in the oracle
    var picked = Vector.empty[Long]
    while (picked.size < math.min(k, ids.length)) {
      val best = ids.filterNot(picked.contains).map { id =>
        val m = if (picked.isEmpty) 0.0
          else picked.map(s => pc((id, s))).max
        (lambda * qcos(id) - mu * m, id)
      }.minBy { case (s, id) => (-s, id) }
      picked :+= best._2
    }
    import spark.implicits._
    picked.zipWithIndex
      .map { case (id, i) => (i + 1L, id, qcos(id)) }
      .toDF("rank", idCol, "qcos")
  }

  /** Batched exact top-k: for EVERY query in a (small) probe set, the k
    * nearest corpus vectors by cosine — the retrieval shape production
    * pipelines actually run (queries arrive in batches, not one at a
    * time).
    *
    * Scale shape: probe side broadcast, corpus side streamed ONE pass;
    * per-query top-k accumulates in [[graft.functions.TopKByScore]] — a
    * bounded typed Aggregator whose map-side partial keeps at most k
    * candidates per (query, partition), so the only shuffle is
    * k·partitions rows per query. The window-function formulation
    * (row_number over partitionBy(query)) would shuffle ALL n×q scored
    * rows to the reducers first — wrong at 100 TB.
    *
    * @return (q_id, rank, id, cos) with rank 1..k per query
    */
  def batchTopK(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      probes: DataFrame, probeId: String, probeVec: String,
      k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    corpus.crossJoin(broadcast(probes.select(col(probeId).as("q_id"),
        col(probeVec).as("__qv"))))
      .select(col("q_id"),
        VectorFunctions.cosine(col(corpusVec), col("__qv")).as("score"),
        col(corpusId).cast("long").as("id"))
      .groupBy(col("q_id"))
      // the udaf takes the ScoredId FIELDS as its argument list
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("rank", "s")))
      .select(col("q_id"), (col("rank") + 1).cast("long").as("rank"),
        col("s.id").as(corpusId), col("s.score").as("cos"))
  }

  /** Retrieval-quality evaluation — recall@k and MRR of a candidate
    * retrieval run against exact gold top-k, the metric pass every ANN
    * index deployment needs before trading recall for speed. Inputs are
    * ranked result sets (q_id, rank, vec_id); output per query:
    * n_hits (|retrieved ∩ truth|), recall_ppm (n_hits·10^6 div k) and
    * mrr_ppm (10^6 div first hit rank; 0 when nothing relevant was
    * retrieved). Integer-exact by construction — both metrics are one
    * integer division, so a second engine replays them bit-for-bit.
    *
    * Scale shape: both inputs are k·|queries| rows (the corpus scan
    * already happened inside the searchers), so the join is tiny; the
    * output row set is the UNION of truth-side and retrieved-side query
    * ids, so a probe whose searcher returned ZERO rows still surfaces as
    * a recall_ppm=0 row (basing rows on `retrieved` alone would silently
    * drop empty retrievals and overstate the index). */
  def evalRetrieval(retrieved: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    val r = retrieved.select(col("q_id"), col("rank"), col("vec_id")).alias("r")
    val t = truth.select(col("q_id"), col("vec_id")).alias("t")
    val hits = r
      .join(t, col("r.q_id") === col("t.q_id") &&
        col("r.vec_id") === col("t.vec_id"))
      .groupBy(col("r.q_id").as("q_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("r.rank")).as("__fh"))
    truth.select(col("q_id")).union(retrieved.select(col("q_id"))).distinct()
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        expr(s"CAST(coalesce(n_hits, 0) * 1000000 div $k AS BIGINT)")
          .as("recall_ppm"),
        expr("CAST(CASE WHEN __fh IS NULL THEN 0 " +
          "ELSE 1000000 div __fh END AS BIGINT)").as("mrr_ppm"))
  }

  /** Hard-negative mining for contrastive training: for every probe, the
    * k corpus vectors MOST similar to it whose label differs — close
    * enough to be confusing, wrong by label, exactly the negatives a
    * contrastive loss wants.
    *
    * Same scale shape as [[batchTopK]] (one corpus pass, broadcast
    * probes, bounded map-side top-k partials); the label-mismatch filter
    * runs per scored pair BEFORE aggregation, so exactness doesn't
    * depend on an over-retrieve margin the way "top-(k+m) then filter"
    * post-processing would.
    *
    * @return (q_id, rank, id, cos) with rank 1..k per probe, negatives only
    */
  def hardNegatives(
      corpus: DataFrame, corpusId: String, corpusVec: String,
      corpusLabel: String,
      probes: DataFrame, probeId: String, probeVec: String,
      probeLabel: String, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    corpus.crossJoin(broadcast(probes.select(col(probeId).as("q_id"),
        col(probeVec).as("__qv"), col(probeLabel).as("__ql"))))
      .filter(col(corpusLabel) =!= col("__ql"))
      .select(col("q_id"),
        VectorFunctions.cosine(col(corpusVec), col("__qv")).as("score"),
        col(corpusId).cast("long").as("id"))
      .groupBy(col("q_id"))
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("rank", "s")))
      .select(col("q_id"), (col("rank") + 1).cast("long").as("rank"),
        col("s.id").as(corpusId), col("s.score").as("cos"))
  }

  /** Compressed-domain near-duplicate SEARCH: top-k corpus docs per probe
    * by SimHash Hamming distance, candidates blocked on the d03 chunk rule
    * (4 × 16-bit signature chunks; any pair at Hamming ≤ 3 shares at least
    * one chunk, so results within that radius are exhaustive — farther
    * candidates surface only when they collide on a chunk, the standard
    * banding trade). The whole searcher runs on 8-byte signatures — the
    * "which shard of a 100 TB corpus should even be read" primitive.
    *
    * Scale shape: both sides explode into (chunk, value) postings and
    * equi-join — never a cross join; per-posting corpus lists are capped
    * at `chunkCap` by deterministic min-id election (same rule as
    * [[graft.operators.Dedup.simhashPairs]], replayable in SQL). A pair
    * colliding on several chunks is kept only at its FIRST matching chunk
    * — a pure expression on the two signatures, so no distinct pass ever
    * shuffles the candidate set. Ranking is the bounded
    * [[graft.functions.TopKByScore]] heap keyed by the probe: map-side
    * partials keep ≤ k rows per probe per partition (score = −hamming,
    * ties broken by corpus id — Hamming is an exact small integer in
    * DOUBLE, so the heap order replays).
    *
    * @return (q_id, rank, doc_id, hamming), rank 1..k per probe
    */
  def hammingTopK(corpus: DataFrame, corpusId: String,
      probes: DataFrame, probeId: String, textCol: String,
      k: Int, chunkCap: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val topk = udaf(new graft.functions.TopKByScore(k))
    def chunked(df: DataFrame, id: String, outId: String, outSig: String) =
      df.select(col(id).cast("long").as(outId),
          graft.operators.Dedup.simhash(col(textCol)).as(outSig))
        .withColumn("chunk", explode(transform(sequence(lit(0), lit(3)),
          c => struct(c.as("c"),
            call_function("shiftright", col(outSig), c * 16)
              .bitwiseAND(0xFFFFL).as("v")))))
    val cch = chunked(corpus, corpusId, "cid", "csig")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("chunk")).orderBy(col("cid"))))
      .filter(col("rk") <= chunkCap).drop("rk")
    val pch = chunked(probes, probeId, "pid", "psig")
    val x = col("psig").bitwiseXOR(col("csig"))
    // first chunk index where the signatures agree — dedupes multi-chunk
    // collisions without a distinct
    val firstMatch =
      when(x.bitwiseAND(0xFFFFL) === 0, 0)
        .when(call_function("shiftright", x, lit(16)).bitwiseAND(0xFFFFL) === 0, 1)
        .when(call_function("shiftright", x, lit(32)).bitwiseAND(0xFFFFL) === 0, 2)
        .otherwise(3)
    pch.join(cch, Seq("chunk"))
      .filter(col("pid") =!= col("cid") && col("chunk.c") === firstMatch)
      .select(col("pid").as("q_id"),
        (-bit_count(x).cast("double")).as("score"), col("cid").as("id"))
      .groupBy(col("q_id"))
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("rank", "s")))
      .select(col("q_id"), (col("rank") + 1).cast("long").as("rank"),
        col("s.id").as("doc_id"),
        (-col("s.score")).cast("long").as("hamming"))
  }
}
