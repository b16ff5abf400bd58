package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Cdc, Dedup, Graph, Layout, MediaCodecColumns, Multimodal, Packing, Quota, RangeJoin, Retrieval, Similarity, Stats, TextAnalysis}
import graft.sources.Tables

/** Training-data-pipeline operators (dedup, similarity, text analysis,
  * multimodal) as verifiable QuerySpecs over the `documents` and
  * `embeddings` fixtures. The hash-based operators are fully
  * oracle-checked via md5-derived hashing: d02 derives every base
  * MinHash from md5(shingle) (only the post-signature band hash uses
  * xxhash64, which both engines share), d03 rebuilds every SimHash
  * signature from md5(token) halves (SimHashFns.tokenHash), and
  * d05/s02 rebuild their sign-bit LSH planes in SQL
  * (see [[LshBucketCte]]).
  */
object PipelineQueries {

  /** Stopword list rendered as a DuckDB array literal. */
  private def sqlList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("[", ",", "]")

  /** The p22 oracle's unrolled Hilbert fold: 8 chained CTEs h1..h8, one
    * per bit plane s = 128 … 1, each computing the next (hd, hx, hy)
    * from the previous level — the exact recurrence of
    * functions/Hilbert.scala `HilbertIndex.compute` (quadrant id
    * (3·rx)^ry written as nested CASE; reflect-and-transpose arms
    * merged into one CASE per coordinate). Column references inside
    * each level bind to the PREVIOUS cte's columns (standard SQL
    * scoping; DuckDB's lateral aliases only apply to otherwise-
    * unresolvable names). */
  private val hilbertCtes: String =
    (7 to 0 by -1).map { i =>
      val s = 1 << i
      val k = 8 - i
      s"""
      h$k AS (
        SELECT event_id, u8, d8,
          hd + ${s * s} * (CASE
            WHEN (hx & $s) > 0 THEN
              (CASE WHEN (hy & $s) > 0 THEN 2 ELSE 3 END)
            ELSE (CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END) END) AS hd,
          CASE WHEN (hy & $s) > 0 THEN hx
               WHEN (hx & $s) > 0 THEN ${s - 1} - hy ELSE hy END AS hx,
          CASE WHEN (hy & $s) > 0 THEN hy
               WHEN (hx & $s) > 0 THEN ${s - 1} - hx ELSE hx END AS hy
        FROM h${k - 1})"""
    }.mkString(",")

  /** The p23 oracle's unrolled peel: `rounds` chained (degree, keep,
    * filter) CTE triples — the exact round function of Graph.kCore. */
  private def kCoreCtes(rounds: Int, k: Int): String =
    (1 to rounds).map { i =>
      s"""
      d$i AS MATERIALIZED (SELECT node, count(*) AS deg FROM (
          SELECT a AS node FROM e${i - 1}
          UNION ALL SELECT b FROM e${i - 1}) GROUP BY node),
      k$i AS MATERIALIZED (SELECT node FROM d$i WHERE deg >= $k),
      e$i AS MATERIALIZED (SELECT e.a, e.b FROM e${i - 1} e
        JOIN k$i x ON x.node = e.a JOIN k$i y ON y.node = e.b)"""
    }.mkString(",")

  /** DuckDB CTEs rebuilding VectorNative.planes bit-identically:
    * plane_j(i) = first 52 bits of md5("j_i") / 2^52 - 0.5 (12 planes ×
    * 64 dims, both divisions exact in double). `plane_lists` is one row
    * per plane with the weight list in component order, so the dot
    * product below is the same sequential left fold the JVM kernel runs.
    * Ends with a comma — splice before further CTEs. */
  private val LshBucketCte = """plane_rows AS (
        SELECT j.range AS j, i.range AS i,
          (('0x' || substr(md5(CAST(j.range AS VARCHAR) || '_' ||
            CAST(i.range AS VARCHAR)), 1, 13))::UBIGINT
            / 4503599627370496.0) - 0.5 AS w
        FROM range(12) j, range(64) i),
      plane_lists AS (
        SELECT j, list(w ORDER BY i) AS ws FROM plane_rows GROUP BY j),"""

  /** Bucket accumulator over `plane_lists p` for vector column
    * `c.embedding` — sign bit of each plane dot (>= 0 sets bit j,
    * matching VectorNative.lshBucket). */
  private val LshBucketSum = """sum(CASE WHEN
          list_aggregate(list_transform(list_zip(c.embedding, p.ws),
            x -> CAST(x[1] AS DOUBLE) * x[2]), 'sum') >= 0
          THEN 1 << p.j ELSE 0 END)"""

  /** DuckDB CTE chain rebuilding Dedup.simhashPairs relationally over the
    * planted-dup d03 corpus: signatures as two unsigned 32-bit halves from
    * md5(token) (SimHashFns.tokenHash derivation), equal signatures
    * collapsed to min-id star pairs, rep pairs at hamming <= 3. Shared by
    * the d03 (pairs) and d07 (connected components) oracles. Ends WITHOUT
    * a comma — splice as `WITH $SimhashPairCtes` or append further CTEs. */
  private val SimhashPairCtes = """base AS (SELECT doc_id, text FROM documents),
      planted AS (
        SELECT doc_id + 100000 AS doc_id,
          array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1,
            greatest(len(string_split_regex(trim(text), '\s+')) - 2, 1)), ' ')
            AS text
        FROM base WHERE doc_id < 25),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL SELECT doc_id, text FROM planted),
      toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        FROM corpus),
      th AS (
        SELECT doc_id,
          ('0x' || substr(md5(t), 1, 8))::UBIGINT AS hi,
          ('0x' || substr(md5(t), 9, 8))::UBIGINT AS lo
        FROM toks),
      bits AS (
        SELECT doc_id, j.range AS j,
          sum(CASE WHEN
            ((CASE WHEN j.range < 32 THEN lo >> j.range
                   ELSE hi >> (j.range - 32) END) & 1) = 1
            THEN 1 ELSE -1 END) AS c
        FROM th, range(64) j
        GROUP BY doc_id, j.range),
      sigs AS (
        SELECT doc_id AS id,
          CAST(sum(CASE WHEN c >= 0 AND j >= 32
            THEN (1::UBIGINT << CAST(j - 32 AS INTEGER)) ELSE 0 END)
            AS UBIGINT) AS sig_hi,
          CAST(sum(CASE WHEN c >= 0 AND j < 32
            THEN (1::UBIGINT << CAST(j AS INTEGER)) ELSE 0 END)
            AS UBIGINT) AS sig_lo
        FROM bits GROUP BY doc_id),
      reps AS (
        SELECT sig_hi, sig_lo, min(id) AS rep
        FROM sigs GROUP BY sig_hi, sig_lo),
      star AS (
        SELECT r.rep AS id_a, s.id AS id_b, 0 AS hamming
        FROM sigs s JOIN reps r USING (sig_hi, sig_lo)
        WHERE s.id <> r.rep),
      rep_pairs AS (
        SELECT a.rep AS id_a, b.rep AS id_b,
          bit_count(xor(a.sig_hi, b.sig_hi)) +
          bit_count(xor(a.sig_lo, b.sig_lo)) AS hamming
        FROM reps a JOIN reps b ON a.rep < b.rep
        WHERE bit_count(xor(a.sig_hi, b.sig_hi)) +
              bit_count(xor(a.sig_lo, b.sig_lo)) <= 3)"""

  /** Shared by d06 (broadcast semi-join) and d10 (Bloom pre-filter +
    * exact verify): the two operators are bit-identical by construction,
    * so one relational recomputation oracles both. */
  private val DecontaminationOracle = """
      WITH base AS (SELECT doc_id, text FROM documents),
      eval_docs AS (SELECT doc_id, text FROM base WHERE doc_id < 20),
      planted AS (
        SELECT doc_id + 100000 AS doc_id,
          array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1,
            greatest(len(string_split_regex(trim(text), '\s+')) - 5, 1)), ' ')
            AS text
        FROM eval_docs),
      train AS (
        SELECT doc_id, text FROM base WHERE doc_id >= 20
        UNION ALL SELECT doc_id, text FROM planted),
      eval_grams AS (
        SELECT DISTINCT
          unnest(list_transform(
            generate_series(1, greatest(len(t) - 8, 0) + 1),
            i -> array_to_string(list_slice(t, i, i + 7), ' '))) AS g
        FROM (SELECT string_split_regex(trim(text), '\s+') AS t FROM eval_docs)),
      train_grams AS (
        SELECT doc_id,
          unnest(list_transform(
            generate_series(1, greatest(len(t) - 8, 0) + 1),
            i -> array_to_string(list_slice(t, i, i + 7), ' '))) AS g
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
              FROM train))
      SELECT DISTINCT doc_id FROM train_grams
      WHERE g IN (SELECT g FROM eval_grams)
      ORDER BY doc_id"""

  /** DuckDB oracle replaying BPE training (t18/t19) end to end: the
    * word-frequency table, the boundary-wrapped char segmentation, then
    * `iters` UNROLLED stages — each stage argmaxes its own weighted pair
    * counts (count DESC, a, b) and applies that merge with a leftmost-
    * non-overlapping replace whose search/replacement strings come from
    * the stage's own top-1 row via CROSS JOIN (data-dependent, no
    * literals). `select` consumes the final `rep{iters}` / `top{r}`
    * CTEs. */
  /** Train-once memo for the t18/t19 merge table (ingest-time posture;
    * the TrieMap race just trains twice, last-wins — identical result). */
  private val bpeMergeCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Seq[(String, String)]]

  private def learnedBpeMerges(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(String, String)] =
    bpeMergeCache.getOrElseUpdate((graft.SessionKey.of(s), dir),
      TextAnalysis.bpeLearnMerges(
        Tables.load(s, dir, "documents").select(col("text")), "text",
        iters = 12))

  /** DuckDB replay of the BATCHED trainer (TextAnalysis.
    * bpeLearnMergesBatched): per round, rank the top-`candK` pair
    * candidates, run the SAME greedy independence acceptance as a
    * single-row-chain RECURSIVE CTE over the ranked list (the accepted
    * set rides along as a VARCHAR[] of chr(1)-joined pairs), and apply
    * the whole batch with one `list_reduce` replace fold — empty-batch
    * rounds degrade to a no-op because `list_prepend(rep, [])` reduces
    * to rep itself. Training replayed end to end, no literals. */
  private def bpeBatchedOracle(rounds: Int, batchR: Int,
      candK: Int): String = {
    val sb = new StringBuilder
    sb.append(bpeBatchedOracleCore(rounds, batchR, candK))
    val union = (1 to rounds).map(r =>
      s"""SELECT $r AS round, i AS idx,
            string_split(acc[i], chr(1))[1] AS a,
            string_split(acc[i], chr(1))[2] AS b
          FROM (SELECT acc, unnest(generate_series(1, len(acc))) AS i
                FROM batch$r)""").mkString("\n        UNION ALL ")
    sb.append(s"""
      SELECT CAST(row_number() OVER (ORDER BY round, idx) AS BIGINT)
        AS rank, a, b
      FROM ($union)
      ORDER BY rank""")
    sb.toString
  }

  /** The WITH-prefix of [[bpeBatchedOracle]]: batched training replayed
    * through rep$rounds (the final segmentation state) — reusable by
    * oracles that need the TRAINED segmentation rather than the merge
    * table itself (e02's full-pipeline replay). */
  private[queries] def bpeBatchedOracleCore(rounds: Int, batchR: Int,
      candK: Int): String = {
    val sb = new StringBuilder
    sb.append("""
      WITH RECURSIVE w0 AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS wc
        FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
              FROM documents)
        WHERE length(w) >= 1 AND w NOT LIKE '%|%'
        GROUP BY w),
      rep0 AS MATERIALIZED (
        SELECT w, wc,
          '|' || array_to_string(list_transform(
            generate_series(1, length(w)), i -> substr(w, i, 1)), '||')
            || '|' AS rep
        FROM w0)""")
    for (r <- 1 to rounds) {
      val p = r - 1
      sb.append(s""",
      pairs$r AS MATERIALIZED (
        SELECT wc, segs[i] AS a, segs[i + 1] AS b
        FROM (SELECT wc, segs,
                unnest(generate_series(1, len(segs) - 1)) AS i
              FROM (SELECT wc, string_split(substr(rep, 2,
                      length(rep) - 2), '||') AS segs FROM rep$p)
              WHERE len(segs) >= 2)),
      cand$r AS MATERIALIZED (
        SELECT a, b, CAST(row_number() OVER (ORDER BY c DESC, a, b)
          AS BIGINT) AS rn
        FROM (SELECT a, b, sum(wc) AS c FROM pairs$r GROUP BY a, b)
        ORDER BY c DESC, a, b LIMIT $candK),
      sel$r AS (
        SELECT CAST(0 AS BIGINT) AS rn, CAST([] AS VARCHAR[]) AS acc
        UNION ALL
        SELECT c.rn,
          CASE WHEN len(s.acc) >= $batchR THEN s.acc
               WHEN len(list_filter(s.acc, m ->
                   string_split(m, chr(1))[1] IN (c.a, c.b) OR
                   string_split(m, chr(1))[2] IN (c.a, c.b) OR
                   replace(m, chr(1), '') IN (c.a, c.b) OR
                   (c.a || c.b) IN (string_split(m, chr(1))[1],
                                    string_split(m, chr(1))[2]))) > 0
                 THEN s.acc
               ELSE list_append(s.acc, c.a || chr(1) || c.b) END
        FROM sel$r s JOIN cand$r c ON c.rn = s.rn + 1),
      batch$r AS MATERIALIZED (
        SELECT acc FROM sel$r ORDER BY rn DESC LIMIT 1),
      rep$r AS MATERIALIZED (
        SELECT w, wc, list_reduce(list_prepend(rep, b.acc), (accs, m) ->
          replace(accs,
            '|' || string_split(m, chr(1))[1] || '||' ||
              string_split(m, chr(1))[2] || '|',
            '|' || string_split(m, chr(1))[1] ||
              string_split(m, chr(1))[2] || '|')) AS rep
        FROM rep$p CROSS JOIN batch$r b)""")
    }
    sb.toString
  }

  private def bpeOracle(iters: Int, select: String): String = {
    val sb = new StringBuilder
    // every stage CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    // rep_r references rep_{r-1} twice (directly and through top_r), so
    // un-materialized unrolling re-evaluates the chain 2^iters times
    sb.append("""
      WITH w0 AS MATERIALIZED (
        SELECT w, CAST(count(*) AS BIGINT) AS wc
        FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
              FROM documents)
        WHERE length(w) >= 1 AND w NOT LIKE '%|%'
        GROUP BY w),
      rep0 AS MATERIALIZED (
        SELECT w, wc,
          '|' || array_to_string(list_transform(
            generate_series(1, length(w)), i -> substr(w, i, 1)), '||')
            || '|' AS rep
        FROM w0)""")
    for (r <- 1 to iters) {
      val p = r - 1
      sb.append(s""",
      pairs$r AS MATERIALIZED (
        SELECT wc, segs[i] AS a, segs[i + 1] AS b
        FROM (SELECT wc, segs,
                unnest(generate_series(1, len(segs) - 1)) AS i
              FROM (SELECT wc, string_split(substr(rep, 2,
                      length(rep) - 2), '||') AS segs FROM rep$p)
              WHERE len(segs) >= 2)),
      top$r AS MATERIALIZED (
        SELECT a, b FROM (
          SELECT a, b, sum(wc) AS c FROM pairs$r GROUP BY a, b)
        ORDER BY c DESC, a, b LIMIT 1),
      rep$r AS MATERIALIZED (
        -- LEFT JOIN + COALESCE so an exhausted corpus (empty top) is a
        -- no-op round, mirroring bpeLearnMerges' `if (top.nonEmpty)`
        SELECT w, wc, COALESCE(replace(rep, '|' || a || '||' || b || '|',
          '|' || a || b || '|'), rep) AS rep
        FROM rep$p LEFT JOIN top$r ON TRUE)""")
    }
    sb.append(select)
    sb.toString
  }

  /** DuckDB oracle rebuilding the seeded IVF end to end (s03 AND s19 —
    * the persisted variant is result-identical by construction): int8
    * quantization, sampled-points centroids (nlist=16 smallest ids),
    * exact integer squared-L2 assignment + probe selection (nprobe=4,
    * ties → lowest centroid index), exact-cosine scoring of the probed
    * lists. */
  /** DuckDB oracle rebuilding the seeded PQ index end to end (s09 AND
    * s20 — the persisted variant is result-identical by construction):
    * int8 quantization, seeded codebooks (ksub smallest ids), exact
    * integer argmin encode per subspace, ADC via integer dot/norm LUTs,
    * top-100 shortlist, exact-cosine refine. */
  private val SeededPqOracle: String = """
      WITH qq AS (
        SELECT CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
          ELSE list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) AS INTEGER))
          END AS q
        FROM (SELECT embedding, list_aggregate(list_transform(embedding,
                x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
              FROM embeddings WHERE vec_id = 0)),
      cq AS (
        SELECT vec_id,
          CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
          ELSE list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) AS INTEGER))
          END AS q
        FROM (SELECT vec_id, embedding, list_aggregate(list_transform(
                embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
              FROM embeddings WHERE vec_id <> 0)),
      cent AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, q AS cvec
        FROM cq ORDER BY vec_id LIMIT 16),
      subs AS (SELECT unnest(generate_series(0, 7)) AS j),
      asgn AS (
        SELECT vec_id, j, cidx,
          row_number() OVER (PARTITION BY vec_id, j ORDER BY
            list_aggregate(list_transform(list_zip(
              list_slice(c.q, j * 8 + 1, j * 8 + 8),
              list_slice(ct.cvec, j * 8 + 1, j * 8 + 8)),
              x -> CAST(x[1] - x[2] AS BIGINT) * (x[1] - x[2])), 'sum'),
            cidx) AS rn
        FROM cq c, cent ct, subs),
      codes AS (SELECT vec_id, j, cidx AS code FROM asgn WHERE rn = 1),
      lut AS (
        SELECT j, cidx,
          list_aggregate(list_transform(list_zip(
            list_slice(qq.q, j * 8 + 1, j * 8 + 8),
            list_slice(ct.cvec, j * 8 + 1, j * 8 + 8)),
            x -> CAST(x[1] AS BIGINT) * x[2]), 'sum') AS dot,
          list_aggregate(list_transform(
            list_slice(ct.cvec, j * 8 + 1, j * 8 + 8),
            x -> CAST(x AS BIGINT) * x), 'sum') AS nrm
        FROM qq, cent ct, subs),
      qn AS (SELECT list_aggregate(list_transform(q,
               x -> CAST(x AS BIGINT) * x), 'sum') AS qnorm FROM qq),
      adc AS (
        SELECT vec_id,
          CAST(sum(l.dot) AS DOUBLE) /
            (sqrt(CAST(sum(l.nrm) AS DOUBLE)) *
             sqrt(CAST(qn.qnorm AS DOUBLE))) AS adc
        FROM codes c JOIN lut l ON c.j = l.j AND c.code = l.cidx, qn
        GROUP BY vec_id, qn.qnorm),
      short AS (
        SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 100),
      refined AS (
        SELECT e.vec_id,
          list_aggregate(list_transform(list_zip(e.embedding, qe.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(e.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(qe.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM embeddings e JOIN short USING (vec_id),
          (SELECT embedding FROM embeddings WHERE vec_id = 0) qe)
      SELECT vec_id, round(cos, 9) AS cos FROM refined
      ORDER BY cos DESC, vec_id LIMIT 20"""

  /** DuckDB oracle for BM25 over the five fixed query terms (s07 AND
    * s21 — the staged index serves the same integers by construction). */
  private val SeededBm25Oracle: String = """
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
      stats AS (
        SELECT count(*) AS n, CAST(sum(len(t)) AS BIGINT) AS tot FROM toks),
      tf AS (
        SELECT doc_id, dl, tok, count(*) AS tf FROM (
          SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS tok
          FROM toks)
        WHERE tok IN ('vector','stream','merge','window','spark')
        GROUP BY doc_id, dl, tok),
      df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      scored AS (
        SELECT tf.doc_id,
          CAST(floor(1000000.0 *
            ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0) *
            (tf.tf * 2.2) /
            (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl /
              (CAST(stats.tot AS DOUBLE) / stats.n)))) AS BIGINT) AS s
        FROM tf JOIN df USING (tok) CROSS JOIN stats)
      SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_micros
      FROM scored GROUP BY doc_id
      ORDER BY score_micros DESC, doc_id LIMIT 20"""

  /** DuckDB oracle rebuilding the seeded IVF×PQ composite end to end
    * (s13 AND s22 — the persisted variant is result-identical by
    * construction): s03's coarse CTEs (cent/asgn/probe/keep) feeding
    * s09's PQ CTEs (codes/lut/adc/short/refined). */
  private val SeededIvfPqOracle: String = """
      WITH qq AS (
        SELECT CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
          ELSE list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) AS INTEGER))
          END AS q
        FROM (SELECT embedding, list_aggregate(list_transform(embedding,
                x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
              FROM embeddings WHERE vec_id = 0)),
      cq AS (
        SELECT vec_id,
          CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
          ELSE list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) AS INTEGER))
          END AS q
        FROM (SELECT vec_id, embedding, list_aggregate(list_transform(
                embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
              FROM embeddings WHERE vec_id <> 0)),
      cent AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, q AS cvec
        FROM cq ORDER BY vec_id LIMIT 16),
      asgn AS (
        SELECT vec_id, cidx,
          row_number() OVER (PARTITION BY vec_id ORDER BY
            list_aggregate(list_transform(list_zip(c.q, ct.cvec),
              x -> CAST(x[1] - x[2] AS BIGINT) * (x[1] - x[2])), 'sum'),
            cidx) AS rn
        FROM cq c, cent ct),
      probe AS (
        SELECT cidx, row_number() OVER (ORDER BY
          list_aggregate(list_transform(list_zip(qq.q, ct.cvec),
            x -> CAST(x[1] - x[2] AS BIGINT) * (x[1] - x[2])), 'sum'),
          cidx) AS rn
        FROM qq, cent ct),
      keep AS (
        SELECT vec_id FROM asgn WHERE rn = 1 AND cidx IN
          (SELECT cidx FROM probe WHERE rn <= 4)),
      subs AS (SELECT unnest(generate_series(0, 7)) AS j),
      pasgn AS (
        SELECT c.vec_id, j, cidx,
          row_number() OVER (PARTITION BY c.vec_id, j ORDER BY
            list_aggregate(list_transform(list_zip(
              list_slice(c.q, j * 8 + 1, j * 8 + 8),
              list_slice(ct.cvec, j * 8 + 1, j * 8 + 8)),
              x -> CAST(x[1] - x[2] AS BIGINT) * (x[1] - x[2])), 'sum'),
            cidx) AS rn
        FROM cq c JOIN keep USING (vec_id), cent ct, subs),
      codes AS (SELECT vec_id, j, cidx AS code FROM pasgn WHERE rn = 1),
      lut AS (
        SELECT j, cidx,
          list_aggregate(list_transform(list_zip(
            list_slice(qq.q, j * 8 + 1, j * 8 + 8),
            list_slice(ct.cvec, j * 8 + 1, j * 8 + 8)),
            x -> CAST(x[1] AS BIGINT) * x[2]), 'sum') AS dot,
          list_aggregate(list_transform(
            list_slice(ct.cvec, j * 8 + 1, j * 8 + 8),
            x -> CAST(x AS BIGINT) * x), 'sum') AS nrm
        FROM qq, cent ct, subs),
      qn AS (SELECT list_aggregate(list_transform(q,
               x -> CAST(x AS BIGINT) * x), 'sum') AS qnorm FROM qq),
      adc AS (
        SELECT vec_id,
          CAST(sum(l.dot) AS DOUBLE) /
            (sqrt(CAST(sum(l.nrm) AS DOUBLE)) *
             sqrt(CAST(qn.qnorm AS DOUBLE))) AS adc
        FROM codes c JOIN lut l ON c.j = l.j AND c.code = l.cidx, qn
        GROUP BY vec_id, qn.qnorm),
      short AS (
        SELECT vec_id FROM adc ORDER BY adc DESC, vec_id LIMIT 50),
      refined AS (
        SELECT e.vec_id,
          list_aggregate(list_transform(list_zip(e.embedding, qe.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(e.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(qe.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM embeddings e JOIN short USING (vec_id),
          (SELECT embedding FROM embeddings WHERE vec_id = 0) qe)
      SELECT vec_id, round(cos, 9) AS cos FROM refined
      ORDER BY cos DESC, vec_id LIMIT 20"""

  private val SeededIvfOracle: String = """
      WITH qq AS (
        SELECT CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
          ELSE list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) AS INTEGER))
          END AS q
        FROM (SELECT embedding, list_aggregate(list_transform(embedding,
                x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
              FROM embeddings WHERE vec_id = 0)),
      cq AS (
        SELECT vec_id,
          CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
          ELSE list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) AS INTEGER))
          END AS q
        FROM (SELECT vec_id, embedding, list_aggregate(list_transform(
                embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
              FROM embeddings WHERE vec_id <> 0)),
      cent AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, q AS cvec
        FROM cq ORDER BY vec_id LIMIT 16),
      asgn AS (
        SELECT vec_id, cidx,
          row_number() OVER (PARTITION BY vec_id ORDER BY
            list_aggregate(list_transform(list_zip(c.q, ct.cvec),
              x -> CAST(x[1] - x[2] AS BIGINT) * (x[1] - x[2])), 'sum'),
            cidx) AS rn
        FROM cq c, cent ct),
      probe AS (
        SELECT cidx, row_number() OVER (ORDER BY
          list_aggregate(list_transform(list_zip(qq.q, ct.cvec),
            x -> CAST(x[1] - x[2] AS BIGINT) * (x[1] - x[2])), 'sum'),
          cidx) AS rn
        FROM qq, cent ct),
      scored AS (
        SELECT e.vec_id,
          list_aggregate(list_transform(list_zip(e.embedding, qe.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(e.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(qe.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM embeddings e
        JOIN (SELECT vec_id FROM asgn WHERE rn = 1 AND cidx IN
                (SELECT cidx FROM probe WHERE rn <= 4)) keep USING (vec_id),
        (SELECT embedding FROM embeddings WHERE vec_id = 0) qe)
      SELECT vec_id, round(cos, 9) AS cos FROM scored
      ORDER BY cos DESC, vec_id LIMIT 20"""

  /** DuckDB oracle rebuilding Dedup.minhashLsh end to end: w=3 shingles
    * over the dropWords=5 planted corpus, base hash = first 8 bytes of
    * md5(shingle) re-centered to a signed 64-bit value, the 64
    * multiply-shift permutations π_p(h) = a_p·h + b_p replayed with the
    * JVM's exact coefficients (rendered below as literals) in HUGEINT
    * arithmetic mod 2^64, signatures as min per permutation, candidates
    * by exact band-slice equality (16 bands × 4 rows), and the Jaccard
    * estimate as agreeing-position fraction — n/64 is a dyadic rational,
    * so the doubles compare exactly. */
  private lazy val MinhashOracle: String = {
    val (as, bs) = graft.functions.MinHashFns.coeffs(64)
    s"""
      WITH base AS (SELECT doc_id, text FROM documents),
      planted AS (
        SELECT doc_id + 100000 AS doc_id,
          array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), 1,
            greatest(len(string_split_regex(trim(text), '\\s+')) - 5, 1)), ' ')
            AS text
        FROM base WHERE doc_id < 25),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL SELECT doc_id, text FROM planted),
      toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM corpus),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(list_transform(
            generate_series(1, greatest(len(t) - 3, 0) + 1),
            i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
          FROM toks)),
      hs AS (
        SELECT doc_id,
          CAST(CASE WHEN hi >= 2147483648
               THEN hi::HUGEINT * 4294967296 + lo - 18446744073709551616
               ELSE hi::HUGEINT * 4294967296 + lo END AS BIGINT) AS h
        FROM (SELECT doc_id,
                ('0x' || substr(md5(s), 1, 8))::UBIGINT AS hi,
                ('0x' || substr(md5(s), 9, 8))::UBIGINT AS lo
              FROM sh)),
      perms AS (
        SELECT p.range AS p,
          (${as.mkString("[", ",", "]")})[CAST(p.range + 1 AS INTEGER)] AS a,
          (${bs.mkString("[", ",", "]")})[CAST(p.range + 1 AS INTEGER)] AS b
        FROM range(64) p),
      minv AS (
        SELECT doc_id, p, min(CAST(
          CASE WHEN m >= 9223372036854775808
               THEN m - 18446744073709551616 ELSE m END AS BIGINT)) AS v
        FROM (SELECT doc_id, p,
                ((a::HUGEINT * h::HUGEINT + b::HUGEINT)
                  % 18446744073709551616 + 18446744073709551616)
                  % 18446744073709551616 AS m
              FROM hs, perms)
        GROUP BY doc_id, p),
      sigs AS (
        SELECT doc_id AS id, list(v ORDER BY p) AS sig
        FROM minv GROUP BY doc_id),
      bandslices AS (
        SELECT id, b.range AS band,
          array_to_string(list_transform(
            list_slice(sig, CAST(b.range * 4 + 1 AS INTEGER),
              CAST(b.range * 4 + 4 AS INTEGER)),
            x -> CAST(x AS VARCHAR)), ',') AS key
        FROM sigs, range(16) b),
      cand AS (
        SELECT DISTINCT a.id AS id_a, bb.id AS id_b
        FROM bandslices a JOIN bandslices bb
          ON a.band = bb.band AND a.key = bb.key AND a.id < bb.id),
      est AS (
        SELECT id_a, id_b,
          len(list_filter(list_zip(sa.sig, sb.sig),
            x -> x[1] = x[2])) / 64.0 AS jaccard
        FROM cand
        JOIN sigs sa ON sa.id = id_a
        JOIN sigs sb ON sb.id = id_b)
      SELECT id_a, id_b, round(jaccard, 6) AS jaccard FROM est
      WHERE jaccard >= 0.5 ORDER BY id_a, id_b"""
  }

  val specs: Seq[QuerySpec] = Seq(

    // ---- Text analysis ------------------------------------------------
    QuerySpec("t01_token_stats", (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          TextAnalysis.wordCount($"text").as("n_words"),
          TextAnalysis.bpeIshTokenCount($"text").as("n_bpeish"))
        .orderBy($"doc_id")
    }, oracle = Some(s"""
      SELECT doc_id,
        len(string_split_regex(trim(text), '\\s+')) AS n_words,
        len(regexp_extract_all(text, '${TextAnalysis.BpeIshPattern}')) AS n_bpeish
      FROM documents ORDER BY doc_id""")),

    QuerySpec("t02_quality_score", (s, dir) => {
      import s.implicits._
      TextAnalysis.qualityFeatures(Tables.load(s, dir, "documents"), $"text")
        .select($"doc_id", $"n_words", round($"mean_word_len", 6).as("mean_word_len"),
          round($"punct_ratio", 6).as("punct_ratio"),
          round($"stopword_ratio", 6).as("stopword_ratio"),
          $"quality_score")
        .orderBy($"doc_id")
    }, oracle = Some(s"""
      WITH f AS (
        SELECT doc_id,
          len(string_split_regex(trim(text), '\\s+')) AS n_words,
          CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
            / len(string_split_regex(trim(text), '\\s+')) AS mean_word_len,
          CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
            / length(text) AS punct_ratio,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
              t -> list_contains(${sqlList(TextAnalysis.Stopwords)}, t))) AS DOUBLE)
            / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio
        FROM documents)
      SELECT doc_id, n_words, round(mean_word_len, 6) AS mean_word_len,
        round(punct_ratio, 6) AS punct_ratio,
        round(stopword_ratio, 6) AS stopword_ratio,
        round(least(1.0, stopword_ratio * 2.0 +
          CASE WHEN n_words >= 50 THEN 0.5 ELSE CAST(n_words AS DOUBLE) / 100.0 END), 6)
          AS quality_score
      FROM f ORDER BY doc_id""")),

    QuerySpec("t03_lang_id", (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", $"lang",
          TextAnalysis.langId($"text").as("lang_detected"))
        .orderBy($"doc_id")
    }, oracle = Some {
      val scoreExprs = TextAnalysis.LangProfiles.map { case (lang, profile) =>
        s"""CAST(len(list_filter(${sqlList(profile)},
           p -> list_contains(toks, p))) AS DOUBLE) / ${profile.size}.0 AS s_$lang"""
      }.mkString(",\n          ")
      val caseArms = TextAnalysis.LangProfiles.map { case (lang, _) =>
        s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
      }.mkString("\n          ")
      val bestExpr = TextAnalysis.LangProfiles
        .map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
      s"""
      WITH t AS (
        SELECT doc_id, lang,
          list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
        FROM documents),
      sc AS (
        SELECT doc_id, lang,
          $scoreExprs
        FROM t),
      b AS (SELECT *, $bestExpr AS best FROM sc)
      SELECT doc_id, lang,
        CASE $caseArms ELSE 'und' END AS lang_detected
      FROM b ORDER BY doc_id"""
    }),

    QuerySpec("t04_fingerprint", (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id", TextAnalysis.fingerprint($"text").as("fp"))
        .orderBy($"doc_id")
    }, oracle = Some("""
      SELECT doc_id,
        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents ORDER BY doc_id""")),

    // Repetition signals (Gopher-style filters: top-word fraction,
    // duplicate-word fraction) as exact integer counts
    QuerySpec("t05_repetition", (s, dir) => {
      import s.implicits._
      TextAnalysis.repetitionSignals(
          Tables.load(s, dir, "documents"), "doc_id", $"text")
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH words AS (
        SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
        FROM documents),
      wc AS (SELECT doc_id, w, CAST(count(1) AS BIGINT) AS c
             FROM words GROUP BY doc_id, w),
      agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
               CAST(count(1) AS BIGINT) AS n_distinct,
               CAST(max(c) AS BIGINT) AS top_c
              FROM wc GROUP BY doc_id)
      SELECT a.doc_id, a.n_words, a.n_distinct, a.top_c,
        min(wc.w) AS top_word
      FROM agg a JOIN wc ON wc.doc_id = a.doc_id AND wc.c = a.top_c
      GROUP BY a.doc_id, a.n_words, a.n_distinct, a.top_c
      ORDER BY a.doc_id""")),

    // Deterministic mixture sampling: per-source keep rates via a hash
    // threshold — the exact rows are engine-independent (md5 hex compare),
    // so the oracle recomputes the same sample relationally
    QuerySpec("t06_hash_sample", (s, dir) => {
      import s.implicits._
      TextAnalysis.hashSample(
          Tables.load(s, dir, "documents").select($"doc_id", $"source"),
          "doc_id", "source",
          rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
          salt = "mix1")
        .orderBy($"doc_id")
    }, oracle = Some("""
      SELECT doc_id, source FROM documents
      WHERE substring(md5('mix1:' || CAST(doc_id AS STRING)), 1, 2) <
        CASE source WHEN 'src0' THEN 'zz' WHEN 'src1' THEN '80'
                    WHEN 'src2' THEN '40' ELSE '00' END
      ORDER BY doc_id""")),

    // Corpus heavy hitters: top-50 word bigrams by DOCUMENT frequency
    // (per-doc distinct shingles, the d02 kernel reused). Scale shape:
    // map-side partial count on the exploded grams, then
    // TakeOrderedAndProject — no global sort ever materializes the full
    // frequency table.
    QuerySpec("t09_top_ngrams", (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select(explode(Dedup.shingles($"text", 2)).as("gram"))
        .groupBy($"gram").agg(count(lit(1)).as("df"))
        .orderBy($"df".desc, $"gram").limit(50)
    }, oracle = Some("""
      WITH grams AS (
        SELECT DISTINCT doc_id,
          unnest(list_transform(
            generate_series(1, greatest(len(string_split_regex(trim(text),
              '\s+')) - 2, 0) + 1),
            i -> array_to_string(list_slice(string_split_regex(trim(text),
              '\s+'), i, i + 1), ' '))) AS gram
        FROM documents)
      SELECT gram, count(*) AS df FROM grams
      GROUP BY gram ORDER BY df DESC, gram LIMIT 50"""), bench = true),

    // Text normalization: NFC (custom codegen'd expression — Spark has
    // no built-in) → lowercase → collapse whitespace → trim, emitted as
    // (length, md5) so the oracle pins the exact cleaned bytes. The
    // fixtures are pure ASCII (NFC = identity there); the Unicode
    // composition path is pinned by NormalizeSpec against
    // composed/decomposed literals.
    QuerySpec("t10_normalize", (s, dir) => {
      import s.implicits._
      val clean = trim(regexp_replace(
        lower(graft.functions.Normalize.nfc($"text")), "\\s+", " "))
      Tables.load(s, dir, "documents")
        .select($"doc_id", clean.as("c"))
        .select($"doc_id", length($"c").cast("long").as("clean_len"),
          md5($"c").as("clean_md5"))
        .orderBy($"doc_id")
    }, oracle = Some("""
      SELECT doc_id, CAST(length(c) AS BIGINT) AS clean_len,
        md5(c) AS clean_md5
      FROM (SELECT doc_id,
          trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ', 'g'))
            AS c
        FROM documents)
      ORDER BY doc_id""")),

    // Flesch reading-ease readability — the classic rule-based quality
    // band (syllables ~ vowel runs, the standard heuristic). Counts are
    // regexp-exact integers shared with the oracle; the score's float
    // tree is mirrored literally and quantized to micros, so it
    // hash-matches without rounding tolerance.
    QuerySpec("t12_readability", (s, dir) => {
      import s.implicits._
      val w = size(TextAnalysis.tokens($"text")).cast("long")
      val sents = greatest(
        size(regexp_extract_all($"text", lit("[.!?]+"), lit(0))).cast("long"),
        lit(1L))
      val syl = size(regexp_extract_all(lower($"text"), lit("[aeiouy]+"),
        lit(0))).cast("long")
      Tables.load(s, dir, "documents")
        .select($"doc_id", w.as("n_words"), sents.as("n_sentences"),
          syl.as("n_syllables"))
        .withColumn("flesch_micros",
          floor(lit(1000000.0) * (lit(206.835)
            - lit(1.015) * (col("n_words").cast("double")
              / col("n_sentences").cast("double"))
            - lit(84.6) * (col("n_syllables").cast("double")
              / col("n_words").cast("double")))).cast("long"))
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH counted AS (
        SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
            AS n_words,
          greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT),
            1) AS n_sentences,
          CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
            AS n_syllables
        FROM documents)
      SELECT doc_id, n_words, n_sentences, n_syllables,
        CAST(floor(1000000.0 * (206.835
          - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
          - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))))
          AS BIGINT) AS flesch_micros
      FROM counted ORDER BY doc_id""")),

    // Gopher hard-rule quality gate (TextAnalysis.gopherFlags): every
    // rule an exact-integer cross-multiplication, so the booleans are
    // engine-independent. Zero shuffle.
    QuerySpec("t13_gopher_rules", (s, dir) => {
      import s.implicits._
      TextAnalysis.gopherFlags(
          Tables.load(s, dir, "documents").select($"doc_id", $"text"), $"text")
        .drop("text")
        .orderBy($"doc_id")
    }, oracle = Some(s"""
      WITH f AS (
        SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
            AS n_words,
          CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS BIGINT)
            AS chars_no_ws,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS alpha_words,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
            t -> list_contains(${sqlList(TextAnalysis.Stopwords)}, t)))
            AS BIGINT) AS n_stopwords
        FROM documents)
      SELECT doc_id, n_words, chars_no_ws, alpha_words, n_stopwords,
        (n_words >= 50 AND n_words <= 100000) AS flag_n_words,
        (chars_no_ws >= n_words * 3 AND chars_no_ws <= n_words * 10)
          AS flag_word_len,
        (alpha_words * 5 > n_words * 4) AS flag_alpha,
        (n_stopwords >= 2) AS flag_stopwords,
        ((n_words >= 50 AND n_words <= 100000) AND
         (chars_no_ws >= n_words * 3 AND chars_no_ws <= n_words * 10) AND
         (alpha_words * 5 > n_words * 4) AND (n_stopwords >= 2)) AS keep
      FROM f ORDER BY doc_id""")),

    // Deterministic stratified train/valid/test split
    // (TextAnalysis.stratifiedSplit): md5-threshold assignment hashed
    // within the source stratum; reproducible on any engine, stable
    // under appends/repartitioning. Zero shuffle.
    QuerySpec("p08_stratified_split", (s, dir) => {
      import s.implicits._
      TextAnalysis.stratifiedSplit(
          Tables.load(s, dir, "documents").select($"doc_id", $"source"),
          "doc_id", "source", salt = "split1")
        .orderBy($"doc_id")
    }, oracle = Some("""
      SELECT doc_id, source,
        CASE WHEN ('0x' || substr(md5('split1:' || source || ':' ||
            CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER < 52429 THEN 'train'
          WHEN ('0x' || substr(md5('split1:' || source || ':' ||
            CAST(doc_id AS VARCHAR)), 1, 4))::INTEGER < 58982 THEN 'valid'
          ELSE 'test' END AS split
      FROM documents ORDER BY doc_id""")),

    // Corpus-wide BPE pair statistics (TextAnalysis.bpePairStats): the
    // counting scan of one byte-pair-encoding training iteration.
    // Exact-integer counts, deterministic (count DESC, pair ASC) top-N.
    QuerySpec("t14_bpe_pair_stats", (s, dir) => {
      TextAnalysis.bpePairStats(
        Tables.load(s, dir, "documents").select(col("text")), "text", 200)
    }, oracle = Some("""
      WITH toks AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents),
      pairs AS (
        SELECT substr(tok, i, 2) AS pair
        FROM (SELECT tok, unnest(generate_series(1, length(tok) - 1)) AS i
              FROM toks)),
      cnt AS (SELECT pair, CAST(count(*) AS BIGINT) AS c
              FROM pairs GROUP BY pair)
      SELECT pair, c FROM cnt ORDER BY c DESC, pair LIMIT 200""")),

    // TF-IDF keyword extraction (TextAnalysis.tfidfTopTerms): top-5
    // terms per doc by tf × smoothed-idf. idf quantizes to integer
    // micros straight off LnLibm (= DuckDB's ln), so scores and ranks
    // replay exactly.
    QuerySpec("t15_tfidf_terms", (s, dir) => {
      import s.implicits._
      TextAnalysis.tfidfTopTerms(
          Tables.load(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text", topK = 5)
        .orderBy($"doc_id", $"rank")
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf
             FROM toks GROUP BY doc_id, term),
      nn AS (SELECT count(*) AS n FROM documents),
      idf AS (
        SELECT term, CAST(floor(1000000.0 *
          ln((nn.n + 1.0) / (count(*) + 1.0))) AS BIGINT) AS idf_micros
        FROM tf CROSS JOIN nn GROUP BY term, nn.n),
      sc AS (
        SELECT doc_id, term, tf, tf * idf_micros AS score_micros
        FROM tf JOIN idf USING (term)),
      r AS (
        SELECT doc_id, term, tf, score_micros,
          row_number() OVER (PARTITION BY doc_id
                             ORDER BY score_micros DESC, term) AS rank
        FROM sc)
      SELECT doc_id, CAST(rank AS BIGINT) AS rank, term,
        CAST(tf AS BIGINT) AS tf, CAST(score_micros AS BIGINT) AS score_micros
      FROM r WHERE rank <= 5 ORDER BY doc_id, rank""")),

    // BPE tokenizer TRAINING (TextAnalysis.bpeLearnMerges): 12 iterated
    // exact pair-count argmaxes over the word-frequency table (Sennrich
    // ACL'16 — corpus scanned once, iterations run at vocabulary scale).
    // FULL oracle: 12 unrolled CTE stages, each applying its own
    // argmax'd merge via replace() with CROSS JOIN args — training
    // replayed end to end, no literals. Training is memoized per
    // (session, sfDir) — the ingest-time posture: a tokenizer trains
    // once and serves many applies (t19 and the bench's best-of-2 reuse
    // it instead of re-running 12 argmax jobs).
    QuerySpec("t18_bpe_train", (s, dir) => {
      import s.implicits._
      val merges = learnedBpeMerges(s, dir)
      merges.zipWithIndex
        .map { case ((a, b), i) => (i + 1L, a, b) }
        .toDF("rank", "a", "b").orderBy($"rank")
    }, oracle = Some(bpeOracle(12, {
      val union = (1 to 12)
        .map(r => s"SELECT CAST($r AS BIGINT) AS rank, a, b FROM top$r")
        .mkString("\n        UNION ALL ")
      s"""
      SELECT rank, a, b FROM ($union)
      ORDER BY rank"""
    }))),

    // BPE APPLY (TextAnalysis.bpeVocab): segment the corpus with the
    // learned merge table (broadcast as literals in a chain of codegen'd
    // leftmost-non-overlap string replaces — the training semantics
    // exactly, so train-then-apply round-trips) and report the resulting
    // token vocabulary. Completes the tokenizer train/apply verb pair
    // every training-data pipeline ends with.
    QuerySpec("t19_bpe_apply", (s, dir) => {
      val docs = Tables.load(s, dir, "documents").select(col("text"))
      TextAnalysis.bpeVocab(docs, "text", learnedBpeMerges(s, dir),
        topN = 100)
    }, oracle = Some(bpeOracle(12, """
      SELECT seg, CAST(sum(wc) AS BIGINT) AS c
      FROM (SELECT wc, unnest(string_split(substr(rep, 2, length(rep) - 2),
              '||')) AS seg
            FROM rep12)
      GROUP BY seg ORDER BY c DESC, seg LIMIT 100"""))),

    // BPE ENCODE (TextAnalysis.bpeEncode): the corpus as token-ID
    // sequences — ids from the frequency-ranked vocabulary, each doc's
    // exact id SEQUENCE pinned by the order-sensitive checksum
    // Σ position·id (exact integers), so the oracle verifies the full
    // encoding without shipping id arrays. Word→segmentation and
    // segment→id joins broadcast vocabulary-scale tables.
    QuerySpec("t20_bpe_encode", (s, dir) => {
      import s.implicits._
      TextAnalysis.bpeEncode(
          Tables.load(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text", learnedBpeMerges(s, dir))
        .orderBy($"doc_id")
    }, oracle = Some(bpeOracle(12, """,
      vocab AS MATERIALIZED (
        SELECT seg, sum(wc) AS c
        FROM (SELECT wc, unnest(string_split(substr(rep, 2,
                length(rep) - 2), '||')) AS seg
              FROM rep12)
        GROUP BY seg),
      vids AS (
        SELECT seg, CAST(row_number() OVER (ORDER BY c DESC, seg)
          AS BIGINT) AS tok_id
        FROM vocab),
      wsegs AS MATERIALIZED (
        SELECT w, string_split(substr(rep, 2, length(rep) - 2), '||')
          AS segs
        FROM rep12),
      dwords AS (
        SELECT doc_id, wi, ws[wi] AS w
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS wi
              FROM (SELECT doc_id,
                      string_split_regex(trim(text), '\s+') AS ws
                    FROM documents))
        WHERE length(ws[wi]) >= 1 AND ws[wi] NOT LIKE '%|%'),
      dtoks0 AS (
        SELECT d.doc_id, d.wi, s.segs,
               unnest(generate_series(1, len(s.segs))) AS si
        FROM dwords d JOIN wsegs s USING (w)),
      positioned AS (
        SELECT t.doc_id, v.tok_id,
          row_number() OVER (PARTITION BY t.doc_id ORDER BY t.wi, t.si)
            AS pos
        FROM (SELECT doc_id, wi, si, segs[si] AS seg FROM dtoks0) t
        JOIN vids v USING (seg))
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bpe,
        CAST(sum(pos * tok_id) AS BIGINT) AS id_checksum
      FROM positioned GROUP BY doc_id ORDER BY doc_id"""))),

    // RAG chunking (TextAnalysis.ragChunks): overlapping 64-token
    // windows every 48 tokens — the retrieval-ingestion split. Chunk
    // text is verified by md5 fingerprint (compact result, exact
    // reconstruction check); integer offsets replay directly.
    QuerySpec("t21_rag_chunks", (s, dir) => {
      import s.implicits._
      TextAnalysis.ragChunks(
          Tables.load(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text", window = 64, stride = 48)
        .orderBy($"doc_id", $"chunk_idx")
    }, oracle = Some("""
      WITH base AS (
        SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
              FROM documents)
        WHERE len(tk) >= 1),
      chunks AS (
        SELECT doc_id, tk, n,
          unnest(generate_series(0,
            CAST(greatest(ceil((n - 64) / 48.0), 0) AS BIGINT)))
            AS chunk_idx
        FROM base)
      SELECT doc_id, chunk_idx,
        chunk_idx * 48 AS tok_start,
        CAST(least(64, n - chunk_idx * 48) AS BIGINT) AS n_toks,
        md5(array_to_string(list_slice(tk,
          CAST(chunk_idx * 48 + 1 AS BIGINT),
          CAST(chunk_idx * 48 + least(64, n - chunk_idx * 48) AS BIGINT)),
          ' ')) AS chunk_md5
      FROM chunks ORDER BY doc_id, chunk_idx""")),

    // BPE ENCODE MATERIALIZED (TextAnalysis.bpeEncodeIds +
    // ensureBpeTokensStaged): the corpus as PHYSICAL token-id arrays —
    // t20 proves the encoding by checksum, t22 PRODUCES the dataset a
    // trainer consumes: (doc_id, array<long> token_ids) staged once per
    // (session, sfDir) as a range-partitioned parquet table, the query
    // served FROM the staged files. Every reported scalar derives from
    // the materialized array column (count, Σ position·id, first, last),
    // and the oracle recomputes all four from the source corpus — a
    // wrong id, order, drop, or duplicate anywhere in the arrays breaks
    // at least one of them.
    QuerySpec("t22_bpe_token_ids", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val merges = learnedBpeMerges(s, dir)
      TextAnalysis.ensureBpeTokensStaged(s, dir, docs, "doc_id", "text",
        merges)
      s.table(TextAnalysis.bpeStagedTable(dir, merges))
        .select($"doc_id",
          size($"token_ids").cast("long").as("n_bpe"),
          expr("aggregate(zip_with(sequence(1L, size(token_ids)), " +
            "token_ids, (p, x) -> p * x), 0L, (acc, x) -> acc + x)")
            .as("id_checksum"),
          element_at($"token_ids", 1).as("first_id"),
          element_at($"token_ids", -1).as("last_id"))
        .orderBy($"doc_id")
    }, oracle = Some(bpeOracle(12, """,
      vocab AS MATERIALIZED (
        SELECT seg, sum(wc) AS c
        FROM (SELECT wc, unnest(string_split(substr(rep, 2,
                length(rep) - 2), '||')) AS seg
              FROM rep12)
        GROUP BY seg),
      vids AS (
        SELECT seg, CAST(row_number() OVER (ORDER BY c DESC, seg)
          AS BIGINT) AS tok_id
        FROM vocab),
      wsegs AS MATERIALIZED (
        SELECT w, string_split(substr(rep, 2, length(rep) - 2), '||')
          AS segs
        FROM rep12),
      dwords AS (
        SELECT doc_id, wi, ws[wi] AS w
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS wi
              FROM (SELECT doc_id,
                      string_split_regex(trim(text), '\s+') AS ws
                    FROM documents))
        WHERE length(ws[wi]) >= 1 AND ws[wi] NOT LIKE '%|%'),
      dtoks0 AS (
        SELECT d.doc_id, d.wi, s.segs,
               unnest(generate_series(1, len(s.segs))) AS si
        FROM dwords d JOIN wsegs s USING (w)),
      positioned AS (
        SELECT t.doc_id, v.tok_id,
          row_number() OVER (PARTITION BY t.doc_id ORDER BY t.wi, t.si)
            AS pos
        FROM (SELECT doc_id, wi, si, segs[si] AS seg FROM dtoks0) t
        JOIN vids v USING (seg))
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bpe,
        CAST(sum(pos * tok_id) AS BIGINT) AS id_checksum,
        CAST(arg_min(tok_id, pos) AS BIGINT) AS first_id,
        CAST(arg_max(tok_id, pos) AS BIGINT) AS last_id
      FROM positioned GROUP BY doc_id ORDER BY doc_id"""))),

    // STREAM-LAYOUT COMPACTION (w-family through the streaming side):
    // the encodeIdsBatch contract accumulates one b<id>/ directory per
    // micro-batch (that isolation IS its replay idempotency), so the
    // t22 layout grows a directory per batch — the small-file problem
    // streaming CREATES. compactIngestLayout publishes the whole mixed
    // layout as ONE ManifestTable version behind one atomic pointer
    // swap; the query builds a mixed layout (flat batch ingest + two
    // streamed micro-batches), compacts TWICE (idempotency), require()s
    // the physical outcome (bounded file count, live version present),
    // and serves the table through ManifestTable.read. FULL oracle:
    // the t22 replay — compaction must preserve the encode exactly.
    QuerySpec("w10_stream_layout_compaction", (s, dir) => {
      import s.implicits._
      import graft.engine.ManifestTable
      import graft.streaming.EventsStreaming
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val merges = learnedBpeMerges(s, dir)
      val vocab = TextAnalysis.bpeVocabIds(docs, "text", merges)
        .localCheckpoint()
      val layout = java.nio.file.Files
        .createTempDirectory("graft-w10-layout").toString
      // half the corpus lands as flat batch ingest ...
      TextAnalysis.bpeEncodeIdsWithVocab(
          docs.filter($"doc_id" % 2 === 1), "doc_id", "text", merges, vocab)
        .write.mode("append").parquet(layout)
      // ... the other half as two replay-isolated micro-batch dirs
      EventsStreaming.encodeIdsBatch(s, layout, merges, vocab)(
        docs.filter($"doc_id" % 4 === 0).toDF(), 0L)
      EventsStreaming.encodeIdsBatch(s, layout, merges, vocab)(
        docs.filter($"doc_id" % 4 === 2).toDF(), 1L)
      val root = java.nio.file.Files
        .createTempDirectory("graft-w10-tbl").toString
      EventsStreaming.compactIngestLayout(s, layout, root,
        targetPartitions = 1)
      val files1 = graft.engine.PartitionedManifest.dataFileCount(s, root)
      require(files1 == 1, s"compacted table holds $files1 files")
      val v1 = ManifestTable.currentVersion(root)
      // idempotent re-run: a fresh version of the same rows, old one
      // GC'd behind the pointer — readers never see a mixture
      EventsStreaming.compactIngestLayout(s, layout, root,
        targetPartitions = 1)
      require(ManifestTable.currentVersion(root) != v1,
        "re-run must publish a fresh version behind the pointer")
      ManifestTable.read(s, root)
        .select($"doc_id",
          size($"token_ids").cast("long").as("n_bpe"),
          expr("aggregate(zip_with(sequence(1L, size(token_ids)), " +
            "token_ids, (p, x) -> p * x), 0L, (acc, x) -> acc + x)")
            .as("id_checksum"),
          element_at($"token_ids", 1).as("first_id"),
          element_at($"token_ids", -1).as("last_id"))
        .orderBy($"doc_id")
    }, oracle = Some(bpeOracle(12, """,
      vocab AS MATERIALIZED (
        SELECT seg, sum(wc) AS c
        FROM (SELECT wc, unnest(string_split(substr(rep, 2,
                length(rep) - 2), '||')) AS seg
              FROM rep12)
        GROUP BY seg),
      vids AS (
        SELECT seg, CAST(row_number() OVER (ORDER BY c DESC, seg)
          AS BIGINT) AS tok_id
        FROM vocab),
      wsegs AS MATERIALIZED (
        SELECT w, string_split(substr(rep, 2, length(rep) - 2), '||')
          AS segs
        FROM rep12),
      dwords AS (
        SELECT doc_id, wi, ws[wi] AS w
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS wi
              FROM (SELECT doc_id,
                      string_split_regex(trim(text), '\s+') AS ws
                    FROM documents))
        WHERE length(ws[wi]) >= 1 AND ws[wi] NOT LIKE '%|%'),
      dtoks0 AS (
        SELECT d.doc_id, d.wi, s.segs,
               unnest(generate_series(1, len(s.segs))) AS si
        FROM dwords d JOIN wsegs s USING (w)),
      positioned AS (
        SELECT t.doc_id, v.tok_id,
          row_number() OVER (PARTITION BY t.doc_id ORDER BY t.wi, t.si)
            AS pos
        FROM (SELECT doc_id, wi, si, segs[si] AS seg FROM dtoks0) t
        JOIN vids v USING (seg))
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bpe,
        CAST(sum(pos * tok_id) AS BIGINT) AS id_checksum,
        CAST(arg_min(tok_id, pos) AS BIGINT) AS first_id,
        CAST(arg_max(tok_id, pos) AS BIGINT) AS last_id
      FROM positioned GROUP BY doc_id ORDER BY doc_id""")),
      bench = true),

    // BATCHED BPE training (TextAnalysis.bpeLearnMergesBatched): the
    // scale path past t18's 2-jobs-per-merge loop — each round is ONE
    // pair-count scan accepting up to batchR greedily-independent merges
    // (no shared tokens, no merged-token collisions), so a 32k-vocab
    // tokenizer needs ~vocab/batchR scans, not ~vocab. Counts are
    // frozen per round (documented deviation from strict-sequential;
    // within a round every accepted merge's count is exact and the
    // applications commute). FULL oracle: the same greedy runs as a
    // recursive single-row-chain CTE over the ranked candidates and
    // each batch applies via one list_reduce fold — training replayed
    // end to end, no literals.
    QuerySpec("t23_bpe_train_batched", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"text")
      TextAnalysis.bpeLearnMergesBatched(docs, "text",
          rounds = 4, batchR = 8, candK = 64)
        .zipWithIndex
        .map { case ((a, b), i) => (i + 1L, a, b) }
        .toDF("rank", "a", "b").orderBy($"rank")
    }, oracle = Some(bpeBatchedOracle(rounds = 4, batchR = 8,
      candK = 64))),

    // Tokenizer as a STAGED ARTIFACT (TextAnalysis.ensureBpeMergesStaged
    // + bpeMergesFromStaged): the learned merge table persists as a tiny
    // (rank, a, b) parquet table — the third staged leg after t22's
    // encodings and the s20/s21/s22 indexes — and the query applies the
    // tokenizer READ BACK FROM DISK in application order. Result-
    // identical to t19 by construction (same merges, same replace
    // chain), so it shares t19's full end-to-end oracle; a wrong rank
    // order, lost merge, or mangled pair on the round-trip breaks the
    // vocabulary.
    QuerySpec("t24_bpe_tokenizer_artifact", (s, dir) => {
      val docs = Tables.load(s, dir, "documents").select(col("text"))
      val merges = learnedBpeMerges(s, dir)
      TextAnalysis.ensureBpeMergesStaged(s, dir, merges)
      val fromDisk = TextAnalysis.bpeMergesFromStaged(s,
        TextAnalysis.bpeMergesStagedTable(dir, merges))
      TextAnalysis.bpeVocab(docs, "text", fromDisk, topN = 100)
    }, oracle = Some(bpeOracle(12, """
      SELECT seg, CAST(sum(wc) AS BIGINT) AS c
      FROM (SELECT wc, unnest(string_split(substr(rep, 2, length(rep) - 2),
              '||')) AS seg
            FROM rep12)
      GROUP BY seg ORDER BY c DESC, seg LIMIT 100"""))),

    // Tokenizer-quality EVAL: fertility (tokens/word) and compression
    // (chars/token) per source under the learned 12-merge tokenizer —
    // the metric a pipeline balances multilingual mixtures on.
    // Segmentation at vocabulary scale only (distinct words, broadcast
    // merge map); FULL oracle replays training via the recursive
    // rep-chain (bpeOracle) and re-derives every count and micro-ratio.
    QuerySpec("t28_tokenizer_eval", (s, dir) => {
      import s.implicits._
      val merges = learnedBpeMerges(s, dir)
      TextAnalysis.tokenizerEval(
          Tables.load(s, dir, "documents").select($"source", $"text"),
          "source", "text", merges)
        .orderBy($"source")
    }, oracle = Some(bpeOracle(12, """,
      occ AS (
        SELECT source, w, CAST(count(*) AS BIGINT) AS wc
        FROM (SELECT source,
                unnest(string_split_regex(trim(text), '\s+')) AS w
              FROM documents)
        WHERE length(w) >= 1 AND w NOT LIKE '%|%'
        GROUP BY source, w),
      nseg AS (
        SELECT w, CAST(len(string_split(substr(rep, 2,
          length(rep) - 2), '||')) AS BIGINT) AS nseg
        FROM rep12),
      agg AS (
        SELECT source,
          CAST(sum(o.wc) AS BIGINT) AS n_words,
          CAST(sum(o.wc * length(o.w)) AS BIGINT) AS n_chars,
          CAST(sum(o.wc * n.nseg) AS BIGINT) AS n_bpe
        FROM occ o JOIN nseg n ON o.w = n.w GROUP BY source)
      SELECT source, n_words, n_chars, n_bpe,
        CAST((n_bpe // n_words) * 1000000
          + ((n_bpe % n_words) * 1000000) // n_words AS BIGINT)
          AS fertility_micros,
        CAST((n_chars // n_bpe) * 1000000
          + ((n_chars % n_bpe) * 1000000) // n_bpe AS BIGINT)
          AS chars_per_tok_micros
      FROM agg ORDER BY source""")), bench = true),

    // PRODUCTION-VOCABULARY BPE ENCODE (bpeLearnMergesToTarget +
    // bpeEncode): train a ≥32k-merge tokenizer and encode the corpus —
    // the scale the t18–t24 pipeline previously could not reach, now
    // constant-depth end to end (BpeSegment carries the whole merge
    // table as one broadcast rank map; no stage's plan grows with the
    // vocabulary). The corpus derives 40 hash-words per doc from doc
    // ids (the documents fixture has a ~31-word vocabulary — far below
    // 32k merge capacity — so both engines derive an identical
    // 16-symbol-alphabet corpus from the same table: 640k chars at 500
    // docs, which empirically yields ~0.1 merge rules per char, i.e.
    // comfortably past the 33k target) and trains on a bounded 500-doc
    // slice (constant training cost at any sf), session-cached like
    // the s19–s22 index stagers.
    //
    // Oracle decomposition: DuckDB re-derives vocabulary ids (count
    // DESC, seg), per-doc positions, n_bpe, and the order-sensitive
    // Σ position·id checksum ENTIRELY from the raw corpus plus the
    // staged (w → segs) map — trusting only the per-word segmentation,
    // which BpeSpec pins exactly against the rank-order chain replay at
    // 33k merges (infeasible to replay as 33k SQL replace stages; the
    // trainer itself is full-oracle-replayed at t23's scale). Every
    // corpus-scale stage — word explode, multiplicity weighting, id
    // ranking, position assignment, per-doc aggregation — is verified
    // independently.
    QuerySpec("t25_bpe_encode_32k", (s, dir) => {
      import s.implicits._
      val corpus = Tables.load(s, dir, "documents")
        .select($"doc_id", expr("concat_ws(' ', transform(" +
          "sequence(0L, 39L), i -> md5(cast(doc_id * 40 + i as string))))")
          .as("text"))
      val merges = TextAnalysis.ensureBpeTargetTrained(s, dir,
        corpus.filter($"doc_id" < 500).select($"text"), "text",
        target = 33000)
      TextAnalysis.ensureWordSegsStaged(s, dir, corpus, "text", merges)
      TextAnalysis.bpeEncodeFromStagedSegs(s, dir, corpus, "doc_id", "text")
        .orderBy($"doc_id")
    }, oracle = Some({
      // the artifact path is BUILT from the same helper the query uses;
      // the table name is DIR-INDEPENDENT (the sfDir lives in the
      // staging tag), so this static oracle string reads the artifact
      // the query just staged at WHATEVER fixture dir verify runs on
      val segsGlob =
        TextAnalysis.stagedArtifactGlob(TextAnalysis.wordSegsStagedTable(""))
      s"""
      WITH wsegs AS (
        SELECT w, segs FROM read_parquet('$segsGlob')),"""} + """
      corpus AS (
        SELECT doc_id, array_to_string(list_transform(
          generate_series(0, 39),
          i -> md5(CAST(doc_id * 40 + i AS VARCHAR))), ' ') AS text
        FROM documents),
      dwords AS (
        SELECT doc_id, wi, ws[wi] AS w
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS wi
              FROM (SELECT doc_id,
                      string_split_regex(trim(text), '\s+') AS ws
                    FROM corpus))
        WHERE length(ws[wi]) >= 1 AND ws[wi] NOT LIKE '%|%'),
      wcount AS (SELECT w, count(*) AS wc FROM dwords GROUP BY w),
      vocab AS (
        SELECT seg, sum(wc) AS c
        FROM (SELECT c.wc, unnest(s.segs) AS seg
              FROM wcount c JOIN wsegs s USING (w))
        GROUP BY seg),
      vids AS (
        SELECT seg, CAST(row_number() OVER (ORDER BY c DESC, seg)
          AS BIGINT) AS tok_id
        FROM vocab),
      dtoks0 AS (
        SELECT d.doc_id, d.wi, s.segs,
               unnest(generate_series(1, len(s.segs))) AS si
        FROM dwords d JOIN wsegs s USING (w)),
      positioned AS (
        SELECT t.doc_id, v.tok_id,
          row_number() OVER (PARTITION BY t.doc_id ORDER BY t.wi, t.si)
            AS pos
        FROM (SELECT doc_id, wi, si, segs[si] AS seg FROM dtoks0) t
        JOIN vids v USING (seg))
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bpe,
        CAST(sum(pos * tok_id) AS BIGINT) AS id_checksum
      FROM positioned GROUP BY doc_id ORDER BY doc_id""")),

    // KMV cardinality sketch (TextAnalysis.kmvDistinctCardinality over
    // 3-gram shingles): distinct-shingle count per source via a k=128
    // k-minimum-values synopsis — the engine-replayable alternative to
    // HLL (approx_count_distinct's sketch can't be oracle-checked; KMV's
    // can, exactly). The KMinLongs Aggregator IS the sketch: bounded
    // map-side partials (k longs/group/partition), merge = KMV union.
    // Estimate = (k-1)·2^64 div u_k, one integer division — the oracle
    // replays sketch, estimate, and the exact count it approximates
    // (~1.2–1.5k distinct shingles/source, so the estimator branch is
    // genuinely exercised).
    QuerySpec("t16_kmv_cardinality", (s, dir) => {
      import s.implicits._
      TextAnalysis.kmvDistinctCardinality(
          Tables.load(s, dir, "documents").select($"source", $"text"),
          "source", Dedup.shingles($"text", 3), k = 128)
        .orderBy($"source")
    }, oracle = Some("""
      WITH toks AS (
        SELECT source, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
      sh AS (
        SELECT DISTINCT source, s FROM (
          SELECT source, unnest(list_transform(
            generate_series(1, greatest(len(t) - 3, 0) + 1),
            i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
          FROM toks)),
      hs AS (SELECT source, ('0x' || substr(md5(s), 1, 16))::UBIGINT AS u
             FROM sh),
      ranked AS (SELECT source, u,
               row_number() OVER (PARTITION BY source ORDER BY u) AS rn
               FROM hs),
      agg AS (SELECT source, count(*) AS nd FROM hs GROUP BY source),
      kth AS (SELECT source, u AS uk FROM ranked WHERE rn = 128)
      SELECT a.source,
        CAST(LEAST(a.nd, 128) AS BIGINT) AS sketch_size,
        CAST(CASE WHEN a.nd < 128 THEN a.nd
             ELSE 127 * CAST('18446744073709551616' AS HUGEINT)
                  // CAST(k.uk AS HUGEINT)
             END AS BIGINT) AS est_distinct,
        CAST(a.nd AS BIGINT) AS exact_distinct
      FROM agg a LEFT JOIN kth k ON a.source = k.source
      ORDER BY a.source""")),

    // Cross-source overlap estimation from KMV sketches
    // (TextAnalysis.kmvSourceOverlap): pairwise shingle-set Jaccard and
    // intersection size for every source pair, computed from the k=128
    // synopses alone (Beyer et al. SIGMOD'07 union-closure estimators) —
    // the "how much does crawl A overlap crawl B" primitive. The oracle
    // replays the per-source k-min lists, the union sketch, the
    // three-way membership count, and both integer estimates exactly;
    // the exact overlap rides along to grade the estimator.
    QuerySpec("t17_kmv_overlap", (s, dir) => {
      import s.implicits._
      TextAnalysis.kmvSourceOverlap(
          Tables.load(s, dir, "documents").select($"source", $"text"),
          "source", Dedup.shingles($"text", 3), k = 128)
        .orderBy($"source_a", $"source_b")
    }, oracle = Some("""
      WITH toks AS (
        SELECT source, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
      sh AS (
        SELECT DISTINCT source, s FROM (
          SELECT source, unnest(list_transform(
            generate_series(1, greatest(len(t) - 3, 0) + 1),
            i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS s
          FROM toks)),
      hs AS (SELECT source, ('0x' || substr(md5(s), 1, 16))::UBIGINT AS u
             FROM sh),
      ranked AS (SELECT source, u,
               row_number() OVER (PARTITION BY source ORDER BY u) AS rn
               FROM hs),
      sk AS (SELECT source, u FROM ranked WHERE rn <= 128),
      srcs AS (SELECT DISTINCT source FROM hs),
      pairs AS (SELECT a.source AS sa, b.source AS sb
                FROM srcs a JOIN srcs b ON a.source < b.source),
      uni AS (
        SELECT p.sa, p.sb, s.u,
               row_number() OVER (PARTITION BY p.sa, p.sb ORDER BY s.u) AS rn
        FROM pairs p
        JOIN (SELECT DISTINCT sa, sb, u FROM (
                SELECT p2.sa, p2.sb, s2.u
                FROM pairs p2 JOIN sk s2
                  ON s2.source = p2.sa OR s2.source = p2.sb)) s
          ON s.sa = p.sa AND s.sb = p.sb),
      l AS (SELECT sa, sb, u FROM uni WHERE rn <= 128),
      lsz AS (SELECT sa, sb, count(*) AS usz FROM l GROUP BY 1, 2),
      inter AS (
        SELECT l.sa, l.sb, count(*) AS ic
        FROM l
        JOIN sk ka ON ka.source = l.sa AND ka.u = l.u
        JOIN sk kb ON kb.source = l.sb AND kb.u = l.u
        GROUP BY 1, 2),
      kth AS (SELECT sa, sb, u AS uk FROM uni WHERE rn = 128),
      ex AS (
        SELECT a.source AS sa, b.source AS sb, count(*) AS xo
        FROM hs a JOIN hs b ON a.u = b.u AND a.source < b.source
        GROUP BY 1, 2)
      SELECT z.sa AS source_a, z.sb AS source_b,
        CAST(z.usz AS BIGINT) AS union_sketch_size,
        CAST(COALESCE(i.ic, 0) * 1000000 // z.usz AS BIGINT) AS jaccard_ppm,
        CAST(COALESCE(i.ic, 0) * (CASE WHEN z.usz < 128 THEN CAST(z.usz AS HUGEINT)
             ELSE 127 * CAST('18446744073709551616' AS HUGEINT) // CAST(k.uk AS HUGEINT) END)
             // z.usz AS BIGINT) AS est_overlap,
        CAST(COALESCE(e.xo, 0) AS BIGINT) AS exact_overlap
      FROM lsz z
      LEFT JOIN inter i ON i.sa = z.sa AND i.sb = z.sb
      LEFT JOIN kth k ON k.sa = z.sa AND k.sb = z.sb
      LEFT JOIN ex e ON e.sa = z.sa AND e.sb = z.sb
      ORDER BY source_a, source_b""")),

    // Temperature-scaled source mixture weights
    // (TextAnalysis.sourceMixtureWeights): alpha = 0.5 sampling weights
    // from per-source token mass; sqrt is IEEE-exact and quantizes to
    // micros before the integer normalization, so ppm weights replay.
    QuerySpec("p10_mixture_weights", (s, dir) => {
      import s.implicits._
      TextAnalysis.sourceMixtureWeights(
          Tables.load(s, dir, "documents").select($"source", $"text"),
          "source", "text")
        .orderBy($"source")
    }, oracle = Some("""
      WITH toks AS (
        SELECT source,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        FROM documents),
      mass AS (SELECT source, CAST(sum(n) AS BIGINT) AS m
               FROM toks GROUP BY source),
      tot AS (SELECT CAST(sum(m) AS BIGINT) AS t FROM mass),
      q AS (
        SELECT source, m,
          CAST(floor(1000000.0 *
            sqrt(CAST(m AS DOUBLE) / CAST(t AS DOUBLE))) AS BIGINT) AS w
        FROM mass CROSS JOIN tot),
      s AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM q)
      SELECT source, m AS n_tokens, w AS w_micros,
        CAST(w * 1000000 // sw AS BIGINT) AS weight_ppm
      FROM q CROSS JOIN s ORDER BY source""")),

    // Bucketed co-located join (BucketedTables.colocatedOrderRevenue):
    // orders and lineitem staged once as bucketBy(o/l_orderkey) twins,
    // then the fact-to-fact join AND the keyed aggregation run with ZERO
    // exchanges (plan-asserted in PlanAuditSpec) — the ingest-time
    // layout that removes the biggest shuffle a 100 TB query has. The
    // oracle replays the same join over the raw parquet.
    QuerySpec("p11_colocated_join", (s, dir) => {
      import s.implicits._
      graft.sources.BucketedTables.colocatedOrderRevenue(s, dir)
        .orderBy($"o_orderkey")
    }, oracle = Some("""
      SELECT o_orderkey, o_orderpriority,
        count(*) AS n_items,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
          AS revenue
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_orderkey, o_orderpriority ORDER BY o_orderkey""")),

    // Z-order layout (Layout.eventsZLayout): Morton interleaving of
    // (user_id, event-day) and the shard each row lands in — the
    // locality-preserving layout that lets BOTH per-user and per-day
    // filters prune files (Delta ZORDER's math). Pure integer
    // bit-twiddling; the oracle replays the mask-spread sequence
    // stage by stage. File-level pruning is plan-asserted in
    // PlanAuditSpec over a partitionBy(shard) write.
    QuerySpec("p12_zorder_layout", (s, dir) => {
      import s.implicits._
      Layout.eventsZLayout(Tables.load(s, dir, "events"), nShards = 16)
        .orderBy($"event_id")
    }, oracle = Some("""
      WITH raw AS (
        SELECT event_id, user_id AS u,
          (epoch_us(ts) // 86400000000) AS d
        FROM events),
      mm AS (
        SELECT min(u) AS umin, max(u) AS umax,
               min(d) AS dmin, max(d) AS dmax
        FROM raw),
      base AS (
        SELECT event_id,
          ((u - umin) * 65535) // greatest(umax - umin, 1) AS u16,
          ((d - dmin) * 65535) // greatest(dmax - dmin, 1) AS d16
        FROM raw CROSS JOIN mm),
      s1 AS (SELECT event_id, u16, d16,
        ((u16 | (u16 << 8)) & 16711935) AS ua,
        ((d16 | (d16 << 8)) & 16711935) AS da FROM base),
      s2 AS (SELECT event_id, u16, d16,
        ((ua | (ua << 4)) & 252645135) AS ub,
        ((da | (da << 4)) & 252645135) AS db FROM s1),
      s3 AS (SELECT event_id, u16, d16,
        ((ub | (ub << 2)) & 858993459) AS uc,
        ((db | (db << 2)) & 858993459) AS dc FROM s2),
      s4 AS (SELECT event_id, u16, d16,
        ((uc | (uc << 1)) & 1431655765) AS us,
        ((dc | (dc << 1)) & 1431655765) AS ds FROM s3),
      fin AS (SELECT event_id, u16, d16, (us | (ds << 1)) AS z FROM s4)
      SELECT event_id, u16, d16, z, (z >> 28) AS shard
      FROM fin ORDER BY event_id""")),

    // Hilbert-curve layout (Layout.eventsHilbertLayout): the strictly-
    // better-locality sibling of p12 — consecutive curve positions are
    // always grid neighbors, so shard ranges are compact blobs with no
    // Z-corner jumps (Delta 3.x OPTIMIZE BY HILBERT's layout). The
    // quadrant fold runs as ONE codegen'd integer loop
    // (functions/Hilbert.scala — a Column-level unroll would grow the
    // expression tree ~5× per round); the oracle unrolls the identical
    // recurrence as an 8-level CTE chain, level by level.
    QuerySpec("p22_hilbert_layout", (s, dir) => {
      import s.implicits._
      Layout.eventsHilbertLayout(Tables.load(s, dir, "events"), nShards = 16)
        .orderBy($"event_id")
    }, oracle = Some(s"""
      WITH raw AS (
        SELECT event_id, user_id AS u,
          (epoch_us(ts) // 86400000000) AS d
        FROM events),
      mm AS (
        SELECT min(u) AS umin, max(u) AS umax,
               min(d) AS dmin, max(d) AS dmax
        FROM raw),
      base AS (
        SELECT event_id,
          ((u - umin) * 255) // greatest(umax - umin, 1) AS u8,
          ((d - dmin) * 255) // greatest(dmax - dmin, 1) AS d8
        FROM raw CROSS JOIN mm),
      h0 AS (SELECT event_id, u8, d8, u8 AS hx, d8 AS hy,
        CAST(0 AS BIGINT) AS hd FROM base),${hilbertCtes}
      SELECT event_id, u8, d8, hd AS h, (hd >> 12) AS shard
      FROM h8 ORDER BY event_id""")),

    // CDC change-feed apply (Cdc.applyLatestWins): events become a keyed
    // I/U/D feed (signup→I, error→D, else U; key spread so inserts land
    // beyond the base key range), folded latest-wins into the customer
    // base. One window over the feed + one full-outer key join — the
    // base never windows; at scale the deduped feed broadcasts. All
    // three origins (base/insert/update) and deletes are exercised at
    // the gate SF.
    QuerySpec("p13_cdc_apply", (s, dir) => {
      import s.implicits._
      val base = Tables.load(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_acctbal")
      val changes = Tables.load(s, dir, "events")
        .select(($"user_id" * 12 + 1).as("c_custkey"),
          when($"event_type" === "signup", "I")
            .when($"event_type" === "error", "D").otherwise("U").as("op"),
          $"ts", $"event_id", $"value".as("c_acctbal"))
      Cdc.applyLatestWins(base, "c_custkey", changes, "op",
          Seq($"ts", $"event_id"),
          Map("c_name" -> lit("cdc_insert")))
        .orderBy($"c_custkey")
    }, oracle = Some("""
      WITH ch AS (
        SELECT user_id * 12 + 1 AS k, value,
          CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D'
               ELSE 'U' END AS op,
          row_number() OVER (PARTITION BY user_id
                             ORDER BY ts DESC, event_id DESC) AS rn
        FROM events),
      lastc AS (SELECT k, value, op FROM ch WHERE rn = 1)
      SELECT coalesce(b.c_custkey, l.k) AS c_custkey,
        CASE WHEN b.c_custkey IS NOT NULL THEN b.c_name
             ELSE 'cdc_insert' END AS c_name,
        CASE WHEN l.op IS NOT NULL THEN l.value
             ELSE b.c_acctbal END AS c_acctbal,
        CASE WHEN l.op IS NULL THEN 'base'
             WHEN b.c_custkey IS NULL THEN 'insert'
             ELSE 'update' END AS origin
      FROM customer b FULL OUTER JOIN lastc l ON b.c_custkey = l.k
      WHERE l.op IS NULL OR l.op <> 'D'
      ORDER BY c_custkey""")),

    // Small-file compaction plan (Layout.compactionPlan): greedy
    // first-fit-in-order binning of a per-partition file inventory to a
    // target output size — the metadata-scale planning pass behind
    // OPTIMIZE/compaction. One window running sum replays it exactly.
    QuerySpec("p15_compaction_plan", (s, dir) => {
      import s.implicits._
      Layout.compactionPlan(
          Tables.load(s, dir, "documents")
            .select($"source", $"doc_id", $"n_chars"),
          "source", "doc_id", "n_chars", targetBytes = 2048L)
        .orderBy($"source", $"doc_id")
    }, oracle = Some("""
      SELECT source, doc_id, n_chars,
        CAST(coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048
          AS BIGINT) AS bin
      FROM documents ORDER BY source, doc_id""")),

    // Deterministic sample quantiles (Stats.hashSampleQuantiles): per
    // event type, p25/p50/p90 of `value` over an md5-threshold ~10%
    // sample — discrete order statistics at integer ranks, so the
    // quantiles are engine-exact (interpolated quantiles and
    // t-digest/KLL sketches never replay; this does).
    QuerySpec("p16_sample_quantiles", (s, dir) => {
      import s.implicits._
      Stats.hashSampleQuantiles(
          Tables.load(s, dir, "events")
            .select($"event_type", $"event_id", $"value"),
          "event_type", "event_id", "value",
          salt = "pq", rateHex = "1a", qs = Seq(25, 50, 90))
        .orderBy($"event_type")
    }, oracle = Some("""
      WITH s AS (
        SELECT event_type, event_id, value FROM events
        WHERE substring(md5('pq:' || CAST(event_id AS VARCHAR)), 1, 2)
          < '1a'),
      r AS (
        SELECT event_type, value,
          row_number() OVER (PARTITION BY event_type
                             ORDER BY value, event_id) AS rn,
          count(*) OVER (PARTITION BY event_type) AS n
        FROM s)
      SELECT event_type, CAST(max(n) AS BIGINT) AS n_sample,
        max(CASE WHEN rn = (n * 25 + 99) // 100 THEN value END) AS p25,
        max(CASE WHEN rn = (n * 50 + 99) // 100 THEN value END) AS p50,
        max(CASE WHEN rn = (n * 90 + 99) // 100 THEN value END) AS p90
      FROM r GROUP BY event_type ORDER BY event_type""")),

    // Table content checksum (Stats.contentChecksum): order-independent
    // Σ md5-row-hash mod 2^64 per segment — the migration-validation
    // primitive (counts catch lost rows; this catches corrupted VALUES,
    // and both engines compute it independently from their own copy).
    // Doubles render through DECIMAL so the canonical row string is
    // engine-identical.
    QuerySpec("p17_content_checksum", (s, dir) => {
      import s.implicits._
      Stats.contentChecksum(
          Tables.load(s, dir, "customer"),
          "c_mktsegment",
          concat_ws("|", $"c_custkey".cast("string"), $"c_name",
            $"c_acctbal".cast("decimal(18,2)").cast("string")))
        .orderBy($"c_mktsegment")
    }, oracle = Some("""
      WITH rows_ AS (
        SELECT c_mktsegment,
          CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||
            CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS row_str
        FROM customer),
      hs AS (
        SELECT c_mktsegment,
          ('0x' || substr(md5(row_str), 1, 16))::UBIGINT::HUGEINT AS h
        FROM rows_),
      agg AS (
        SELECT c_mktsegment, count(*) AS n_rows,
          sum(h) % CAST('18446744073709551616' AS HUGEINT) AS cs
        FROM hs GROUP BY c_mktsegment)
      SELECT c_mktsegment, CAST(n_rows AS BIGINT) AS n_rows,
        CAST(cs // 4294967296 AS BIGINT) AS checksum_hi,
        CAST(cs % 4294967296 AS BIGINT) AS checksum_lo
      FROM agg ORDER BY c_mktsegment""")),

    // Integer-exact PageRank (Graph.pageRankPpm) over the symmetric
    // customer-supplier trade graph (48.5k edges, 1.6k nodes at the gate
    // SF). All-integer update (contrib = rank div outdeg, next = 150000
    // + 850000*sum div 10^6), so ten unrolled iterations replay
    // bit-for-bit in SQL — float PageRank never does (partial-sum order
    // moves the low bits). Iteration shuffles carry (node, long) only,
    // lineage cut per round: the d07 label-propagation posture.
    QuerySpec("p14_pagerank", (s, dir) => {
      import s.implicits._
      val raw = Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey")
        .join(Tables.load(s, dir, "lineitem")
          .select($"l_orderkey", $"l_suppkey"),
          $"o_orderkey" === $"l_orderkey")
        .select($"o_custkey".as("c"), $"l_suppkey".as("s")).distinct()
      val edges = raw
        .select($"c".as("src"), ($"s" + 1000000L).as("dst"))
        .unionByName(raw.select(($"s" + 1000000L).as("src"), $"c".as("dst")))
      Graph.pageRankPpm(edges, iters = 10)
        .select($"node", $"rank_ppm").orderBy($"node")
    }, oracle = Some("""

      WITH raw AS (
        SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      edges AS (
        SELECT c AS src, s + 1000000 AS dst FROM raw
        UNION ALL SELECT s + 1000000 AS src, c AS dst FROM raw),
      deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
      r1 AS (
        SELECT e.dst AS node,
          150000 + (850000 * sum(p.r // d.deg)) // 1000000 AS r
        FROM edges e JOIN r0 p ON p.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst),
      r2 AS (
        SELECT e.dst AS node,
          150000 + (850000 * sum(p.r // d.deg)) // 1000000 AS r
        FROM edges e JOIN r1 p ON p.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst),
      r3 AS (
        SELECT e.dst AS node,
          150000 + (850000 * sum(p.r // d.deg)) // 1000000 AS r
        FROM edges e JOIN r2 p ON p.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst),
      r4 AS (
        SELECT e.dst AS node,
          150000 + (850000 * sum(p.r // d.deg)) // 1000000 AS r
        FROM edges e JOIN r3 p ON p.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst),
      r5 AS (
        SELECT e.dst AS node,
          150000 + (850000 * sum(p.r // d.deg)) // 1000000 AS r
        FROM edges e JOIN r4 p ON p.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst),
      r6 AS (
        SELECT e.dst AS node,
          150000 + (850000 * sum(p.r // d.deg)) // 1000000 AS r
        FROM edges e JOIN r5 p ON p.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst),
      r7 AS (
        SELECT e.dst AS node,
          150000 + (850000 * sum(p.r // d.deg)) // 1000000 AS r
        FROM edges e JOIN r6 p ON p.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst),
      r8 AS (
        SELECT e.dst AS node,
          150000 + (850000 * sum(p.r // d.deg)) // 1000000 AS r
        FROM edges e JOIN r7 p ON p.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst),
      r9 AS (
        SELECT e.dst AS node,
          150000 + (850000 * sum(p.r // d.deg)) // 1000000 AS r
        FROM edges e JOIN r8 p ON p.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst),
      r10 AS (
        SELECT e.dst AS node,
          150000 + (850000 * sum(p.r // d.deg)) // 1000000 AS r
        FROM edges e JOIN r9 p ON p.node = e.src
        JOIN deg d ON d.src = e.src GROUP BY e.dst)
      SELECT node, CAST(r AS BIGINT) AS rank_ppm FROM r10
      ORDER BY node""")),

    // Unigram surprisal quality scoring (TextAnalysis.unigramSurprisal):
    // per-token -ln p quantized to integer micros before any reduction,
    // so the oracle's replay is exact (LnLibm = libm = DuckDB ln).
    QuerySpec("t11_surprisal", (s, dir) => {
      import s.implicits._
      TextAnalysis.unigramSurprisal(
          Tables.load(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text")
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH postings AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
        FROM documents),
      vocab AS (SELECT tok, count(*) AS c FROM postings GROUP BY tok),
      tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM vocab),
      scored AS (
        SELECT doc_id,
          CAST(floor(-1000000.0 *
            ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))) AS BIGINT) AS m
        FROM postings JOIN vocab USING (tok) CROSS JOIN tot),
      agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
          CAST(sum(m) AS BIGINT) AS surprisal_sum_micros
        FROM scored GROUP BY doc_id)
      SELECT doc_id, n_tokens, surprisal_sum_micros,
        CAST(surprisal_sum_micros // n_tokens AS BIGINT)
          AS mean_surprisal_micros
      FROM agg ORDER BY doc_id""")),

    // Conditional bigram-LM quality filter (CCNet head/middle/tail) —
    // add-one-smoothed bigram NLL in integer micros, tercile buckets by
    // the distributed global rank. FULL oracle: DuckDB rebuilds the
    // bigram stream by zipping shifted list slices, replays the same
    // count/smooth/ln/floor arithmetic, and buckets by row_number.
    QuerySpec("t26_bigram_lm_filter", (s, dir) => {
      import s.implicits._
      TextAnalysis.bigramLmBuckets(
          Tables.load(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text")
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
      big AS (
        SELECT doc_id,
          unnest(list_slice(t, 1, len(t) - 1)) AS w1,
          unnest(list_slice(t, 2, len(t))) AS w2
        FROM toks WHERE len(t) >= 2),
      bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
      pc AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
      v AS (SELECT count(DISTINCT tok) AS nv
            FROM (SELECT unnest(t) AS tok FROM toks)),
      sc AS (
        SELECT big.doc_id,
          CAST(floor(-1000000.0 * ln(
            (CAST(c12 AS DOUBLE) + 1.0) /
            (CAST(c1 AS DOUBLE) + CAST(nv AS DOUBLE)))) AS BIGINT) AS m
        FROM big JOIN bc USING (w1, w2) JOIN pc USING (w1) CROSS JOIN v),
      agg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          CAST(sum(m) AS BIGINT) AS nll_sum_micros
        FROM sc GROUP BY doc_id),
      rk AS (
        SELECT doc_id, n_bigrams, nll_sum_micros,
          CAST(nll_sum_micros // n_bigrams AS BIGINT) AS mean_nll_micros,
          row_number() OVER (ORDER BY nll_sum_micros // n_bigrams, doc_id)
            AS rn,
          count(*) OVER () AS n
        FROM agg)
      SELECT doc_id, n_bigrams, nll_sum_micros, mean_nll_micros,
        CASE WHEN 3 * rn <= n THEN 'head'
             WHEN 3 * rn <= 2 * n THEN 'middle' ELSE 'tail' END AS bucket
      FROM rk ORDER BY doc_id"""), bench = true),

    // QUALITY-STAGED CURRICULUM: global training order serving the
    // head tercile first, then middle, then tail, md5-shuffled
    // reproducibly within each stage — t26's buckets composed with the
    // distributed prefix-sum rank (the order a CCNet-filtered corpus is
    // consumed in). FULL oracle: the t26 replay plus one row_number
    // over (stage, md5 key).
    QuerySpec("p29_quality_curriculum", (s, dir) => {
      import s.implicits._
      TextAnalysis.qualityCurriculum(
          Tables.load(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text", seed = "graft-curriculum-0")
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
      big AS (
        SELECT doc_id,
          unnest(list_slice(t, 1, len(t) - 1)) AS w1,
          unnest(list_slice(t, 2, len(t))) AS w2
        FROM toks WHERE len(t) >= 2),
      bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
      pc AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
      v AS (SELECT count(DISTINCT tok) AS nv
            FROM (SELECT unnest(t) AS tok FROM toks)),
      sc AS (
        SELECT big.doc_id,
          CAST(floor(-1000000.0 * ln(
            (CAST(c12 AS DOUBLE) + 1.0) /
            (CAST(c1 AS DOUBLE) + CAST(nv AS DOUBLE)))) AS BIGINT) AS m
        FROM big JOIN bc USING (w1, w2) JOIN pc USING (w1) CROSS JOIN v),
      agg AS (SELECT doc_id, count(*) AS nb, sum(m) AS sm
              FROM sc GROUP BY 1),
      rk AS (
        SELECT doc_id,
          row_number() OVER (ORDER BY sm // nb, doc_id) AS rn,
          count(*) OVER () AS n
        FROM agg),
      bucketed AS (
        SELECT doc_id,
          CASE WHEN 3 * rn <= n THEN 'head'
               WHEN 3 * rn <= 2 * n THEN 'middle' ELSE 'tail' END
            AS bucket,
          CASE WHEN 3 * rn <= n THEN 0
               WHEN 3 * rn <= 2 * n THEN 1 ELSE 2 END AS stage,
          md5('graft-curriculum-0:' || CAST(doc_id AS VARCHAR)) AS k
        FROM rk)
      SELECT doc_id, bucket,
        CAST(row_number() OVER (ORDER BY stage, k, doc_id) - 1 AS BIGINT)
          AS pos
      FROM bucketed ORDER BY doc_id"""), bench = true),

    // The LM quality filter as a FROZEN INGEST ARTIFACT (the CCNet
    // production shape, and t26's staged twin in the s19–s22/t24
    // pattern): pair/prefix counts + vocab size + tercile cut-points
    // persist at ingest; serving scores corpus AND never-seen documents
    // per-row against the frozen tables — unseen pairs smooth through
    // add-one via left joins, buckets are row-local threshold compares.
    // FULL oracle: DuckDB rebuilds the model and cut-points from the
    // raw corpus and replays the left-join smoothing over the same
    // served set (corpus + three planted docs, one partially and one
    // fully out-of-vocabulary).
    QuerySpec("t27_lm_filter_artifact", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      TextAnalysis.ensureBigramLmStaged(s, dir, docs, "doc_id", "text")
      val planted = Seq(
        (900001L, "batch batch batch stream spark window window"),
        (900002L, "spark zzzq table qqqz join the"),
        (900003L, "zzzq qqqz zzzq")).toDF("doc_id", "text")
      TextAnalysis.bigramLmBucketsFromArtifact(s,
          docs.unionByName(planted), "doc_id", "text", dir)
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
      big AS (
        SELECT doc_id,
          unnest(list_slice(t, 1, len(t) - 1)) AS w1,
          unnest(list_slice(t, 2, len(t))) AS w2
        FROM toks WHERE len(t) >= 2),
      bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
      pc AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
      v AS (SELECT count(DISTINCT tok) AS nv
            FROM (SELECT unnest(t) AS tok FROM toks)),
      sc AS (
        SELECT big.doc_id,
          CAST(floor(-1000000.0 * ln(
            (CAST(c12 AS DOUBLE) + 1.0) /
            (CAST(c1 AS DOUBLE) + CAST(nv AS DOUBLE)))) AS BIGINT) AS m
        FROM big JOIN bc USING (w1, w2) JOIN pc USING (w1) CROSS JOIN v),
      agg AS (SELECT doc_id, count(*) AS nb, sum(m) AS sm
              FROM sc GROUP BY 1),
      rk AS (SELECT sm // nb AS mean,
               row_number() OVER (ORDER BY sm // nb, doc_id) AS rn,
               count(*) OVER () AS n
             FROM agg),
      cuts AS (SELECT max(CASE WHEN 3 * rn <= n THEN mean END) AS cut_h,
                      max(CASE WHEN 3 * rn <= 2 * n THEN mean END) AS cut_m
               FROM rk),
      serve AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT 900001,
          'batch batch batch stream spark window window'
        UNION ALL SELECT 900002, 'spark zzzq table qqqz join the'
        UNION ALL SELECT 900003, 'zzzq qqqz zzzq'),
      stoks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM serve),
      sbig AS (
        SELECT doc_id,
          unnest(list_slice(t, 1, len(t) - 1)) AS w1,
          unnest(list_slice(t, 2, len(t))) AS w2
        FROM stoks WHERE len(t) >= 2),
      ssc AS (
        SELECT sbig.doc_id,
          CAST(floor(-1000000.0 * ln(
            (CAST(coalesce(c12, 0) AS DOUBLE) + 1.0) /
            (CAST(coalesce(c1, 0) AS DOUBLE) + CAST(nv AS DOUBLE))))
            AS BIGINT) AS m
        FROM sbig LEFT JOIN bc USING (w1, w2) LEFT JOIN pc USING (w1)
          CROSS JOIN v),
      sagg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          CAST(sum(m) AS BIGINT) AS nll_sum_micros
        FROM ssc GROUP BY doc_id)
      SELECT CAST(doc_id AS BIGINT) AS doc_id, n_bigrams, nll_sum_micros,
        CAST(nll_sum_micros // n_bigrams AS BIGINT) AS mean_nll_micros,
        CASE WHEN nll_sum_micros // n_bigrams <= cut_h THEN 'head'
             WHEN nll_sum_micros // n_bigrams <= cut_m THEN 'middle'
             ELSE 'tail' END AS bucket
      FROM sagg CROSS JOIN cuts ORDER BY doc_id"""), bench = true),

    // Streaming-safe curriculum over the FROZEN t27 artifact (the p29
    // curriculum's production twin): stage from frozen cut-points (row-
    // local), reproducible md5 shuffle key, positions from the
    // distributed rank over (stage, k, id). The oracle replays model,
    // cut-points, serving scores, stage, key, and position entirely
    // from the raw corpus.
    QuerySpec("p30_curriculum_from_artifact", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      TextAnalysis.ensureBigramLmStaged(s, dir, docs, "doc_id", "text")
      val planted = Seq(
        (900001L, "spark zzzq table qqqz join the"),
        (900002L, "zzzq qqqz zzzq")).toDF("doc_id", "text")
      TextAnalysis.curriculumFromArtifact(s, docs.unionByName(planted),
          "doc_id", "text", dir, "cur-v1")
        .orderBy($"pos")
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
      big AS (
        SELECT doc_id,
          unnest(list_slice(t, 1, len(t) - 1)) AS w1,
          unnest(list_slice(t, 2, len(t))) AS w2
        FROM toks WHERE len(t) >= 2),
      bc AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2),
      pc AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
      v AS (SELECT count(DISTINCT tok) AS nv
            FROM (SELECT unnest(t) AS tok FROM toks)),
      sc AS (
        SELECT big.doc_id,
          CAST(floor(-1000000.0 * ln(
            (CAST(c12 AS DOUBLE) + 1.0) /
            (CAST(c1 AS DOUBLE) + CAST(nv AS DOUBLE)))) AS BIGINT) AS m
        FROM big JOIN bc USING (w1, w2) JOIN pc USING (w1) CROSS JOIN v),
      agg AS (SELECT doc_id, count(*) AS nb, sum(m) AS sm
              FROM sc GROUP BY 1),
      rk AS (SELECT sm // nb AS mean,
               row_number() OVER (ORDER BY sm // nb, doc_id) AS rn,
               count(*) OVER () AS n
             FROM agg),
      cuts AS (SELECT max(CASE WHEN 3 * rn <= n THEN mean END) AS cut_h,
                      max(CASE WHEN 3 * rn <= 2 * n THEN mean END) AS cut_m
               FROM rk),
      serve AS (
        SELECT doc_id, text FROM documents
        UNION ALL SELECT 900001, 'spark zzzq table qqqz join the'
        UNION ALL SELECT 900002, 'zzzq qqqz zzzq'),
      stoks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM serve),
      sbig AS (
        SELECT doc_id,
          unnest(list_slice(t, 1, len(t) - 1)) AS w1,
          unnest(list_slice(t, 2, len(t))) AS w2
        FROM stoks WHERE len(t) >= 2),
      ssc AS (
        SELECT sbig.doc_id,
          CAST(floor(-1000000.0 * ln(
            (CAST(coalesce(c12, 0) AS DOUBLE) + 1.0) /
            (CAST(coalesce(c1, 0) AS DOUBLE) + CAST(nv AS DOUBLE))))
            AS BIGINT) AS m
        FROM sbig LEFT JOIN bc USING (w1, w2) LEFT JOIN pc USING (w1)
          CROSS JOIN v),
      sagg AS (SELECT doc_id, count(*) AS nb, sum(m) AS sm
               FROM ssc GROUP BY doc_id),
      assigned AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
          CASE WHEN sm // nb <= cut_h THEN 'head'
               WHEN sm // nb <= cut_m THEN 'middle'
               ELSE 'tail' END AS bucket,
          CASE WHEN sm // nb <= cut_h THEN 0
               WHEN sm // nb <= cut_m THEN 1 ELSE 2 END AS stage,
          md5('cur-v1:' || CAST(doc_id AS VARCHAR)) AS k
        FROM sagg CROSS JOIN cuts)
      SELECT doc_id, bucket,
        CAST(row_number() OVER (ORDER BY stage, k, doc_id) - 1 AS BIGINT)
          AS pos
      FROM assigned ORDER BY pos""")),

    // PII redaction + triage counts over documents with deterministic
    // planted PII (email, IPv4, long digit id appended per doc). The
    // patterns are RE2-compatible so the oracle applies the SAME regex
    // text in DuckDB.
    QuerySpec("t08_pii_redaction", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
        .withColumn("text", concat($"text",
          lit(" reach user"), $"doc_id".cast("string"),
          lit("@example.com at 10.0."), ($"doc_id" % 200).cast("string"),
          lit(".7 ref 900000000"), $"doc_id".cast("string")))
      val (ne, ni, nd) = TextAnalysis.piiCounts($"text")
      docs.select($"doc_id", TextAnalysis.redactPii($"text").as("clean"),
          ne.as("n_email"), ni.as("n_ip"), nd.as("n_digit"))
        .orderBy($"doc_id")
    }, oracle = Some(s"""
      WITH pl AS (
        SELECT doc_id,
          text || ' reach user' || CAST(doc_id AS VARCHAR) ||
            '@example.com at 10.0.' || CAST(doc_id % 200 AS VARCHAR) ||
            '.7 ref 900000000' || CAST(doc_id AS VARCHAR) AS text
        FROM documents)
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(text,
          '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
          '${TextAnalysis.Ipv4Pattern}', '<IP>', 'g'),
          '${TextAnalysis.LongDigitPattern}', '<ID>', 'g') AS clean,
        CAST(len(regexp_extract_all(text,
          '${TextAnalysis.EmailPattern}')) AS BIGINT) AS n_email,
        CAST(len(regexp_extract_all(text,
          '${TextAnalysis.Ipv4Pattern}')) AS BIGINT) AS n_ip,
        CAST(len(regexp_extract_all(
          regexp_replace(regexp_replace(text,
            '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g'),
            '${TextAnalysis.Ipv4Pattern}', '<IP>', 'g'),
          '${TextAnalysis.LongDigitPattern}')) AS BIGINT) AS n_digit
      FROM pl ORDER BY doc_id""")),

    // Winnowing fingerprints (the MOSS rolling-hash scheme): k-gram
    // hashes → per-window minima → sorted distinct set per doc. md5-derived
    // hashes, so the oracle rebuilds every set exactly (k=5, w=4).
    QuerySpec("t07_winnow_fingerprints", (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "documents")
        .select($"doc_id",
          explode(TextAnalysis.winnowFingerprints($"text")).as("fp"))
        .orderBy($"doc_id", $"fp")
    }, oracle = Some(s"""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents),
      grams AS (
        SELECT doc_id, list_transform(
          generate_series(1, greatest(len(t) - 4, 1)),
          i -> array_to_string(list_slice(t, i, i + 4), ' ')) AS g
        FROM toks),
      gh AS (
        SELECT doc_id, list_transform(g, s ->
          CAST(CASE WHEN ('0x' || substr(md5(s), 1, 8))::UBIGINT >= 2147483648
               THEN ('0x' || substr(md5(s), 1, 8))::UBIGINT::HUGEINT * 4294967296
                    + ('0x' || substr(md5(s), 9, 8))::UBIGINT - 18446744073709551616
               ELSE ('0x' || substr(md5(s), 1, 8))::UBIGINT::HUGEINT * 4294967296
                    + ('0x' || substr(md5(s), 9, 8))::UBIGINT END AS BIGINT)) AS h
        FROM grams),
      wins AS (
        SELECT doc_id, list_sort(list_distinct(list_transform(
          generate_series(1, greatest(len(h) - 3, 1)),
          i -> list_aggregate(list_slice(h, i, i + 3), 'min')))) AS fps
        FROM gh)
      SELECT doc_id, unnest(fps) AS fp FROM wins ORDER BY doc_id, fp""")),

    // ---- Deduplication ------------------------------------------------
    // Exact dedup with planted exact copies (doc_id+100000 for doc_id<25).
    QuerySpec("d01_dedup_exact", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val planted = docs.filter($"doc_id" < 25)
        .withColumn("doc_id", $"doc_id" + 100000L)
      Dedup.exact(docs.unionByName(planted), "doc_id", "text")
        .orderBy($"fp")
    }, oracle = Some("""
      SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        count(*) AS n_copies, min(doc_id) AS keep_id
      FROM (SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000, text FROM documents WHERE doc_id < 25)
      GROUP BY fp ORDER BY fp"""), bench = true),

    // MinHash+LSH near-dup against planted perturbed copies — FULL
    // oracle: base hashes derive from md5(shingle) halves, the
    // multiply-shift permutation coefficients (deterministic
    // SplittableRandom stream) are rendered into the SQL as literals, and
    // the wrapping 64-bit arithmetic is replayed in HUGEINT mod 2^64. The
    // oracle forms candidates by EXACT band-slice equality where the
    // operator compares 64-bit band hashes — identical except under an
    // xxhash64 collision between different slices (probability ~2^-64).
    QuerySpec("d02_dedup_minhash_lsh", (s, dir) => {
      import s.implicits._
      val docs = Dedup.withPlantedDups(
        Tables.load(s, dir, "documents").select($"doc_id", $"text"),
        "doc_id", "text", nPlant = 25, idOffset = 100000L, dropWords = 5)
      Dedup.minhashLsh(docs, "doc_id", "text", numPerm = 64, bands = 16,
          threshold = 0.5)
        .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
        .orderBy($"id_a", $"id_b")
    }, oracle = Some(MinhashOracle), bench = true),

    // SimHash near-dup — FULL oracle: the per-token bit source is the
    // first 8 bytes of md5(token) (SimHashFns.tokenHash), so DuckDB
    // rebuilds every signature as two unsigned 32-bit halves, collapses
    // equal signatures to min-id star pairs, and emits distinct-signature
    // rep pairs at hamming <= 3 — exactly the operator's contract (the
    // chunk blocking is lossless by pigeonhole, and no sf0.01 bucket
    // approaches chunkCap, so blocked and all-pairs results coincide).
    QuerySpec("d03_dedup_simhash", (s, dir) => {
      import s.implicits._
      val docs = Dedup.withPlantedDups(
        Tables.load(s, dir, "documents").select($"doc_id", $"text"),
        "doc_id", "text", nPlant = 25, idOffset = 100000L, dropWords = 2)
      Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
        .orderBy($"id_a", $"id_b")
    }, oracle = Some(s"""
      WITH $SimhashPairCtes
      SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM star
      UNION ALL
      SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM rep_pairs
      ORDER BY id_a, id_b""")),

    // Near-dup cluster resolution (keep-one): connected components over
    // the d03 pair graph — cluster = min reachable id, keep = cluster
    // representative. The oracle rebuilds the same pairs (md5-derived
    // signatures) and walks the graph with a recursive CTE, so the
    // iterative Spark label propagation is hash-checked end to end.
    QuerySpec("d07_dup_clusters", (s, dir) => {
      import s.implicits._
      val withDups = Dedup.withPlantedDups(
        Tables.load(s, dir, "documents").select($"doc_id", $"text"),
        "doc_id", "text", nPlant = 25, idOffset = 100000L, dropWords = 2)
      val pairs = Dedup.simhashPairs(withDups, "doc_id", "text", maxHamming = 3)
      Dedup.dupClusters(withDups, pairs, "doc_id").orderBy($"doc_id")
    }, oracle = Some(s"""
      WITH RECURSIVE $SimhashPairCtes,
      pairs AS (
        SELECT id_a, id_b FROM star
        UNION ALL SELECT id_a, id_b FROM rep_pairs),
      edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b AS src, id_a AS dst FROM pairs),
      reach(id, r) AS (
        SELECT doc_id, doc_id FROM corpus
        UNION
        SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id),
      cc AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id)
      SELECT id AS doc_id, CAST(cluster AS BIGINT) AS cluster,
             (id = cluster) AS keep
      FROM cc ORDER BY doc_id""")),

    // Exact-substring dedup (Lee et al. 2022 family): maximal duplicated
    // token spans via positional k-gram frequency — no pairwise join.
    // FULL oracle: gram hashes are md5-derived (SimHashFns.tokenHash), so
    // DuckDB rebuilds every positional hash, the global frequency, and
    // the islands merge relationally (k=8, minTokens=15).
    QuerySpec("d08_substring_dedup", (s, dir) => {
      import s.implicits._
      val docs = Dedup.withPlantedDups(
        Tables.load(s, dir, "documents").select($"doc_id", $"text"),
        "doc_id", "text", nPlant = 25, idOffset = 100000L, dropWords = 5)
      Dedup.substringDupSpans(docs, "doc_id", "text", k = 8, minTokens = 15)
        .orderBy($"doc_id", $"span_start")
    }, oracle = Some(s"""
      WITH base AS (SELECT doc_id, text FROM documents),
      planted AS (
        SELECT doc_id + 100000 AS doc_id,
          array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), 1,
            greatest(len(string_split_regex(trim(text), '\\s+')) - 5, 1)), ' ')
            AS text
        FROM base WHERE doc_id < 25),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL SELECT doc_id, text FROM planted),
      toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM corpus),
      posgrams AS (
        SELECT doc_id, unnest(generate_series(1, greatest(len(t) - 7, 1))) AS i,
          t FROM toks),
      ghv AS (
        SELECT doc_id, i,
          CAST(CASE WHEN ('0x' || substr(md5(g), 1, 8))::UBIGINT >= 2147483648
               THEN ('0x' || substr(md5(g), 1, 8))::UBIGINT::HUGEINT * 4294967296
                    + ('0x' || substr(md5(g), 9, 8))::UBIGINT - 18446744073709551616
               ELSE ('0x' || substr(md5(g), 1, 8))::UBIGINT::HUGEINT * 4294967296
                    + ('0x' || substr(md5(g), 9, 8))::UBIGINT END AS BIGINT) AS gh
        FROM (SELECT doc_id, i,
                array_to_string(list_slice(t, i, i + 7), ' ') AS g
              FROM posgrams)),
      freq AS (SELECT gh, count(*) AS cnt FROM ghv GROUP BY gh),
      dup AS (SELECT doc_id, i FROM ghv JOIN freq USING (gh) WHERE cnt > 1),
      isl AS (
        SELECT doc_id, i,
          i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS island
        FROM dup),
      spans AS (
        SELECT doc_id, CAST(min(i) - 1 AS BIGINT) AS span_start,
          CAST(max(i) - min(i) + 8 AS BIGINT) AS span_tokens
        FROM isl GROUP BY doc_id, island)
      SELECT doc_id, span_start, span_tokens FROM spans
      WHERE span_tokens >= 15 ORDER BY doc_id, span_start"""), bench = true),

    // Keep-one substring dedup APPLY: the cleaned corpus (globally-first
    // occurrence of every duplicated substring survives; interiors of
    // later occurrences are cut, boundary grams keep up to k-1 tokens of
    // slack). FULL oracle: keeper election, coverage and reconstruction
    // replay relationally from the md5-derived gram hashes.
    QuerySpec("d09_substring_dedup_apply", (s, dir) => {
      import s.implicits._
      val docs = Dedup.withPlantedDups(
        Tables.load(s, dir, "documents").select($"doc_id", $"text"),
        "doc_id", "text", nPlant = 25, idOffset = 100000L, dropWords = 5)
      Dedup.substringDedupApply(docs, "doc_id", "text", k = 8)
        .orderBy($"doc_id")
    }, oracle = Some(s"""
      WITH base AS (SELECT doc_id, text FROM documents),
      planted AS (
        SELECT doc_id + 100000 AS doc_id,
          array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), 1,
            greatest(len(string_split_regex(trim(text), '\\s+')) - 5, 1)), ' ')
            AS text
        FROM base WHERE doc_id < 25),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL SELECT doc_id, text FROM planted),
      sized AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t,
          len(string_split_regex(trim(text), '\\s+')) AS n
        FROM corpus),
      posg AS (
        SELECT doc_id, n, t,
          unnest(generate_series(1, greatest(n - 7, 1))) AS i
        FROM sized),
      ghv AS (
        SELECT doc_id, n, i,
          CAST(CASE WHEN ('0x' || substr(md5(g), 1, 8))::UBIGINT >= 2147483648
               THEN ('0x' || substr(md5(g), 1, 8))::UBIGINT::HUGEINT * 4294967296
                    + ('0x' || substr(md5(g), 9, 8))::UBIGINT - 18446744073709551616
               ELSE ('0x' || substr(md5(g), 1, 8))::UBIGINT::HUGEINT * 4294967296
                    + ('0x' || substr(md5(g), 9, 8))::UBIGINT END AS BIGINT) AS gh
        FROM (SELECT doc_id, n, i,
                array_to_string(list_slice(t, i, i + 7), ' ') AS g
              FROM posg)),
      freq AS (SELECT gh, count(*) AS cnt FROM ghv GROUP BY gh),
      ranked AS (
        SELECT doc_id, n, i, gh,
          row_number() OVER (PARTITION BY gh ORDER BY doc_id, i) AS rn
        FROM ghv),
      kept AS (
        SELECT r.doc_id, r.n, r.i FROM ranked r JOIN freq USING (gh)
        WHERE cnt = 1 OR rn = 1),
      cover AS (
        SELECT DISTINCT doc_id,
          unnest(generate_series(i, least(i + 7, n))) AS tpos
        FROM kept),
      tokpos AS (
        SELECT doc_id, unnest(t) AS tok,
          unnest(generate_series(1, n)) AS tpos
        FROM sized),
      pres AS (
        SELECT tp.doc_id, tp.tpos, tp.tok
        FROM tokpos tp JOIN cover c
          ON c.doc_id = tp.doc_id AND c.tpos = tp.tpos),
      agg AS (
        SELECT doc_id, count(*) AS n_kept,
          array_to_string(list(tok ORDER BY tpos), ' ') AS clean_text
        FROM pres GROUP BY doc_id)
      SELECT s.doc_id, CAST(s.n AS BIGINT) AS n_tokens,
        CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        coalesce(a.clean_text, '') AS clean_text
      FROM sized s LEFT JOIN agg a USING (doc_id)
      ORDER BY s.doc_id"""), bench = true),

    // Exact token-set Jaccard via inverted index — SQL-expressible, full oracle.
    QuerySpec("d04_ngram_jaccard", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents")
        .filter($"doc_id" < 50).select($"doc_id", $"text")
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", threshold = 0.5)
        .select($"id_a", $"id_b", round($"jaccard", 6).as("jaccard"))
        .orderBy($"id_a", $"id_b")
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id AS id,
          list_distinct(string_split_regex(trim(text), '\s+')) AS tk
        FROM documents WHERE doc_id < 50),
      sizes AS (SELECT id, len(tk) AS n FROM toks),
      inv AS (SELECT id, unnest(tk) AS t FROM toks),
      shared AS (
        SELECT x.id AS id_a, y.id AS id_b, count(*) AS shared
        FROM inv x JOIN inv y ON x.t = y.t AND x.id < y.id
        GROUP BY x.id, y.id)
      SELECT id_a, id_b,
        round(CAST(shared AS DOUBLE) / (a.n + b.n - shared), 6) AS jaccard
      FROM shared
      JOIN sizes a ON a.id = id_a
      JOIN sizes b ON b.id = id_b
      WHERE CAST(shared AS DOUBLE) / (a.n + b.n - shared) >= 0.5
      ORDER BY id_a, id_b""")),

    // Embedding-cosine near-dup with planted exact copies — FULL oracle:
    // the LSH planes derive from md5 (VectorNative.planes), so DuckDB
    // rebuilds the exact plane weights, buckets, bucket-equijoin and
    // cosine verification relationally.
    QuerySpec("d05_dedup_embedding_cosine", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val planted = embs.filter($"vec_id" < 25)
        .withColumn("vec_id", $"vec_id" + 100000L)
      Dedup.embeddingNearDups(embs.unionByName(planted), "vec_id", "embedding",
          threshold = 0.99, lshBits = 12)
        .select($"id_a", $"id_b", round($"cos", 6).as("cos"))
        .orderBy($"id_a", $"id_b")
    }, oracle = Some(s"""
      WITH corpus AS (
        SELECT vec_id AS id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS id, embedding FROM embeddings WHERE vec_id < 25),
      $LshBucketCte
      b AS (SELECT c.id, $LshBucketSum AS bucket
            FROM corpus c, plane_lists p GROUP BY c.id),
      scored AS (
        SELECT a.id AS id_a, bb.id AS id_b,
          list_aggregate(list_transform(list_zip(ea.embedding, eb.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(ea.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(eb.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.id < bb.id
        JOIN corpus ea ON ea.id = a.id
        JOIN corpus eb ON eb.id = bb.id)
      SELECT id_a, id_b, round(cos, 6) AS cos FROM scored
      WHERE cos >= 0.99 ORDER BY id_a, id_b""")),

    // Benchmark decontamination: train docs sharing any word 8-gram with
    // the eval set (docs < 20); planted truncated copies of the eval docs
    // are the guaranteed contamination. Eval n-grams broadcast — the
    // train side never shuffles (see Dedup.contaminatedDocs). The oracle
    // is shared with d10, whose result is bit-identical by construction.
    QuerySpec("d06_decontamination", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val evalDocs = docs.filter($"doc_id" < 20)
      val train = docs.filter($"doc_id" >= 20).unionByName(
        Dedup.withPlantedDups(evalDocs, "doc_id", "text",
          nPlant = 20, idOffset = 100000L, dropWords = 5)
          .filter($"doc_id" >= 100000L))
      Dedup.contaminatedDocs(train, evalDocs, "doc_id", "text", n = 8)
        .orderBy($"doc_id")
    }, oracle = Some(DecontaminationOracle)),

    // Per-document contamination score (Dedup.contaminationScore): the
    // graded d06 — distinct 8-grams per train doc, eval-set hits, and
    // the overlap fraction in integer ppm. Same train/eval split and
    // planted contamination as d06; exact integer output.
    QuerySpec("d15_contamination_score", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val evalDocs = docs.filter($"doc_id" < 20)
      val train = docs.filter($"doc_id" >= 20).unionByName(
        Dedup.withPlantedDups(evalDocs, "doc_id", "text",
          nPlant = 20, idOffset = 100000L, dropWords = 5)
          .filter($"doc_id" >= 100000L))
      Dedup.contaminationScore(train, evalDocs, "doc_id", "text", n = 8)
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH base AS (SELECT doc_id, text FROM documents),
      eval_docs AS (SELECT doc_id, text FROM base WHERE doc_id < 20),
      planted AS (
        SELECT doc_id + 100000 AS doc_id,
          array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1,
            greatest(len(string_split_regex(trim(text), '\s+')) - 5, 1)), ' ')
            AS text
        FROM eval_docs),
      train AS (
        SELECT doc_id, text FROM base WHERE doc_id >= 20
        UNION ALL SELECT doc_id, text FROM planted),
      eval_grams AS (
        SELECT DISTINCT
          unnest(list_transform(
            generate_series(1, greatest(len(t) - 8, 0) + 1),
            i -> array_to_string(list_slice(t, i, i + 7), ' '))) AS g
        FROM (SELECT string_split_regex(trim(text), '\s+') AS t
              FROM eval_docs)),
      train_grams AS (
        SELECT DISTINCT doc_id, g FROM (
          SELECT doc_id,
            unnest(list_transform(
              generate_series(1, greatest(len(t) - 8, 0) + 1),
              i -> array_to_string(list_slice(t, i, i + 7), ' '))) AS g
          FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                FROM train))),
      stats AS (
        SELECT doc_id, count(*) AS n_grams
        FROM train_grams GROUP BY doc_id),
      hits AS (
        SELECT doc_id, count(*) AS n_hit
        FROM train_grams JOIN eval_grams USING (g) GROUP BY doc_id)
      SELECT s.doc_id, CAST(s.n_grams AS BIGINT) AS n_grams,
        CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
        CAST(coalesce(h.n_hit, 0) * 1000000 // s.n_grams AS BIGINT)
          AS frac_ppm
      FROM stats s LEFT JOIN hits h USING (doc_id)
      ORDER BY s.doc_id""")),

    // Incremental ingest dedup (Dedup.incrementalAdmit): docs < 400 are
    // the already-deduped corpus index; the batch is docs >= 400 plus
    // planted byte-copies of 30 indexed docs under new ids. Admitted =
    // new-against-index AND first-in-batch (min id).
    QuerySpec("d11_incremental_dedup", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val index = docs.filter($"doc_id" < 400)
      val batch = docs.filter($"doc_id" >= 400).unionByName(
        docs.filter($"doc_id" < 30)
          .withColumn("doc_id", $"doc_id" + 200000L))
      Dedup.incrementalAdmit(index, batch, "doc_id", "text")
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH index_fp AS (
        SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id < 400),
      batch AS (
        SELECT doc_id, text FROM documents WHERE doc_id >= 400
        UNION ALL
        SELECT doc_id + 200000 AS doc_id, text FROM documents
        WHERE doc_id < 30),
      keep AS (
        SELECT md5(text) AS fp, min(doc_id) AS doc_id
        FROM batch GROUP BY md5(text))
      SELECT doc_id FROM keep
      WHERE fp NOT IN (SELECT fp FROM index_fp)
      ORDER BY doc_id""")),

    // SemDeDup cluster-scoped semantic dedup (Dedup.semanticDedup):
    // seeded int8 centroids + integer-exact assignment (the s03
    // machinery) + quantized-cosine pair scoring inside clusters only.
    // Planted copies (vec_id+100000 for vec_id < 25) are the guaranteed
    // semantic dups (cos = 1.0 exactly); the corpus's organic in-cluster
    // pairs sit below 0.5, so threshold 0.99 recovers precisely the
    // planted set with lowest-id witnesses.
    QuerySpec("d12_semantic_dedup", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val planted = embs.filter($"vec_id" < 25)
        .withColumn("vec_id", $"vec_id" + 100000L)
      Dedup.semanticDedup(embs.unionByName(planted), "vec_id", "embedding",
          threshold = 0.99, nlist = 16)
        .select($"vec_id", $"kept_by", round($"cos", 9).as("cos"))
        .orderBy($"vec_id")
    }, oracle = Some("""
      WITH corpus AS (
        SELECT vec_id AS id, embedding FROM embeddings
        UNION ALL
        SELECT vec_id + 100000 AS id, embedding FROM embeddings
        WHERE vec_id < 25),
      cq AS (
        SELECT id,
          CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
          ELSE list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) AS INTEGER))
          END AS q
        FROM (SELECT id, embedding, list_aggregate(list_transform(embedding,
                x -> abs(CAST(x AS DOUBLE))), 'max') AS mx FROM corpus)),
      cent AS (
        SELECT row_number() OVER (ORDER BY id) - 1 AS cidx, q AS cvec
        FROM cq ORDER BY id LIMIT 16),
      asgn AS (
        SELECT id, cidx,
          row_number() OVER (PARTITION BY id ORDER BY
            list_aggregate(list_transform(list_zip(c.q, ct.cvec),
              x -> CAST(x[1] - x[2] AS BIGINT) * (x[1] - x[2])), 'sum'),
            cidx) AS rn
        FROM cq c, cent ct),
      mem AS (
        SELECT a.id, a.cidx, c.q FROM asgn a JOIN cq c USING (id)
        WHERE a.rn = 1),
      pairs AS (
        SELECT b.id AS dup_id, a.id AS keeper_id,
          list_aggregate(list_transform(list_zip(a.q, b.q),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(a.q,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(b.q,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM mem a JOIN mem b ON a.cidx = b.cidx AND a.id < b.id),
      qual AS (
        SELECT dup_id, keeper_id, cos,
          row_number() OVER (PARTITION BY dup_id ORDER BY keeper_id) AS rn
        FROM pairs WHERE cos >= 0.99)
      SELECT dup_id AS vec_id, keeper_id AS kept_by, round(cos, 9) AS cos
      FROM qual WHERE rn = 1 ORDER BY vec_id""")),

    // Line-level repeated-segment dedup (Dedup.lineDedup): the C4 /
    // MassiveText cross-corpus repeated-line removal with a
    // deterministic 10-word segmentation (fixtures carry no newlines)
    // and first-occurrence-wins semantics. Planted near-copies
    // (doc_id+100000, last 5 words dropped) share every full segment
    // with their originals, so they come back mostly emptied while the
    // originals survive intact.
    QuerySpec("d13_line_dedup", (s, dir) => {
      import s.implicits._
      val docs = Dedup.withPlantedDups(
        Tables.load(s, dir, "documents").select($"doc_id", $"text"),
        "doc_id", "text", nPlant = 25, idOffset = 100000L, dropWords = 5)
      Dedup.lineDedup(docs, "doc_id", "text", span = 10)
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH base AS (SELECT doc_id, text FROM documents),
      planted AS (
        SELECT doc_id + 100000 AS doc_id,
          array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1,
            greatest(len(string_split_regex(trim(text), '\s+')) - 5, 1)), ' ')
            AS text
        FROM base WHERE doc_id < 25),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL SELECT doc_id, text FROM planted),
      sized AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM corpus),
      segd AS (
        SELECT doc_id, CAST(ceil(len(t) / 10.0) AS BIGINT) AS nseg, t
        FROM sized),
      segs AS (
        SELECT doc_id, nseg,
          unnest(generate_series(0, nseg - 1)) AS pos, t
        FROM segd),
      segtext AS (
        SELECT doc_id, pos,
          array_to_string(list_slice(t, pos * 10 + 1, pos * 10 + 10), ' ')
            AS seg
        FROM segs),
      rn AS (
        SELECT doc_id, pos, seg,
          row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
        FROM segtext),
      agg AS (
        SELECT doc_id, count(*) AS n_kept,
          string_agg(seg, ' ' ORDER BY pos) AS txt
        FROM rn WHERE rn = 1 GROUP BY doc_id)
      SELECT d.doc_id, d.nseg AS n_segments,
        CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
        coalesce(a.txt, '') AS text_dedup
      FROM segd d LEFT JOIN agg a USING (doc_id)
      ORDER BY doc_id""")),

    // Edit-distance fuzzy-dedup verify (Dedup.fuzzyVerifyPairs): token-
    // jaccard candidates (the lossless d04 prefix filter) verified by
    // Levenshtein, reported as integer ppm of the longer text — both
    // engines implement Wagner-Fischer, so the replay is exact. Planted
    // near-copies (last 5 words dropped) are the known positives.
    QuerySpec("d14_fuzzy_verify", (s, dir) => {
      import s.implicits._
      val docs = Dedup.withPlantedDups(
        Tables.load(s, dir, "documents").filter($"doc_id" < 50)
          .select($"doc_id", $"text"),
        "doc_id", "text", nPlant = 25, idOffset = 100000L, dropWords = 5)
      Dedup.fuzzyVerifyPairs(docs, "doc_id", "text",
          candThreshold = 0.5, minSimPpm = 600000L)
        .orderBy($"id_a", $"id_b")
    }, oracle = Some("""
      WITH base AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 50),
      planted AS (
        SELECT doc_id + 100000 AS doc_id,
          array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1,
            greatest(len(string_split_regex(trim(text), '\s+')) - 5, 1)), ' ')
            AS text
        FROM base WHERE doc_id < 25),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL SELECT doc_id, text FROM planted),
      toks AS (
        SELECT doc_id AS id, text,
          list_distinct(string_split_regex(trim(text), '\s+')) AS tk
        FROM corpus),
      sizes AS (SELECT id, len(tk) AS n FROM toks),
      inv AS (SELECT id, unnest(tk) AS t FROM toks),
      shared AS (
        SELECT x.id AS id_a, y.id AS id_b, count(*) AS shared
        FROM inv x JOIN inv y ON x.t = y.t AND x.id < y.id
        GROUP BY x.id, y.id),
      cand AS (
        SELECT id_a, id_b FROM shared
        JOIN sizes a ON a.id = id_a JOIN sizes b ON b.id = id_b
        WHERE CAST(shared AS DOUBLE) / (a.n + b.n - shared) >= 0.5),
      lv AS (
        SELECT id_a, id_b,
          CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS lev,
          CAST(greatest(len(ta.text), len(tb.text)) AS BIGINT) AS mx
        FROM cand
        JOIN toks ta ON ta.id = id_a
        JOIN toks tb ON tb.id = id_b),
      simd AS (
        SELECT id_a, id_b, lev,
          CASE WHEN mx = 0 THEN CAST(1000000 AS BIGINT)
               ELSE (mx - lev) * 1000000 // mx END AS sim_ppm
        FROM lv)
      SELECT id_a, id_b, lev, sim_ppm FROM simd
      WHERE sim_ppm >= 600000 ORDER BY id_a, id_b""")),

    // Bloom-filter decontamination — the scale path for an eval set too
    // big to broadcast: Bloom pre-filter inside codegen, then an exact
    // shuffle semi-join over the candidates only. No false negatives +
    // exact verify ⇒ bit-identical to d06, so the SAME oracle applies.
    QuerySpec("d10_decontamination_bloom", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val evalDocs = docs.filter($"doc_id" < 20)
      val train = docs.filter($"doc_id" >= 20).unionByName(
        Dedup.withPlantedDups(evalDocs, "doc_id", "text",
          nPlant = 20, idOffset = 100000L, dropWords = 5)
          .filter($"doc_id" >= 100000L))
      Dedup.contaminatedDocsBloom(train, evalDocs, "doc_id", "text", n = 8)
        .orderBy($"doc_id")
    }, oracle = Some(DecontaminationOracle)),

    // ---- Similarity search --------------------------------------------
    // Brute-force cosine top-k (exact baseline) — full DuckDB oracle with
    // identical sequential-fold double math.
    QuerySpec("s01_ann_brute_force", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      Similarity.bruteForceTopK(embs.filter($"vec_id" =!= 0), "vec_id", "embedding", q, 20)
        .select($"vec_id", round($"cos", 9).as("cos"))
    }, oracle = Some("""
      WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT vec_id,
          list_aggregate(list_transform(list_zip(embedding, qe),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(qe,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM embeddings, q WHERE vec_id <> 0)
      SELECT vec_id, round(cos, 9) AS cos FROM scored
      ORDER BY cos DESC, vec_id LIMIT 20"""), bench = true),

    // Filtered vector search: attribute predicate (label — pushed to the
    // parquet scan) + metadata-table filter (documents.lang — broadcast
    // semi-join of ids) BEFORE any distance math. Pre-filter, not
    // post-filter: see Similarity.filteredTopK; plan-asserted in
    // PlanAuditSpec.
    QuerySpec("s11_filtered_ann", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      val keep = Tables.load(s, dir, "documents")
        .filter($"lang" === "en").select($"doc_id")
      Similarity.filteredTopK(
          embs.filter($"vec_id" =!= 0), "vec_id", "embedding",
          $"label" === 3, keep, "doc_id", q, 20)
        .select($"vec_id", round($"cos", 9).as("cos"))
    }, oracle = Some("""
      WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      keep AS (SELECT doc_id FROM documents WHERE lang = 'en'),
      scored AS (
        SELECT vec_id,
          list_aggregate(list_transform(list_zip(embedding, qe),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(qe,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM embeddings JOIN keep ON vec_id = doc_id, q
        WHERE vec_id <> 0 AND label = 3)
      SELECT vec_id, round(cos, 9) AS cos FROM scored
      ORDER BY cos DESC, vec_id LIMIT 20""")),

    // Batched exact top-k (one pass over the corpus for a query SET,
    // bounded typed-Aggregator partials — see Similarity.batchTopK). The
    // oracle recomputes every (query, corpus) cosine with the identical
    // sequential-fold double math and ranks per query.
    QuerySpec("s04_ann_batch_topk", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      Similarity.batchTopK(
          embs.filter($"vec_id" >= 5), "vec_id", "embedding",
          embs.filter($"vec_id" < 5), "vec_id", "embedding", k = 10)
        .select($"q_id", $"rank", $"vec_id", round($"cos", 9).as("cos"))
        .orderBy($"q_id", $"rank")
    }, oracle = Some("""
      WITH q AS (SELECT vec_id AS q_id, embedding AS qe
                 FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q_id, vec_id,
          list_aggregate(list_transform(list_zip(embedding, qe),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(qe,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM embeddings, q WHERE vec_id >= 5),
      ranked AS (
        SELECT q_id, vec_id, cos,
          row_number() OVER (PARTITION BY q_id
                             ORDER BY cos DESC, vec_id) AS rank
        FROM scored)
      SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id,
             round(cos, 9) AS cos
      FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""")),

    // Hard-negative mining: per probe, the 10 most-similar corpus
    // vectors with a DIFFERENT label (Similarity.hardNegatives — the
    // batchTopK shape with the label-mismatch filter before aggregation,
    // so no over-retrieve margin is involved). Oracle replays cosine,
    // the label filter, and the ranking.
    QuerySpec("s08_hard_negatives", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      Similarity.hardNegatives(
          embs.filter($"vec_id" >= 5), "vec_id", "embedding", "label",
          embs.filter($"vec_id" < 5), "vec_id", "embedding", "label",
          k = 10)
        .select($"q_id", $"rank", $"vec_id", round($"cos", 9).as("cos"))
        .orderBy($"q_id", $"rank")
    }, oracle = Some("""
      WITH q AS (SELECT vec_id AS q_id, embedding AS qe, label AS ql
                 FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q_id, vec_id,
          list_aggregate(list_transform(list_zip(embedding, qe),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(qe,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM embeddings, q WHERE vec_id >= 5 AND label <> ql),
      ranked AS (
        SELECT q_id, vec_id, cos,
          row_number() OVER (PARTITION BY q_id
                             ORDER BY cos DESC, vec_id) AS rank
        FROM scored)
      SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id,
             round(cos, 9) AS cos
      FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""")),

    // Int8-quantized exact top-k — FULL oracle: quantization and cosine
    // are exact integer math in doubles (sums < 2^53), so DuckDB replays
    // them bit-identically (see Similarity.quantizedTopK).
    QuerySpec("s05_ann_quantized", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      Similarity.quantizedTopK(embs.filter($"vec_id" =!= 0),
          "vec_id", "embedding", q, 20)
        .select($"vec_id", round($"cos", 9).as("cos"))
    }, oracle = Some("""
      WITH qq AS (
        SELECT CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
          ELSE list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) AS INTEGER))
          END AS q
        FROM (SELECT embedding, list_aggregate(list_transform(embedding,
                x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
              FROM embeddings WHERE vec_id = 0)),
      cq AS (
        SELECT vec_id,
          CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
          ELSE list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) AS INTEGER))
          END AS q
        FROM (SELECT vec_id, embedding, list_aggregate(list_transform(
                embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
              FROM embeddings WHERE vec_id <> 0)),
      scored AS (
        SELECT vec_id,
          list_aggregate(list_transform(list_zip(c.q, qq.q),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(c.q,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(qq.q,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM cq c, qq)
      SELECT vec_id, round(cos, 9) AS cos FROM scored
      ORDER BY cos DESC, vec_id LIMIT 20""")),

    // Product-quantization ANN (Similarity.pqTopK) — FULL oracle: the
    // codebooks are the int8-quantized 8-dim subvectors of the 16
    // smallest corpus ids (s03's seeded sampled-points init), encode is
    // an exact integer argmin per subspace, the ADC scan ranks by
    // reconstructed cosine from integer dot/norm lookup tables, and the
    // top-100 shortlist is re-scored with the exact s01 cosine — every
    // stage replays in DuckDB. At 100 TB the scan reads 8 codes per
    // vector instead of 64 floats.
    QuerySpec("s09_ann_pq", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      Similarity.pqTopK(embs.filter($"vec_id" =!= 0), "vec_id",
          "embedding", q, k = 20, m = 8, ksub = 16, shortlist = 100)
        .select($"vec_id", round($"cos", 9).as("cos"))
    }, oracle = Some(SeededPqOracle)),

    // MMR diverse retrieval (Similarity.mmrTopK): greedy relevance-minus-
    // redundancy re-rank over a top-30 candidate pool — FULL oracle via a
    // recursive CTE that replays the greedy selection; the binary64
    // objective (incl. the 1 - 0.7 subtraction) and both cosine folds
    // are engine-exact, so every pick matches bit-for-bit.
    QuerySpec("s10_mmr_diverse", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      Similarity.mmrTopK(embs.filter($"vec_id" =!= 0), "vec_id",
          "embedding", q, k = 10, lambda = 0.7, poolSize = 30)
        .select($"rank", $"vec_id", round($"qcos", 9).as("qcos"))
        .orderBy($"rank")
    }, oracle = Some("""
      WITH RECURSIVE
      scored AS (
        SELECT e.vec_id,
          list_aggregate(list_transform(list_zip(e.embedding, qe.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(e.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(qe.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM embeddings e,
          (SELECT embedding FROM embeddings WHERE vec_id = 0) qe
        WHERE e.vec_id <> 0),
      pool AS (
        SELECT vec_id AS id, cos AS qcos FROM scored
        ORDER BY cos DESC, vec_id LIMIT 30),
      pv AS (
        SELECT p.id, e.embedding FROM pool p
        JOIN embeddings e ON e.vec_id = p.id),
      pc AS (
        SELECT x.id AS a, y.id AS b,
          list_aggregate(list_transform(list_zip(x.embedding, y.embedding),
            t -> CAST(t[1] AS DOUBLE) * CAST(t[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(x.embedding,
             t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(y.embedding,
             t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE)), 'sum'))) AS cos
        FROM pv x, pv y WHERE x.id <> y.id),
      sel AS (
        SELECT 0 AS step, CAST([] AS BIGINT[]) AS picked
        UNION ALL
        SELECT step + 1, list_append(picked, (
            SELECT p.id FROM pool p
            WHERE NOT list_contains(picked, p.id)
            ORDER BY 0.7 * p.qcos - (1 - 0.7) * coalesce((
                SELECT max(x.cos) FROM pc x
                WHERE x.a = p.id AND list_contains(picked, x.b)), 0.0)
              DESC, p.id
            LIMIT 1))
        FROM sel WHERE step < 10),
      fin AS (SELECT picked FROM sel WHERE step = 10),
      ranked AS (
        SELECT CAST(i AS BIGINT) AS rank, picked[i] AS vec_id
        FROM fin, generate_series(1, 10) t(i))
      SELECT r.rank, r.vec_id, round(p.qcos, 9) AS qcos
      FROM ranked r JOIN pool p ON p.id = r.vec_id
      ORDER BY r.rank""")),

    // Retrieval-quality evaluation (Similarity.evalRetrieval): recall@10
    // and MRR of the PQ compressed-domain searcher (s09's ADC shortlist,
    // no over-retrieve) against exact batchTopK ground truth. Integer-ppm
    // metrics replay exactly; at the gate SF the PQ recall genuinely
    // ranges 0.0–0.5 across probes (8 codes can't preserve a 64-dim
    // top-10), including the zero-hit MRR=0 branch — the eval is
    // informative, not a tautology. The whole probe set is served by
    // pqBatchTopK: ONE corpus scan (codes + broadcast per-probe LUTs),
    // not one scan per probe (plan-asserted in PlanAuditSpec).
    QuerySpec("s12_retrieval_eval", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val corpus = embs.filter($"vec_id" >= 5)
      val probes = embs.filter($"vec_id" < 5)
      val retrieved = Similarity.pqBatchTopK(corpus, "vec_id", "embedding",
        probes, "vec_id", "embedding", k = 10, m = 8, ksub = 16,
        shortlist = 10)
      val truth = Similarity.batchTopK(corpus, "vec_id", "embedding",
        probes, "vec_id", "embedding", k = 10)
      Similarity.evalRetrieval(
          retrieved.select($"q_id", $"rank", $"vec_id"),
          truth.select($"q_id", $"rank", $"vec_id"), k = 10)
        .orderBy($"q_id")
    }, oracle = Some("""
      WITH probes AS (
        SELECT vec_id AS q_id, embedding AS qe FROM embeddings
        WHERE vec_id < 5),
      t_scored AS (
        SELECT p.q_id, e.vec_id,
          row_number() OVER (PARTITION BY p.q_id ORDER BY
            list_aggregate(list_transform(list_zip(e.embedding, p.qe),
              x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
            (sqrt(list_aggregate(list_transform(e.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
             sqrt(list_aggregate(list_transform(p.qe,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) DESC,
            e.vec_id) AS rn
        FROM embeddings e, probes p WHERE e.vec_id >= 5),
      truth AS (SELECT q_id, vec_id FROM t_scored WHERE rn <= 10),
      cq AS (
        SELECT vec_id,
          CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
          ELSE list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) AS INTEGER))
          END AS q
        FROM (SELECT vec_id, embedding, list_aggregate(list_transform(
                embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
              FROM embeddings WHERE vec_id >= 5)),
      pqv AS (
        SELECT vec_id AS q_id,
          CASE WHEN mx = 0 THEN list_transform(embedding, x -> 0)
          ELSE list_transform(embedding, x ->
            CAST(floor(CAST(x AS DOUBLE) / (mx / 127.0) + 0.5) AS INTEGER))
          END AS q
        FROM (SELECT vec_id, embedding, list_aggregate(list_transform(
                embedding, x -> abs(CAST(x AS DOUBLE))), 'max') AS mx
              FROM embeddings WHERE vec_id < 5)),
      cent AS (
        SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, q AS cvec
        FROM cq ORDER BY vec_id LIMIT 16),
      subs AS (SELECT unnest(generate_series(0, 7)) AS j),
      asgn AS (
        SELECT vec_id, j, cidx,
          row_number() OVER (PARTITION BY vec_id, j ORDER BY
            list_aggregate(list_transform(list_zip(
              list_slice(c.q, j * 8 + 1, j * 8 + 8),
              list_slice(ct.cvec, j * 8 + 1, j * 8 + 8)),
              x -> CAST(x[1] - x[2] AS BIGINT) * (x[1] - x[2])), 'sum'),
            cidx) AS rn
        FROM cq c, cent ct, subs),
      codes AS (SELECT vec_id, j, cidx AS code FROM asgn WHERE rn = 1),
      lut AS (
        SELECT p.q_id, j, cidx,
          list_aggregate(list_transform(list_zip(
            list_slice(p.q, j * 8 + 1, j * 8 + 8),
            list_slice(ct.cvec, j * 8 + 1, j * 8 + 8)),
            x -> CAST(x[1] AS BIGINT) * x[2]), 'sum') AS dot,
          list_aggregate(list_transform(
            list_slice(ct.cvec, j * 8 + 1, j * 8 + 8),
            x -> CAST(x AS BIGINT) * x), 'sum') AS nrm
        FROM pqv p, cent ct, subs),
      qn AS (SELECT q_id, list_aggregate(list_transform(q,
               x -> CAST(x AS BIGINT) * x), 'sum') AS qnorm FROM pqv),
      adc AS (
        SELECT l.q_id, c.vec_id,
          CAST(sum(l.dot) AS DOUBLE) /
            (sqrt(CAST(sum(l.nrm) AS DOUBLE)) *
             sqrt(CAST(qn.qnorm AS DOUBLE))) AS adc
        FROM codes c JOIN lut l ON c.j = l.j AND c.code = l.cidx
        JOIN qn ON qn.q_id = l.q_id
        GROUP BY l.q_id, c.vec_id, qn.qnorm),
      short AS (
        SELECT q_id, vec_id,
          row_number() OVER (PARTITION BY q_id
                             ORDER BY adc DESC, vec_id) AS rn
        FROM adc),
      refined AS (
        SELECT s.q_id, s.vec_id,
          row_number() OVER (PARTITION BY s.q_id ORDER BY
            list_aggregate(list_transform(list_zip(e.embedding, p.qe),
              x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
            (sqrt(list_aggregate(list_transform(e.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
             sqrt(list_aggregate(list_transform(p.qe,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) DESC,
            s.vec_id) AS rank
        FROM short s
        JOIN embeddings e ON e.vec_id = s.vec_id
        JOIN probes p ON p.q_id = s.q_id
        WHERE s.rn <= 10),
      hits AS (
        SELECT r.q_id, count(*) AS n_hits, min(r.rank) AS fh
        FROM refined r JOIN truth t
          ON r.q_id = t.q_id AND r.vec_id = t.vec_id
        GROUP BY r.q_id)
      SELECT qs.q_id,
        CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
        CAST(coalesce(h.n_hits, 0) * 1000000 // 10 AS BIGINT) AS recall_ppm,
        CAST(CASE WHEN h.fh IS NULL THEN 0
             ELSE 1000000 // h.fh END AS BIGINT) AS mrr_ppm
      FROM (SELECT q_id FROM truth UNION SELECT q_id FROM refined) qs
      LEFT JOIN hits h ON qs.q_id = h.q_id
      ORDER BY qs.q_id""")),

    // kNN label classification: majority vote over each probe's 10
    // nearest neighbors (batchTopK reused — one corpus pass for the whole
    // probe set), ties → smallest label. The oracle recomputes every
    // cosine, ranks, and replays the vote.
    QuerySpec("s06_knn_label", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val embs = Tables.load(s, dir, "embeddings")
      val corpus = embs.filter($"vec_id" >= 5)
      val nn = Similarity.batchTopK(corpus, "vec_id", "embedding",
        embs.filter($"vec_id" < 5), "vec_id", "embedding", k = 10)
      nn.join(corpus.select($"vec_id", $"label"), "vec_id")
        .groupBy($"q_id", $"label")
        .agg(count(lit(1)).as("votes"))
        .withColumn("rk", row_number().over(
          Window.partitionBy($"q_id").orderBy($"votes".desc, $"label")))
        .filter($"rk" === 1)
        .select($"q_id", $"label".as("pred_label"), $"votes")
        .orderBy($"q_id")
    }, oracle = Some("""
      WITH q AS (SELECT vec_id AS q_id, embedding AS qe
                 FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q_id, vec_id, label,
          list_aggregate(list_transform(list_zip(embedding, qe),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(qe,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM embeddings, q WHERE vec_id >= 5),
      ranked AS (
        SELECT q_id, vec_id, label,
          row_number() OVER (PARTITION BY q_id
                             ORDER BY cos DESC, vec_id) AS rank
        FROM scored),
      votes AS (
        SELECT q_id, label, count(*) AS votes
        FROM ranked WHERE rank <= 10 GROUP BY q_id, label),
      best AS (
        SELECT q_id, label, votes, row_number() OVER (PARTITION BY q_id
          ORDER BY votes DESC, label) AS rk
        FROM votes)
      SELECT q_id, label AS pred_label, CAST(votes AS BIGINT) AS votes
      FROM best WHERE rk = 1 ORDER BY q_id""")),

    // BM25 keyword retrieval (operators/Retrieval.scala) — engine-exact
    // scoring: all inputs are exact integers, the float expression tree
    // is mirrored literally below (same association, same decimal
    // literals), ln runs through LnLibm (platform libm — Spark's builtin
    // StrictMath.log is 1 ulp off libm on ~4% of inputs), and per-term
    // scores quantize to integer micros BEFORE the per-doc sum so the
    // only reduction is an order-free integer sum.
    QuerySpec("s07_bm25", (s, dir) => {
      import s.implicits._
      Retrieval.bm25TopK(
        Tables.load(s, dir, "documents").select($"doc_id", $"text"),
        "doc_id", "text",
        terms = Seq("vector", "stream", "merge", "window", "spark"),
        topK = 20)
    }, oracle = Some(SeededBm25Oracle), bench = true),

    // LSH-bucketed ANN — FULL oracle: DuckDB rebuilds the md5-derived
    // planes, the query and corpus buckets, the Hamming-<=probes probe
    // set, and the bucket-restricted top-k (recall vs brute force stays
    // asserted in DedupSpec).
    QuerySpec("s02_ann_lsh", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      Similarity.lshTopK(embs.filter($"vec_id" =!= 0), "vec_id", "embedding", q,
          k = 20, bits = 12, probes = 4)
        .select($"vec_id", round($"cos", 9).as("cos"))
    }, oracle = Some(s"""
      WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      corpus AS (SELECT vec_id AS id, embedding FROM embeddings WHERE vec_id <> 0),
      $LshBucketCte
      b AS (SELECT c.id, $LshBucketSum AS bucket
            FROM corpus c, plane_lists p GROUP BY c.id),
      qb AS (SELECT ${LshBucketSum.replace("c.embedding", "q.qe")} AS bucket
             FROM q, plane_lists p),
      probed AS (
        SELECT b.id FROM b, qb
        WHERE bit_count(xor(CAST(b.bucket AS BIGINT), CAST(qb.bucket AS BIGINT))) <= 4),
      scored AS (
        SELECT c.id AS vec_id,
          list_aggregate(list_transform(list_zip(c.embedding, qe),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(c.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(qe,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM corpus c JOIN probed USING (id), q)
      SELECT vec_id, round(cos, 9) AS cos FROM scored
      ORDER BY cos DESC, vec_id LIMIT 20""")),

    // IVF ANN — FULL oracle via the seeded deterministic variant: the
    // coarse quantizer is the int8-quantized embeddings of the nlist
    // smallest corpus ids (FAISS's sampled-points init, zero Lloyd
    // iterations), assignment/probing are exact integer squared-L2
    // argmins, scoring is the s01 sequential-fold cosine — every stage
    // DuckDB-replayable. The float-kmeans ivfTopK keeps its recall tests
    // in DedupSpec; at 100 TB the assignment is an INGEST-time step
    // (list_id the bucketBy/partition key) so the query times probe+scan.
    QuerySpec("s03_ann_ivf", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      Similarity.ivfSeededTopK(embs.filter($"vec_id" =!= 0), "vec_id",
          "embedding", q, k = 20, nlist = 16, nprobe = 4)
        .select($"vec_id", round($"cos", 9).as("cos"))
    }, oracle = Some(SeededIvfOracle), bench = true),

    // Persisted IVF (Similarity.ivfStagedTopK) — s03's "at 100 TB the
    // assignment is ingest-time and list_id is the partition key"
    // posture made REAL: the seeded assignment is WRITTEN as a parquet
    // table partitioned by list_id (BucketedTables ingest pattern), the
    // centroids re-derive from the staged rows (nlist smallest ids), and
    // the probe's list_id IN-set prunes partition DIRECTORIES at the
    // scan — only nprobe of nlist lists are read off disk
    // (numFiles-asserted in PlanAuditSpec like p22's Hilbert runs).
    // Result-identical to s03 by construction, so it shares s03's full
    // end-to-end DuckDB oracle.
    QuerySpec("s19_ann_ivf_persisted", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      Similarity.ivfStagedTopK(s, dir, embs.filter($"vec_id" =!= 0),
          "vec_id", "embedding", q, k = 20, nlist = 16, nprobe = 4)
        .select($"vec_id", round($"cos", 9).as("cos"))
    }, oracle = Some(SeededIvfOracle), bench = true),

    // Persisted PQ (Similarity.pqStagedTopK) — s09's session-LRU gap
    // closed the s19 way: codebooks AND corpus codes staged as parquet
    // tables at ingest, the ADC ranking scans the (id, codes) TABLE
    // (~m bytes/vector instead of dim·4 — the IO reduction made
    // physical, plan-asserted), and only the bounded shortlist ids are
    // re-read from the raw corpus via a pushed `id IN` filter for the
    // exact refine. Same codebooks, encode, ADC arithmetic, and refine
    // as s09 — result-identical, shares its full end-to-end oracle.
    QuerySpec("s20_ann_pq_persisted", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      Similarity.pqStagedTopK(s, dir, embs.filter($"vec_id" =!= 0),
          "vec_id", "embedding", q, k = 20, m = 8, ksub = 16,
          shortlist = 100)
        .select($"vec_id", round($"cos", 9).as("cos"))
    }, oracle = Some(SeededPqOracle), bench = true),

    // Persisted BM25 (Retrieval.bm25StagedTopK) — s07 rebuilds postings,
    // df stats, and corpus stats from the text per QUERY; here all three
    // are ingest-time tables, the postings BUCKETED by token so the
    // query terms' `tok IN` scan prunes whole buckets (plan-asserted).
    // The staged tf/df/dl are the same exact integers the per-query path
    // derives and the scoring tail is shared code — result-identical,
    // shares s07's oracle.
    QuerySpec("s21_bm25_persisted", (s, dir) => {
      import s.implicits._
      Retrieval.bm25StagedTopK(s, dir,
        Tables.load(s, dir, "documents").select($"doc_id", $"text"),
        "doc_id", "text",
        terms = Seq("vector", "stream", "merge", "window", "spark"),
        topK = 20)
    }, oracle = Some(SeededBm25Oracle), bench = true),

    // IVF×PQ composite ANN (Similarity.ivfPqTopK) — the production
    // 100 TB architecture: s03's seeded coarse quantizer prunes the scan
    // to 4 of 16 inverted lists, s09's PQ codes rank ONLY the survivors
    // by ADC reconstructed cosine, and the top-50 shortlist exact-refines
    // to k=20. Both stages are integer-exact, so the oracle is literally
    // the s03 CTEs (cent/asgn/probe/keep) feeding the s09 CTEs
    // (codes/lut/adc/short/refined) — the composite inherits its full
    // end-to-end replay.
    QuerySpec("s13_ann_ivf_pq", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      Similarity.ivfPqTopK(embs.filter($"vec_id" =!= 0), "vec_id",
          "embedding", q, k = 20, nlist = 16, nprobe = 4,
          m = 8, ksub = 16, shortlist = 50)
        .select($"vec_id", round($"cos", 9).as("cos"))
    }, oracle = Some(SeededIvfPqOracle)),

    // Persisted IVF×PQ (Similarity.ivfPqStagedTopK) — the production
    // architecture staged end to end: corpus codes written
    // partitionBy(list_id), so a probe prunes partition DIRECTORIES
    // (s19's win) and what it reads is the m-code column, not floats
    // (s20's win) — nprobe/nlist x dim·4/m less IO than brute force,
    // now physical on disk. Bounded shortlist refine through a pushed
    // id IN filter. Result-identical to s13, shares its full oracle.
    QuerySpec("s22_ann_ivfpq_persisted", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      Similarity.ivfPqStagedTopK(s, dir, embs.filter($"vec_id" =!= 0),
          "vec_id", "embedding", q, k = 20, nlist = 16, nprobe = 4,
          m = 8, ksub = 16, shortlist = 50)
        .select($"vec_id", round($"cos", 9).as("cos"))
    }, oracle = Some(SeededIvfPqOracle), bench = true),

    // ---- Multimodal: REAL decode on codec-free formats -----------------
    // m01: P6 PPM image decode — the operator parses actual binary
    // headers + pixel data (MediaCodec.ppmStats); the oracle replays the
    // per-channel integer sums from the md5-derived pixel stream without
    // touching a blob. element_at over one decoded array: ProjectExec
    // codegen CSEs the decode, so the payload parses once per row.
    QuerySpec("m01_multimodal_features", (s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaCorpus(Tables.load(s, dir, "documents"))
      media.filter($"format" === "ppm")
        .select($"media_id", MediaCodecColumns.ppmStats($"payload").as("st"))
        .select($"media_id",
          element_at($"st", 1).as("w"), element_at($"st", 2).as("h"),
          element_at($"st", 3).as("sum_r"), element_at($"st", 4).as("sum_g"),
          element_at($"st", 5).as("sum_b"))
        .orderBy($"media_id")
    }, oracle = Some("""
      WITH media AS (
        SELECT doc_id AS media_id, 8 + (doc_id % 8) AS w, 8 AS h
        FROM documents WHERE doc_id % 2 = 0),
      blocks AS (
        SELECT media_id, w, h, unnest(generate_series(0,
          CAST(ceil(w * h * 3 / 16.0) AS BIGINT) - 1)) AS b
        FROM media),
      bj AS (
        SELECT media_id, w, h, b, unnest(generate_series(0, 15)) AS j
        FROM blocks),
      bytes AS (
        SELECT media_id, w, h, b * 16 + j AS p,
          ('0x' || substr(md5(CAST(media_id AS VARCHAR) || '_' ||
             CAST(b AS VARCHAR)), CAST(j * 2 + 1 AS INTEGER), 2))::UBIGINT AS v
        FROM bj WHERE b * 16 + j < w * h * 3)
      SELECT media_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
        CAST(sum(CASE WHEN p % 3 = 0 THEN v ELSE 0 END) AS BIGINT) AS sum_r,
        CAST(sum(CASE WHEN p % 3 = 1 THEN v ELSE 0 END) AS BIGINT) AS sum_g,
        CAST(sum(CASE WHEN p % 3 = 2 THEN v ELSE 0 END) AS BIGINT) AS sum_b
      FROM bytes GROUP BY media_id, w, h ORDER BY media_id""")),

    // m03: perceptual average-hash over the decoded P6 pixels — the
    // multimodal fingerprint (near-dup images share low-Hamming hashes).
    // All-integer (gray = rgb div 3, mean = sum div n, threshold bits),
    // so the oracle replays the md5-derived byte stream to the identical
    // 64 bits; emitted as two unsigned 32-bit halves to stay inside
    // BIGINT on both engines.
    QuerySpec("m03_image_ahash", (s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaCorpus(Tables.load(s, dir, "documents"))
      media.filter($"format" === "ppm")
        .select($"media_id", MediaCodecColumns.ppmAHash($"payload").as("h"))
        .select($"media_id",
          expr("shiftrightunsigned(h, 32)").as("ahash_hi"),
          $"h".bitwiseAND(lit(0xFFFFFFFFL)).as("ahash_lo"))
        .orderBy($"media_id")
    }, oracle = Some("""
      WITH media AS (
        SELECT doc_id AS media_id, 8 + (doc_id % 8) AS w, 8 AS h
        FROM documents WHERE doc_id % 2 = 0),
      blocks AS (
        SELECT media_id, w, h, unnest(generate_series(0,
          CAST(ceil(w * h * 3 / 16.0) AS BIGINT) - 1)) AS b
        FROM media),
      bj AS (
        SELECT media_id, w, h, b, unnest(generate_series(0, 15)) AS j
        FROM blocks),
      bytes AS (
        SELECT media_id, w, h, b * 16 + j AS p,
          ('0x' || substr(md5(CAST(media_id AS VARCHAR) || '_' ||
             CAST(b AS VARCHAR)), CAST(j * 2 + 1 AS INTEGER), 2))::UBIGINT AS v
        FROM bj WHERE b * 16 + j < w * h * 3),
      gray AS (
        SELECT media_id, w, h, p // 3 AS px,
          CAST(sum(v) // 3 AS BIGINT) AS g
        FROM bytes GROUP BY media_id, w, h, p // 3),
      means AS (
        SELECT media_id, CAST(sum(g) // (w * h) AS BIGINT) AS mean
        FROM gray GROUP BY media_id, w, h)
      SELECT g.media_id,
        CAST(sum(CASE WHEN g.px >= 32 AND g.px < 64 AND g.g >= m.mean
          THEN (CAST(1 AS BIGINT) << CAST(g.px - 32 AS INTEGER))
          ELSE 0 END) AS BIGINT) AS ahash_hi,
        CAST(sum(CASE WHEN g.px < 32 AND g.g >= m.mean
          THEN (CAST(1 AS BIGINT) << CAST(g.px AS INTEGER))
          ELSE 0 END) AS BIGINT) AS ahash_lo
      FROM gray g JOIN means m ON g.media_id = m.media_id
      GROUP BY g.media_id ORDER BY g.media_id""")),

    // m07: scene-cut detection (Multimodal.sceneCuts) — a synthetic
    // "video" per (media_id % 4) built by holding each PPM image for 3
    // consecutive frames: within a scene the aHash is identical
    // (hamming 0), across scene boundaries two independent md5-derived
    // images sit near hamming ~32, so threshold 16 recovers exactly
    // the planted shot structure. Hash first, window second — only
    // (video, long, long) rows shuffle, never frame payloads. Oracle:
    // m03's relational aHash rebuild + the same lag window, hamming
    // summed over hi/lo halves (DuckDB can't shift into bit 63).
    QuerySpec("m07_scene_cuts", (s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaCorpus(
        Tables.load(s, dir, "documents").filter($"doc_id" < 200))
      val frames = media.filter($"format" === "ppm")
        .select($"media_id", MediaCodecColumns.ppmAHash($"payload").as("h"))
        .select($"media_id", $"h",
          explode(array((0 until 3).map(lit(_)): _*)).as("r"))
        .select(($"media_id" % 4).as("video_id"),
          ($"media_id" * 3 + $"r").cast("long").as("frame_idx"), $"h")
      Multimodal.sceneCuts(frames, "video_id", "frame_idx", "h",
          threshold = 16)
        .filter($"hamming".isNotNull)
        .select($"video_id", $"frame_idx", $"hamming", $"is_cut")
        .orderBy($"video_id", $"frame_idx")
    }, oracle = Some("""
      WITH media AS (
        SELECT doc_id AS media_id, 8 + (doc_id % 8) AS w, 8 AS h
        FROM documents WHERE doc_id % 2 = 0 AND doc_id < 200),
      blocks AS (
        SELECT media_id, w, h, unnest(generate_series(0,
          CAST(ceil(w * h * 3 / 16.0) AS BIGINT) - 1)) AS b
        FROM media),
      bj AS (
        SELECT media_id, w, h, b, unnest(generate_series(0, 15)) AS j
        FROM blocks),
      bytes AS (
        SELECT media_id, w, h, b * 16 + j AS p,
          ('0x' || substr(md5(CAST(media_id AS VARCHAR) || '_' ||
             CAST(b AS VARCHAR)), CAST(j * 2 + 1 AS INTEGER), 2))::UBIGINT AS v
        FROM bj WHERE b * 16 + j < w * h * 3),
      gray AS (
        SELECT media_id, w, h, p // 3 AS px,
          CAST(sum(v) // 3 AS BIGINT) AS g
        FROM bytes GROUP BY media_id, w, h, p // 3),
      means AS (
        SELECT media_id, CAST(sum(g) // (w * h) AS BIGINT) AS mean
        FROM gray GROUP BY media_id, w, h),
      hashes AS (
        SELECT g.media_id,
          CAST(sum(CASE WHEN g.px >= 32 AND g.px < 64 AND g.g >= m.mean
            THEN (CAST(1 AS BIGINT) << CAST(g.px - 32 AS INTEGER))
            ELSE 0 END) AS BIGINT) AS hi,
          CAST(sum(CASE WHEN g.px < 32 AND g.g >= m.mean
            THEN (CAST(1 AS BIGINT) << CAST(g.px AS INTEGER))
            ELSE 0 END) AS BIGINT) AS lo
        FROM gray g JOIN means m ON g.media_id = m.media_id
        GROUP BY g.media_id),
      frames AS (
        SELECT media_id % 4 AS video_id, media_id * 3 + r AS frame_idx,
          hi, lo
        FROM hashes, (SELECT unnest(generate_series(0, 2)) AS r)),
      lagged AS (
        SELECT video_id, frame_idx, hi, lo,
          lag(hi) OVER w AS phi, lag(lo) OVER w AS plo
        FROM frames
        WINDOW w AS (PARTITION BY video_id ORDER BY frame_idx))
      SELECT video_id, frame_idx,
        CAST(bit_count(xor(hi, phi)) + bit_count(xor(lo, plo)) AS BIGINT)
          AS hamming,
        (bit_count(xor(hi, phi)) + bit_count(xor(lo, plo))) >= 16 AS is_cut
      FROM lagged WHERE phi IS NOT NULL
      ORDER BY video_id, frame_idx""")),

    // m08: perceptual IMAGE near-dup — the cross-modal d03: 64-bit aHash
    // signatures through Dedup.hamming64Pairs (equal-signature star
    // collapse + chunk-pigeonhole blocking). Planted variants: exact
    // byte copies (+100000 → hamming-0 stars) and pixel-0-whitened edits
    // (+200000, three payload bytes forced to 255 by pure binary
    // substring/concat — an "edited image" whose hash drifts 1-3 bits
    // for most images via the mean shift). FULL oracle: the m03 aHash
    // rebuild extended per-variant (whiten = CASE on byte position),
    // star + distinct-signature pairs replayed like d03's (the chunk
    // blocking is lossless by pigeonhole; no sf0.01 bucket nears the
    // cap, so blocked == all-pairs).
    QuerySpec("m08_image_neardup", (s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaCorpus(Tables.load(s, dir, "documents"))
        .filter($"format" === "ppm").select($"media_id", $"payload")
      val copies = media.filter($"media_id" < 60)
        .select(($"media_id" + 100000L).as("media_id"), $"payload")
      // header "P6\n{w} 8\n255\n" is 11 bytes for single-digit w (id%8
      // <= 1), else 12; whiten pixel 0 = overwrite the 3 bytes after it
      val edited = media.filter($"media_id" < 60)
        .withColumn("hdr",
          when($"media_id" % 8 <= 1, 11).otherwise(12))
        .select(($"media_id" + 200000L).as("media_id"),
          expr("concat(substring(payload, 1, hdr), X'FFFFFF', " +
            "substring(payload, hdr + 4, 2147483647))").as("payload"))
      val sigs = media.unionByName(copies).unionByName(edited)
        .select($"media_id".as("id"),
          MediaCodecColumns.ppmAHash($"payload").as("sig"))
      Dedup.hamming64Pairs(sigs, maxHamming = 3)
        .orderBy($"id_a", $"id_b")
    }, oracle = Some("""
      WITH media AS (
        SELECT doc_id AS media_id, 8 + (doc_id % 8) AS w, 8 AS h
        FROM documents WHERE doc_id % 2 = 0),
      vars AS (
        SELECT media_id AS vid, media_id AS src, w, h, 0 AS whiten
        FROM media
        UNION ALL
        SELECT media_id + 100000, media_id, w, h, 0 FROM media
        WHERE media_id < 60
        UNION ALL
        SELECT media_id + 200000, media_id, w, h, 1 FROM media
        WHERE media_id < 60),
      blocks AS (
        SELECT vid, src, w, h, whiten, unnest(generate_series(0,
          CAST(ceil(w * h * 3 / 16.0) AS BIGINT) - 1)) AS b
        FROM vars),
      bj AS (
        SELECT vid, src, w, h, whiten, b, unnest(generate_series(0, 15)) AS j
        FROM blocks),
      bytes AS (
        SELECT vid, w, h, b * 16 + j AS p,
          CASE WHEN whiten = 1 AND b * 16 + j < 3 THEN 255::UBIGINT
          ELSE ('0x' || substr(md5(CAST(src AS VARCHAR) || '_' ||
             CAST(b AS VARCHAR)), CAST(j * 2 + 1 AS INTEGER), 2))::UBIGINT
          END AS v
        FROM bj WHERE b * 16 + j < w * h * 3),
      gray AS (
        SELECT vid, w, h, p // 3 AS px,
          CAST(sum(v) // 3 AS BIGINT) AS g
        FROM bytes GROUP BY vid, w, h, p // 3),
      means AS (
        SELECT vid, CAST(sum(g) // (w * h) AS BIGINT) AS mean
        FROM gray GROUP BY vid, w, h),
      sigs AS (
        SELECT g.vid AS id,
          CAST(sum(CASE WHEN g.px >= 32 AND g.px < 64 AND g.g >= m.mean
            THEN (1::UBIGINT << CAST(g.px - 32 AS INTEGER))
            ELSE 0 END) AS UBIGINT) AS sig_hi,
          CAST(sum(CASE WHEN g.px < 32 AND g.g >= m.mean
            THEN (1::UBIGINT << CAST(g.px AS INTEGER))
            ELSE 0 END) AS UBIGINT) AS sig_lo
        FROM gray g JOIN means m ON g.vid = m.vid
        GROUP BY g.vid),
      reps AS (
        SELECT sig_hi, sig_lo, min(id) AS rep
        FROM sigs GROUP BY sig_hi, sig_lo),
      star AS (
        SELECT r.rep AS id_a, s.id AS id_b, 0 AS hamming
        FROM sigs s JOIN reps r USING (sig_hi, sig_lo)
        WHERE s.id <> r.rep),
      rep_pairs AS (
        SELECT a.rep AS id_a, b.rep AS id_b,
          bit_count(xor(a.sig_hi, b.sig_hi)) +
          bit_count(xor(a.sig_lo, b.sig_lo)) AS hamming
        FROM reps a JOIN reps b ON a.rep < b.rep
        WHERE bit_count(xor(a.sig_hi, b.sig_hi)) +
              bit_count(xor(a.sig_lo, b.sig_lo)) <= 3)
      SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM star
      UNION ALL
      SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM rep_pairs
      ORDER BY id_a, id_b""")),

    // m02: WAV frame sampling — the operator demuxes a real RIFF chunk
    // list, slices PCM16 LE samples, and emits every 2nd frame's exact
    // integer energy; the oracle rebuilds the identical samples from the
    // md5-derived data bytes (LE pair → signed 16-bit) and the same
    // frame grouping.
    QuerySpec("m02_frame_sample", (s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaCorpus(
        Tables.load(s, dir, "documents").filter($"doc_id" < 200))
      media.filter($"format" === "wav")
        .select($"media_id",
          posexplode(MediaCodecColumns.wavFrameEnergies($"payload", 64, 2))
            .as(Seq("kidx", "energy")))
        .select($"media_id", ($"kidx" * 2).cast("long").as("frame_idx"),
          $"energy")
        .orderBy($"media_id", $"frame_idx")
    }, oracle = Some("""
      WITH media AS (
        SELECT doc_id AS media_id, 256 + (doc_id % 256) AS n
        FROM documents WHERE doc_id % 2 = 1 AND doc_id < 200),
      blocks AS (
        SELECT media_id, n, unnest(generate_series(0,
          CAST(ceil(n * 2 / 16.0) AS BIGINT) - 1)) AS b
        FROM media),
      bj AS (SELECT media_id, n, b, unnest(generate_series(0, 15)) AS j
             FROM blocks),
      bytes AS (
        SELECT media_id, n, b * 16 + j AS p,
          ('0x' || substr(md5(CAST(media_id AS VARCHAR) || '_' ||
             CAST(b AS VARCHAR)), CAST(j * 2 + 1 AS INTEGER), 2))::UBIGINT AS v
        FROM bj WHERE b * 16 + j < n * 2),
      samples AS (
        SELECT media_id, CAST(floor(p / 2) AS BIGINT) AS i,
          CAST(sum(CASE WHEN p % 2 = 0 THEN v ELSE 256 * v END) AS BIGINT)
            AS raw
        FROM bytes GROUP BY media_id, CAST(floor(p / 2) AS BIGINT)),
      sgn AS (
        SELECT media_id, i,
          CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
        FROM samples),
      frames AS (
        SELECT media_id, CAST(floor(i / 64) AS BIGINT) AS frame_idx,
          CAST(sum(s * s) AS BIGINT) AS energy
        FROM sgn GROUP BY media_id, CAST(floor(i / 64) AS BIGINT))
      SELECT media_id, frame_idx, energy FROM frames
      WHERE frame_idx % 2 = 0 ORDER BY media_id, frame_idx""")),

    // m04: WAV audio features — per-frame zero-crossing count + peak
    // amplitude from the same real RIFF demux (MediaCodec
    // .wavFrameZcrPeak). All-integer (sign compares, |s| max), so the
    // oracle replays the md5-derived samples to identical values. The
    // interleaved [zcr, peak] array un-interleaves with one
    // partition-local transform+posexplode — zero shuffle.
    QuerySpec("m04_audio_features", (s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaCorpus(
        Tables.load(s, dir, "documents").filter($"doc_id" < 200))
      media.filter($"format" === "wav")
        .select($"media_id",
          MediaCodecColumns.wavFrameZcrPeak($"payload", 64).as("zp"))
        .select($"media_id", posexplode(expr(
          "transform(sequence(0, size(zp) div 2 - 1)," +
            " f -> struct(zp[2*f] AS zcr, zp[2*f+1] AS peak))"))
          .as(Seq("fi", "s")))
        .select($"media_id", $"fi".cast("long").as("frame_idx"),
          $"s.zcr".as("zcr"), $"s.peak".as("peak"))
        .orderBy($"media_id", $"frame_idx")
    }, oracle = Some("""
      WITH media AS (
        SELECT doc_id AS media_id, 256 + (doc_id % 256) AS n
        FROM documents WHERE doc_id % 2 = 1 AND doc_id < 200),
      blocks AS (
        SELECT media_id, n, unnest(generate_series(0,
          CAST(ceil(n * 2 / 16.0) AS BIGINT) - 1)) AS b
        FROM media),
      bj AS (SELECT media_id, n, b, unnest(generate_series(0, 15)) AS j
             FROM blocks),
      bytes AS (
        SELECT media_id, n, b * 16 + j AS p,
          ('0x' || substr(md5(CAST(media_id AS VARCHAR) || '_' ||
             CAST(b AS VARCHAR)), CAST(j * 2 + 1 AS INTEGER), 2))::UBIGINT AS v
        FROM bj WHERE b * 16 + j < n * 2),
      samples AS (
        SELECT media_id, CAST(floor(p / 2) AS BIGINT) AS i,
          CAST(sum(CASE WHEN p % 2 = 0 THEN v ELSE 256 * v END) AS BIGINT)
            AS raw
        FROM bytes GROUP BY media_id, CAST(floor(p / 2) AS BIGINT)),
      sgn AS (
        SELECT media_id, i,
          CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
        FROM samples),
      lagged AS (
        SELECT media_id, i, s,
          lag(s) OVER (PARTITION BY media_id ORDER BY i) AS prev
        FROM sgn)
      SELECT media_id, CAST(i // 64 AS BIGINT) AS frame_idx,
        CAST(sum(CASE WHEN i % 64 <> 0 AND (prev < 0) <> (s < 0)
          THEN 1 ELSE 0 END) AS BIGINT) AS zcr,
        CAST(max(abs(s)) AS BIGINT) AS peak
      FROM lagged GROUP BY media_id, i // 64
      ORDER BY media_id, frame_idx""")),

    // m06: audio resample — decimation (keep every 4th PCM16 sample, no
    // interpolation filter, so every kept sample is a SOURCE sample and
    // the decimated-signal stats replay exactly from the md5-derived
    // byte stream). The audio twin of m05's image resize: together they
    // complete decode/feature/resize-resample/frame-sample over both
    // modalities. Partition-local, zero shuffle.
    QuerySpec("m06_audio_resample", (s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaCorpus(
        Tables.load(s, dir, "documents").filter($"doc_id" < 200))
      media.filter($"format" === "wav")
        .select($"media_id",
          MediaCodecColumns.wavDecimateStats($"payload", 4).as("st"))
        .select($"media_id",
          element_at($"st", 1).as("n_kept"),
          element_at($"st", 2).as("energy"),
          element_at($"st", 3).as("peak"))
        .orderBy($"media_id")
    }, oracle = Some("""
      WITH media AS (
        SELECT doc_id AS media_id, 256 + (doc_id % 256) AS n
        FROM documents WHERE doc_id % 2 = 1 AND doc_id < 200),
      blocks AS (
        SELECT media_id, n, unnest(generate_series(0,
          CAST(ceil(n * 2 / 16.0) AS BIGINT) - 1)) AS b
        FROM media),
      bj AS (SELECT media_id, n, b, unnest(generate_series(0, 15)) AS j
             FROM blocks),
      bytes AS (
        SELECT media_id, n, b * 16 + j AS p,
          ('0x' || substr(md5(CAST(media_id AS VARCHAR) || '_' ||
             CAST(b AS VARCHAR)), CAST(j * 2 + 1 AS INTEGER), 2))::UBIGINT AS v
        FROM bj WHERE b * 16 + j < n * 2),
      samples AS (
        SELECT media_id, CAST(floor(p / 2) AS BIGINT) AS i,
          CAST(sum(CASE WHEN p % 2 = 0 THEN v ELSE 256 * v END) AS BIGINT)
            AS raw
        FROM bytes GROUP BY media_id, CAST(floor(p / 2) AS BIGINT)),
      sgn AS (
        SELECT media_id, i,
          CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
        FROM samples),
      dec AS (SELECT media_id, s FROM sgn WHERE i % 4 = 0)
      SELECT media_id, CAST(count(*) AS BIGINT) AS n_kept,
        CAST(sum(s * s) AS BIGINT) AS energy,
        CAST(max(abs(s)) AS BIGINT) AS peak
      FROM dec GROUP BY media_id ORDER BY media_id""")),

    // m05: image resize — nearest-neighbor downsample of the decoded P6
    // pixels to a fixed 4×4 thumbnail (the preprocessing step every
    // vision-training pipeline runs before batching). Target pixel
    // (ty, tx) samples source (ty*h div th, tx*w div tw) — all-integer,
    // so the oracle picks the identical source bytes from the
    // md5-derived stream. One row per output pixel checks every value
    // the resize produced. Partition-local, zero shuffle; output is
    // 48 longs/image regardless of source size (the 100 TB story: a
    // resize SHRINKS the data before anything wide happens).
    QuerySpec("m05_image_resize", (s, dir) => {
      import s.implicits._
      val media = Multimodal.mediaCorpus(Tables.load(s, dir, "documents"))
      media.filter($"format" === "ppm")
        .select($"media_id",
          MediaCodecColumns.ppmResize($"payload", 4, 4).as("rz"))
        .select($"media_id", posexplode(expr(
          "transform(sequence(0, size(rz) div 3 - 1)," +
            " t -> struct(rz[3*t] AS r, rz[3*t+1] AS g, rz[3*t+2] AS b))"))
          .as(Seq("pxi", "s")))
        .select($"media_id", $"pxi".cast("long").as("px"),
          $"s.r".as("r"), $"s.g".as("g"), $"s.b".as("b"))
        .orderBy($"media_id", $"px")
    }, oracle = Some("""
      WITH media AS (
        SELECT doc_id AS media_id, 8 + (doc_id % 8) AS w, 8 AS h
        FROM documents WHERE doc_id % 2 = 0),
      grid AS (
        SELECT media_id, w, h, unnest(generate_series(0, 15)) AS t
        FROM media),
      src AS (
        SELECT media_id, t,
          ((t // 4) * h // 4) * w + ((t % 4) * w // 4) AS pix
        FROM grid),
      chan AS (
        SELECT media_id, t, 3 * pix + unnest(generate_series(0, 2)) AS p,
          unnest(generate_series(0, 2)) AS c
        FROM src),
      vals AS (
        SELECT media_id, t, c,
          ('0x' || substr(md5(CAST(media_id AS VARCHAR) || '_' ||
             CAST(p // 16 AS VARCHAR)),
             CAST((p % 16) * 2 + 1 AS INTEGER), 2))::UBIGINT AS v
        FROM chan)
      SELECT media_id, CAST(t AS BIGINT) AS px,
        CAST(sum(CASE WHEN c = 0 THEN v END) AS BIGINT) AS r,
        CAST(sum(CASE WHEN c = 1 THEN v END) AS BIGINT) AS g,
        CAST(sum(CASE WHEN c = 2 THEN v END) AS BIGINT) AS b
      FROM vals GROUP BY media_id, t ORDER BY media_id, px""")),

    // ---- Sessionization over events (gap > 30 min ⇒ new session) -------
    // ---- End-to-end corpus curation (the flagship composition): quality
    // gate → language gate → exact-dedup keep-first. Every stage is a
    // zero-shuffle column expression except the final dedup window (one
    // shuffle on the fingerprint); at 100 TB this is scan → filter →
    // one exchange — the canonical training-data curation shape.
    QuerySpec("p02_curation_pipeline", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val scored = TextAnalysis
        .qualityFeatures(Tables.load(s, dir, "documents"), $"text")
        .withColumn("lang_detected", TextAnalysis.langId($"text"))
        .withColumn("fp", TextAnalysis.fingerprint($"text"))
      val kept = scored.filter($"n_words" >= 10 &&
        $"quality_score" >= 0.3 && $"lang_detected" === "en")
      kept
        .withColumn("rk", row_number().over(
          Window.partitionBy($"fp").orderBy($"doc_id")))
        .filter($"rk" === 1)
        .select($"doc_id", $"n_words",
          round($"quality_score", 6).as("quality_score"))
        .orderBy($"doc_id")
    }, oracle = Some {
      val scoreExprs = TextAnalysis.LangProfiles.map { case (lang, profile) =>
        s"""CAST(len(list_filter(${sqlList(profile)},
           p -> list_contains(toks, p))) AS DOUBLE) / ${profile.size}.0 AS s_$lang"""
      }.mkString(",\n          ")
      val caseArms = TextAnalysis.LangProfiles.map { case (lang, _) =>
        s"WHEN s_$lang = best AND best > 0 THEN '$lang'"
      }.mkString("\n          ")
      val bestExpr = TextAnalysis.LangProfiles
        .map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
      s"""
      WITH f AS (
        SELECT doc_id, text,
          len(string_split_regex(trim(text), '\\s+')) AS n_words,
          CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
              t -> list_contains(${sqlList(TextAnalysis.Stopwords)}, t))) AS DOUBLE)
            / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio,
          list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks,
          md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents),
      q AS (
        SELECT *, round(least(1.0, stopword_ratio * 2.0 +
          CASE WHEN n_words >= 50 THEN 0.5
               ELSE CAST(n_words AS DOUBLE) / 100.0 END), 6) AS quality_score,
          $scoreExprs
        FROM f),
      b AS (SELECT *, $bestExpr AS best FROM q),
      l AS (SELECT *, CASE $caseArms ELSE 'und' END AS lang_detected FROM b),
      kept AS (
        SELECT * FROM l
        WHERE n_words >= 10 AND quality_score >= 0.3 AND lang_detected = 'en'),
      dedup AS (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rk
        FROM kept)
      SELECT doc_id, n_words, quality_score
      FROM dedup WHERE rk = 1 ORDER BY doc_id"""
    }, bench = true),

    // Sequence packing (concat-then-chunk): the global token stream cut
    // into 2048-token context windows. The Spark side runs a DISTRIBUTED
    // prefix sum (range-partition -> per-partition subtotals -> broadcast
    // offsets), never a single-partition window (plan-asserted); the
    // oracle replays the same exact-integer layout with a plain ordered
    // cumsum.
    QuerySpec("p03_sequence_chunks", (s, dir) => {
      import s.implicits._
      Packing.sequenceChunks(
          Tables.load(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text", window = 2048)
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH counted AS (
        SELECT doc_id,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
            AS n_tokens
        FROM documents),
      c2 AS (
        SELECT doc_id, n_tokens,
          CAST(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
        FROM counted)
      SELECT doc_id, n_tokens,
        CAST(tok_end - n_tokens AS BIGINT) AS tok_start,
        CAST(floor((tok_end - n_tokens) / 2048.0) AS BIGINT) AS chunk_first,
        CAST(floor(greatest(tok_end - 1, tok_end - n_tokens) / 2048.0)
          AS BIGINT) AS chunk_last
      FROM c2 ORDER BY doc_id"""), bench = true),

    // Sequence packing over the MATERIALIZED tokenizer output: p03's
    // concat-then-chunk layout computed from t22's staged token-id
    // table, so the window math runs on REAL BPE token counts
    // (size(token_ids)) instead of the whitespace proxy — the
    // composition a training pipeline actually ships (encode -> pack).
    // Same distributed prefix-sum (never a single-partition window);
    // the oracle re-derives each doc's BPE token count from the corpus
    // (12-stage merge replay -> per-word segment counts) and replays
    // the cumsum layout.
    QuerySpec("p28_pack_token_ids", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val merges = learnedBpeMerges(s, dir)
      TextAnalysis.ensureBpeTokensStaged(s, dir, docs, "doc_id", "text",
        merges)
      Packing.sequenceChunksFromCounts(
          s.table(TextAnalysis.bpeStagedTable(dir, merges))
            .select($"doc_id".cast("long").as("id"),
              size($"token_ids").cast("long").as("n_tokens")),
          "doc_id", window = 512)
        .orderBy($"doc_id")
    }, oracle = Some(bpeOracle(12, """,
      wsegs AS MATERIALIZED (
        SELECT w, CAST(len(string_split(substr(rep, 2, length(rep) - 2),
          '||')) AS BIGINT) AS nseg
        FROM rep12),
      dwords AS (
        SELECT doc_id, wi, ws[wi] AS w
        FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS wi
              FROM (SELECT doc_id,
                      string_split_regex(trim(text), '\s+') AS ws
                    FROM documents))
        WHERE length(ws[wi]) >= 1 AND ws[wi] NOT LIKE '%|%'),
      counts AS (
        SELECT doc_id, CAST(sum(s.nseg) AS BIGINT) AS n_tokens
        FROM dwords d JOIN wsegs s USING (w) GROUP BY doc_id),
      c2 AS (
        SELECT doc_id, n_tokens,
          CAST(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
        FROM counts)
      SELECT doc_id, n_tokens,
        CAST(tok_end - n_tokens AS BIGINT) AS tok_start,
        CAST(floor((tok_end - n_tokens) / 512.0) AS BIGINT) AS chunk_first,
        CAST(floor(greatest(tok_end - 1, tok_end - n_tokens) / 512.0)
          AS BIGINT) AS chunk_last
      FROM c2 ORDER BY doc_id"""))),

    // As-of join: each purchase event attached to the user's latest view
    // event at or before it (last-touch attribution). Spark side is the
    // union-merge single-shuffle formulation (operators/AsOf.scala — no
    // join node, plan-asserted); the oracle is DuckDB's native ASOF LEFT
    // JOIN, a genuinely independent implementation. Both compare on
    // microseconds (events ts is nanos in parquet; Tables.load truncates,
    // epoch_us truncates identically — fixtures have no sub-µs ties).
    QuerySpec("p04_asof_join", (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id", $"ts")
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"event_id", $"ts", $"value")
      AsOf.asofBackward(purchases, views, Seq("user_id"),
          "ts", "ts", tiebreakCol = "event_id", prefix = "view_")
        .select($"user_id", $"event_id", unix_micros($"ts").as("t_us"),
          $"view_event_id", $"view_value",
          (unix_micros($"ts") - unix_micros($"view_ts")).as("gap_us"))
        .orderBy($"user_id", $"event_id")
    }, oracle = Some("""
      WITH l AS (
        SELECT user_id, event_id, epoch_us(ts) AS t_us FROM events
        WHERE event_type = 'purchase'),
      r AS (
        SELECT user_id, event_id, epoch_us(ts) AS t_us, value FROM events
        WHERE event_type = 'view')
      SELECT l.user_id, l.event_id, l.t_us,
        r.event_id AS view_event_id, r.value AS view_value,
        l.t_us - r.t_us AS gap_us
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.t_us >= r.t_us
      ORDER BY l.user_id, l.event_id"""), bench = true),

    // Per-source quota (C4/Gopher-style domain cap): keep each source's
    // 10 longest documents. Runs the bounded top-k Aggregator — map-side
    // k-capped partials, k·partitions shuffle rows per source however hot
    // the source — not a whole-group window sort. Score n_chars is an
    // exact integer, so the ranked-window oracle replays the boundary
    // bit-for-bit (ties broken by doc_id asc on both sides).
    QuerySpec("p05_source_quota", (s, dir) => {
      import s.implicits._
      Quota.keepTopKPerGroup(
          Tables.load(s, dir, "documents").select($"source", $"doc_id", $"n_chars"),
          "source", "doc_id", "n_chars", k = 10)
        .select($"source", $"rank", $"doc_id",
          $"score".cast("long").as("n_chars"))
        .orderBy($"source", $"rank")
    }, oracle = Some("""
      WITH ranked AS (
        SELECT source, doc_id, n_chars,
          row_number() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id) AS rank
        FROM documents)
      SELECT source, CAST(rank AS BIGINT) AS rank, doc_id,
        CAST(n_chars AS BIGINT) AS n_chars
      FROM ranked WHERE rank <= 10
      ORDER BY source, rank""")),

    // Deterministic corpus shuffle (Packing.deterministicShuffle): global
    // md5-permutation position + round-robin shard, computed by the
    // distributed prefix-rank — NOT the single-partition global-ORDER
    // window the oracle uses (PackingSpec plan-asserts its absence).
    QuerySpec("p06_corpus_shuffle", (s, dir) => {
      import s.implicits._
      Packing.deterministicShuffle(
          Tables.load(s, dir, "documents").select($"doc_id"),
          "doc_id", seed = "graft-epoch-0", nShards = 8)
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH keyed AS (
        SELECT doc_id,
          md5(concat('graft-epoch-0', ':', CAST(doc_id AS VARCHAR))) AS k
        FROM documents),
      ranked AS (
        SELECT doc_id,
          CAST(row_number() OVER (ORDER BY k, doc_id) - 1 AS BIGINT) AS pos
        FROM keyed)
      SELECT doc_id, pos, pos % 8 AS shard FROM ranked
      ORDER BY doc_id""")),

    // Conversion-funnel analysis: per signed-up user, the first view at
    // or after signup and the first purchase at or after that view —
    // ordered-stage funnels are min-aggregations + stage-gated joins
    // (one shuffle per stage on user_id, no window, no self-cross).
    QuerySpec("p07_funnel", (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"user_id", $"event_type", unix_micros($"ts").as("t"))
      val signup = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"t").as("t_signup"))
      val view = ev.filter($"event_type" === "view")
        .join(signup, "user_id").filter($"t" >= $"t_signup")
        .groupBy($"user_id").agg(min($"t").as("t_view"))
      val purchase = ev.filter($"event_type" === "purchase")
        .join(view, "user_id").filter($"t" >= $"t_view")
        .groupBy($"user_id").agg(min($"t").as("t_purchase"))
      signup.join(view, Seq("user_id"), "left")
        .join(purchase, Seq("user_id"), "left")
        .select($"user_id", $"t_signup", $"t_view", $"t_purchase")
        .orderBy($"user_id")
    }, oracle = Some("""
      WITH su AS (
        SELECT user_id, min(epoch_us(ts)) AS t_signup FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
      vw AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t_view
        FROM events e JOIN su ON e.user_id = su.user_id
        WHERE e.event_type = 'view' AND epoch_us(e.ts) >= su.t_signup
        GROUP BY e.user_id),
      pu AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase
        FROM events e JOIN vw ON e.user_id = vw.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= vw.t_view
        GROUP BY e.user_id)
      SELECT su.user_id, su.t_signup, vw.t_view, pu.t_purchase
      FROM su
      LEFT JOIN vw ON su.user_id = vw.user_id
      LEFT JOIN pu ON su.user_id = pu.user_id
      ORDER BY su.user_id""")),

    // ---- Retention cohort matrix: cohort = each user's first-purchase
    // day; cell (cohort, week_offset) = distinct users purchasing that
    // many weeks later. Scale shape: the purchase stream shuffles ONCE
    // on user_id (cohort agg + self-join are co-partitioned; AQE
    // broadcasts the cohort side while it fits), then one
    // (cohort, offset) shuffle with map-side partial distinct — no
    // windows, nothing all-pairs. All keys exact (date_trunc + integer
    // day arithmetic).
    QuerySpec("p09_retention_cohorts", (s, dir) => {
      import s.implicits._
      val p = Tables.load(s, dir, "events")
        .filter($"event_type" === "purchase")
        .select($"user_id", date_trunc("day", $"ts").as("d"))
      val cohort = p.groupBy($"user_id").agg(min($"d").as("cohort_day"))
      p.join(cohort, "user_id")
        .groupBy($"cohort_day",
          expr("datediff(d, cohort_day) div 7").cast("long").as("week_offset"))
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort_day", $"week_offset")
    }, oracle = Some("""
      WITH p AS (
        SELECT user_id, date_trunc('day', ts) AS d FROM events
        WHERE event_type = 'purchase'),
      cohort AS (
        SELECT user_id, min(d) AS cohort_day FROM p GROUP BY user_id)
      SELECT c.cohort_day,
        CAST(date_diff('day', c.cohort_day, e.d) // 7 AS BIGINT)
          AS week_offset,
        CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
      FROM p e JOIN cohort c USING (user_id)
      GROUP BY c.cohort_day, week_offset
      ORDER BY cohort_day, week_offset""")),

    QuerySpec("p01_sessionization", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.load(s, dir, "events")
        .withColumn("new_s",
          when(unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(byUser)
            > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("session_id", sum($"new_s").over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id")
        .agg(countDistinct($"session_id").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    }, oracle = Some("""
      WITH marked AS (
        SELECT user_id, event_id, ts,
          CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
              (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
            THEN 1 ELSE 0 END AS new_s
        FROM events),
      sess AS (
        SELECT user_id, sum(new_s) OVER (PARTITION BY user_id
          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked)
      SELECT user_id, count(DISTINCT session_id) AS n_sessions,
        count(*) AS n_events
      FROM sess GROUP BY user_id ORDER BY user_id"""), bench = true),

    // ---- Interval (range) join via grid bucketing: lineitems shipped
    // inside any urgent order's 7-day launch window, counted per ship
    // day. A BETWEEN predicate has no equality, so the naive Spark plan
    // is BroadcastNestedLoopJoin — all pairs, one unsplittable stage.
    // RangeJoin.pointInInterval restores an equi-key by exploding each
    // interval into its covered 7-day grid cells and hash-joining on the
    // cell id (≤ 2 cells per 7-day window), with the exact containment
    // check bucket-local. PlanAuditSpec pins the no-nested-loop shape.
    QuerySpec("p18_interval_join", (s, dir) => {
      import s.implicits._
      val day = 86400000000L
      // pre-aggregate points per day BEFORE the range join: every lineitem
      // shipped the same day matches the same windows, so the join probes
      // shrink from |lineitem| rows to |distinct days| (600k -> ~2.4k at
      // sf0.1, and the same ~2.4k at 100 TB — the probe side becomes
      // CALENDAR-sized while all row-count weight rides in one long).
      // n_pairs is then a weighted count: sum of per-day multiplicities.
      val pts = Tables.load(s, dir, "lineitem")
        .select(expr(s"unix_micros(l_shipdate) div ${day}L").as("ship_day"))
        .groupBy($"ship_day").agg(count(lit(1)).as("n_pts"))
      val win = Tables.load(s, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey",
          expr(s"unix_micros(o_orderdate) div ${day}L").as("lo"))
        .withColumn("hi", $"lo" + 6L)
      RangeJoin.pointInInterval(pts, $"ship_day", win, $"lo", $"hi", cell = 7L)
        .groupBy($"ship_day")
        .agg(sum($"n_pts").as("n_pairs"),
          countDistinct($"o_orderkey").as("n_windows"))
        .orderBy($"ship_day")
    }, oracle = Some("""
      WITH pts AS (
        SELECT epoch_us(l_shipdate) // 86400000000 AS ship_day
        FROM lineitem),
      win AS (
        SELECT o_orderkey, epoch_us(o_orderdate) // 86400000000 AS lo
        FROM orders WHERE o_orderpriority = '1-URGENT')
      SELECT ship_day, count(*) AS n_pairs,
        CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_windows
      FROM pts JOIN win ON pts.ship_day BETWEEN win.lo AND win.lo + 6
      GROUP BY ship_day ORDER BY ship_day"""), bench = true),

    // ---- Per-node triangle counts over the co-supplier graph (edge =
    // two suppliers sharing >= 30 orders; the threshold makes the graph
    // sparse at the verification SF). Spark enumerates via degree-ordered
    // orientation (compact-forward — wedge centers capped at O(sqrt m)
    // out-degree regardless of hubs); the oracle enumerates id-ordered.
    // The triangle SET is orientation-invariant, so the per-node counts
    // hash-match even though the two engines walk the graph differently.
    QuerySpec("p19_triangle_count", (s, dir) => {
      import s.implicits._
      val ls = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey".as("k"), $"l_suppkey".as("a")).distinct()
      val edges = ls.join(ls.withColumnRenamed("a", "b"), "k")
        .filter($"a" < $"b")
        .groupBy($"a", $"b").agg(count(lit(1)).as("c"))
        .filter($"c" >= 30).select($"a", $"b")
      Graph.triangleCounts(edges).orderBy($"node")
    }, oracle = Some("""
      WITH ls AS (
        SELECT DISTINCT l_orderkey AS k, l_suppkey AS s FROM lineitem),
      e AS (
        SELECT x.s AS a, y.s AS b FROM ls x JOIN ls y
        ON x.k = y.k AND x.s < y.s
        GROUP BY x.s, y.s HAVING count(*) >= 30),
      tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM e e1 JOIN e e2 ON e2.a = e1.b
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      nodes AS (
        SELECT DISTINCT node FROM (
          SELECT a AS node FROM e UNION ALL SELECT b FROM e)),
      cnt AS (
        SELECT node, count(*) AS t FROM (
          SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri) GROUP BY node)
      SELECT n.node, CAST(coalesce(c.t, 0) AS BIGINT) AS n_triangles
      FROM nodes n LEFT JOIN cnt c USING (node) ORDER BY node"""),
      bench = true),

    // ---- Multi-touch attribution: every view by the same user in the
    // trailing 24 h before a purchase is a touch; the purchase's credit
    // splits linearly (w_ppm = 1000000 div n, integer-exact). The p04
    // as-of join is LAST-touch; this is the every-touch window variant —
    // and the join key is (user_id, time-cell), so a bot user's candidate
    // set is cut by the grid instead of going quadratic in their events
    // (the skew that kills a bare user-keyed join at 100 TB).
    QuerySpec("p21_multitouch_attribution", (s, dir) => {
      import s.implicits._
      val winUs = 86400000000L // 24 h in micros
      val ev = Tables.load(s, dir, "events")
      val views = ev.filter($"event_type" === "view")
        .select($"user_id", $"event_id".as("view_id"),
          unix_micros($"ts").as("tv"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"),
          unix_micros($"ts").as("tp"))
        .withColumn("lo", $"tp" - winUs).withColumn("hi", $"tp")
      RangeJoin.pointInInterval(views, $"tv", purchases,
          $"lo", $"hi", cell = winUs, keys = Seq("user_id"))
        .groupBy($"user_id", $"purchase_id")
        .agg(count(lit(1)).as("n_touches"),
          expr("CAST(1000000 div count(1) AS BIGINT)").as("w_ppm"),
          min($"tv").as("t_first_touch"))
        .orderBy($"purchase_id")
    }, oracle = Some("""
      WITH v AS (
        SELECT user_id, event_id AS view_id, epoch_us(ts) AS tv
        FROM events WHERE event_type = 'view'),
      p AS (
        SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS tp
        FROM events WHERE event_type = 'purchase')
      SELECT p.user_id, p.purchase_id, count(*) AS n_touches,
        CAST(1000000 // count(*) AS BIGINT) AS w_ppm,
        min(v.tv) AS t_first_touch
      FROM p JOIN v ON v.user_id = p.user_id
        AND v.tv BETWEEN p.tp - 86400000000 AND p.tp
      GROUP BY p.user_id, p.purchase_id
      ORDER BY purchase_id""")),

    // ---- Deterministic weight-proportional sample: expected-~100-doc
    // Bernoulli sample with P(keep) ∝ n_chars, decided by one exact
    // wide-integer comparison per row (no RNG, no sort, no shuffle) —
    // the importance sampler behind "sample a mixture, long docs more
    // often". Spark compares in DECIMAL(38,0); the oracle replays the
    // same comparison in int128 — identical kept SET by construction.
    QuerySpec("p20_weighted_sample", (s, dir) => {
      import s.implicits._
      Stats.weightedHashSample(
          Tables.load(s, dir, "documents")
            .select($"doc_id", $"source", $"n_chars"),
          "doc_id", "n_chars", targetK = 100L, salt = "ws1")
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH tot AS (SELECT sum(n_chars)::HUGEINT AS w FROM documents)
      SELECT doc_id, source, n_chars FROM documents, tot
      WHERE ('0x' || substr(md5('ws1:' || CAST(doc_id AS VARCHAR)), 1, 15))
              ::UBIGINT::HUGEINT * w
        < 1152921504606846976::HUGEINT * 100 * n_chars
      ORDER BY doc_id""")),

    // ---- Compressed-domain near-dup SEARCH: top-3 corpus docs per probe
    // (every 25th doc) by SimHash Hamming distance, candidates blocked on
    // the d03 16-bit-chunk rule and ranked by the bounded TopKByScore
    // heap. The oracle rebuilds the signatures from md5(token) halves
    // (the d03 derivation), replays the chunk join INCLUDING the
    // first-matching-chunk dedupe and the per-posting cap, and ranks with
    // a window — so the banding trade itself is hash-checked, not just
    // the distances.
    QuerySpec("s14_hamming_topk", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      Similarity.hammingTopK(docs, "doc_id",
          docs.filter($"doc_id" % 25 === 0), "doc_id", "text", k = 3)
        .orderBy($"q_id", $"rank")
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS t
        FROM documents),
      th AS (
        SELECT doc_id,
          ('0x' || substr(md5(t), 1, 8))::UBIGINT AS hi,
          ('0x' || substr(md5(t), 9, 8))::UBIGINT AS lo
        FROM toks),
      bits AS (
        SELECT doc_id, j.range AS j,
          sum(CASE WHEN
            ((CASE WHEN j.range < 32 THEN lo >> j.range
                   ELSE hi >> (j.range - 32) END) & 1) = 1
            THEN 1 ELSE -1 END) AS c
        FROM th, range(64) j
        GROUP BY doc_id, j.range),
      sigs AS (
        SELECT doc_id AS id,
          CAST(sum(CASE WHEN c >= 0 AND j >= 32
            THEN (1::UBIGINT << CAST(j - 32 AS INTEGER)) ELSE 0 END)
            AS UBIGINT) AS sig_hi,
          CAST(sum(CASE WHEN c >= 0 AND j < 32
            THEN (1::UBIGINT << CAST(j AS INTEGER)) ELSE 0 END)
            AS UBIGINT) AS sig_lo
        FROM bits GROUP BY doc_id),
      ch AS (
        SELECT id, sig_hi, sig_lo, j.range AS c,
          CASE WHEN j.range = 0 THEN sig_lo & 65535
               WHEN j.range = 1 THEN (sig_lo >> 16) & 65535
               WHEN j.range = 2 THEN sig_hi & 65535
               ELSE (sig_hi >> 16) & 65535 END AS v
        FROM sigs, range(4) j),
      cch AS (
        SELECT * FROM (
          SELECT ch.*, row_number() OVER
            (PARTITION BY c, v ORDER BY id) AS rk FROM ch)
        WHERE rk <= 4096),
      cand AS (
        SELECT p.id AS q_id, cc.id AS doc_id,
          bit_count(xor(p.sig_hi, cc.sig_hi)) +
          bit_count(xor(p.sig_lo, cc.sig_lo)) AS hamming
        FROM ch p JOIN cch cc ON p.c = cc.c AND p.v = cc.v AND p.id <> cc.id
        WHERE p.id % 25 = 0
          AND p.c = CASE
            WHEN (xor(p.sig_lo, cc.sig_lo)) & 65535 = 0 THEN 0
            WHEN (xor(p.sig_lo, cc.sig_lo) >> 16) & 65535 = 0 THEN 1
            WHEN (xor(p.sig_hi, cc.sig_hi)) & 65535 = 0 THEN 2
            ELSE 3 END),
      ranked AS (
        SELECT q_id, doc_id, hamming, row_number() OVER
          (PARTITION BY q_id ORDER BY hamming, doc_id) AS rank
        FROM cand)
      SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id,
        CAST(hamming AS BIGINT) AS hamming
      FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""")),

    // k-core decomposition (Graph.kCore): synchronous Matula–Beck
    // peeling of the p19 supplier co-occurrence graph, 6 unrolled
    // rounds (fixpoint at round 4 on the gate fixture — margin pinned
    // in GraphSpec). Survivors = the 6-core with per-node core degrees.
    // The oracle unrolls the same 6 (degree, keep, filter) rounds as
    // chained CTEs — peeling is integer-exact, so the round-for-round
    // replay hash-matches.
    QuerySpec("p23_kcore", (s, dir) => {
      import s.implicits._
      val ls = Tables.load(s, dir, "lineitem")
        .select($"l_orderkey".as("k"), $"l_suppkey".as("a")).distinct()
      val edges = ls.join(ls.withColumnRenamed("a", "b"), "k")
        .filter($"a" < $"b")
        .groupBy($"a", $"b").agg(count(lit(1)).as("c"))
        .filter($"c" >= 30).select($"a", $"b")
      Graph.kCore(edges, k = 6, rounds = 6).orderBy($"node")
    }, oracle = Some(s"""
      WITH ls AS (
        SELECT DISTINCT l_orderkey AS k, l_suppkey AS s FROM lineitem),
      e0 AS MATERIALIZED (
        SELECT x.s AS a, y.s AS b FROM ls x JOIN ls y
        ON x.k = y.k AND x.s < y.s
        GROUP BY x.s, y.s HAVING count(*) >= 30),${kCoreCtes(6, 6)}
      SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
        SELECT a AS node FROM e6 UNION ALL SELECT b FROM e6)
      GROUP BY node ORDER BY node""")),

    // Snapshot diff: content-based compare of two corpus versions —
    // the regression gate between dataset releases (what changed, not
    // just row counts). v2 = v1 minus every 10th doc (removed), plus
    // 25 new ids (added), plus every 7th doc truncated (modified).
    // One full-outer join on id; md5 decides modified-vs-unchanged so
    // the diff never ships text twice. Counts per class ride along.
    QuerySpec("p27_snapshot_diff", (s, dir) => {
      import s.implicits._
      val v1 = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val v2base = v1.filter($"doc_id" % 10 =!= 0)
        .withColumn("text", when($"doc_id" % 7 === 0,
          substring($"text", 1, 40)).otherwise($"text"))
      val v2 = v2base.unionByName(
        v1.filter($"doc_id" < 25)
          .select(($"doc_id" + 300000L).as("doc_id"), $"text"))
      val a = v1.select($"doc_id", md5($"text").as("h1"))
      val b = v2.select($"doc_id", md5($"text").as("h2"))
      a.join(b, Seq("doc_id"), "full_outer")
        .withColumn("change",
          when($"h1".isNull, "added")
            .when($"h2".isNull, "removed")
            .when($"h1" === $"h2", "unchanged")
            .otherwise("modified"))
        .filter($"change" =!= "unchanged")
        .select($"doc_id", $"change")
        .orderBy($"change", $"doc_id")
    }, oracle = Some("""
      WITH v1 AS (SELECT doc_id, text FROM documents),
      v2 AS (
        SELECT doc_id,
          CASE WHEN doc_id % 7 = 0 THEN substr(text, 1, 40)
               ELSE text END AS text
        FROM v1 WHERE doc_id % 10 <> 0
        UNION ALL
        SELECT doc_id + 300000 AS doc_id, text FROM v1 WHERE doc_id < 25),
      a AS (SELECT doc_id, md5(text) AS h1 FROM v1),
      b AS (SELECT doc_id, md5(text) AS h2 FROM v2),
      j AS (
        SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
          CASE WHEN a.h1 IS NULL THEN 'added'
               WHEN b.h2 IS NULL THEN 'removed'
               WHEN a.h1 = b.h2 THEN 'unchanged'
               ELSE 'modified' END AS change
        FROM a FULL OUTER JOIN b ON b.doc_id = a.doc_id)
      SELECT doc_id, change FROM j WHERE change <> 'unchanged'
      ORDER BY change, doc_id""")),

    // Curriculum interleave (TextAnalysis.curriculumInterleave):
    // the deterministic global training order — longest-first within
    // source, weighted fair queuing across sources (doc r of source s
    // at virtual time r·1e6 div weight_ppm), so every window of the
    // stream is on-mixture. All-integer; the oracle replays rank,
    // weights, vtime, and the totalized position.
    QuerySpec("p26_curriculum_interleave", (s, dir) => {
      import s.implicits._
      TextAnalysis.curriculumInterleave(
          Tables.load(s, dir, "documents")
            .select($"doc_id", $"source", $"text"),
          "doc_id", "source", "text")
        .orderBy($"pos")
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id, source,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        FROM documents),
      mass AS (SELECT source, CAST(sum(n) AS BIGINT) AS m
               FROM toks GROUP BY source),
      tot AS (SELECT CAST(sum(m) AS BIGINT) AS t FROM mass),
      q AS (
        SELECT source, m,
          CAST(floor(1000000.0 *
            sqrt(CAST(m AS DOUBLE) / CAST(t AS DOUBLE))) AS BIGINT) AS w
        FROM mass CROSS JOIN tot),
      sw AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM q),
      wt AS (SELECT source, (w * 1000000 // sw.sw) AS weight_ppm
             FROM q CROSS JOIN sw),
      ranked AS (
        SELECT doc_id, source, n AS n_toks,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY n DESC, doc_id) AS BIGINT) AS r
        FROM toks),
      vt AS (
        SELECT ranked.*, (r * 1000000) // wt.weight_ppm AS vtime
        FROM ranked JOIN wt USING (source))
      SELECT CAST(row_number() OVER
          (ORDER BY vtime, source, r) AS BIGINT) AS pos,
        doc_id, source, r, CAST(vtime AS BIGINT) AS vtime
      FROM vt ORDER BY pos""")),

    // Temperature-scaled mixture resample (TextAnalysis
    // .temperatureMixtureSample): p10's sqrt-flattened source weights
    // made actionable — each source gets target tokens ∝ weight_ppm,
    // each doc survives with probability target/m decided by one exact
    // wide-decimal md5 compare (the p20 mechanism). Deterministic,
    // partitioning-independent, fully oracle-replayed (weights,
    // targets, hash, compare).
    QuerySpec("p25_temperature_mixture", (s, dir) => {
      import s.implicits._
      TextAnalysis.temperatureMixtureSample(
          Tables.load(s, dir, "documents")
            .select($"doc_id", $"source", $"text"),
          "doc_id", "source", "text",
          targetTokens = 8000L, salt = "mix")
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id, source, text,
          CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        FROM documents),
      mass AS (SELECT source, CAST(sum(n) AS BIGINT) AS m
               FROM toks GROUP BY source),
      tot AS (SELECT CAST(sum(m) AS BIGINT) AS t FROM mass),
      q AS (
        SELECT source, m,
          CAST(floor(1000000.0 *
            sqrt(CAST(m AS DOUBLE) / CAST(t AS DOUBLE))) AS BIGINT) AS w
        FROM mass CROSS JOIN tot),
      sw AS (SELECT CAST(sum(w) AS BIGINT) AS sw FROM q),
      wt AS (
        SELECT source, m,
          (8000 * (w * 1000000 // sw.sw)) // 1000000 AS target_toks
        FROM q CROSS JOIN sw),
      d AS (
        SELECT doc_id, source, n,
          ('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)),
            1, 15))::UBIGINT AS h60
        FROM toks)
      SELECT d.doc_id, d.source, d.n AS n_toks
      FROM d JOIN wt USING (source)
      WHERE CAST(d.h60 AS HUGEINT) * wt.m <
        CAST('1152921504606846976' AS HUGEINT) * wt.target_toks
      ORDER BY d.doc_id""")),

    // Time-series resample + LOCF (Stats.resampleLocf): per-user
    // 6-hour grid spanning each user's own event range; purchase
    // values land on their cell by integer arithmetic (equi-join, no
    // range join) and carry forward across gaps via IGNORE NULLS.
    // The densification pass before any fixed-frequency featurization.
    QuerySpec("p24_resample_locf", (s, dir) => {
      import s.implicits._
      Stats.resampleLocf(
          Tables.load(s, dir, "events").filter($"user_id" < 20),
          "user_id", "ts", "value",
          obsPred = col("event_type") === "purchase", stepHours = 6)
        .select($"user_id", $"h", $"obs_v", $"filled")
        .orderBy($"user_id", $"h")
    }, oracle = Some("""
      WITH e AS (
        SELECT user_id, ts, event_type, value FROM events
        WHERE user_id < 20),
      b AS (
        SELECT user_id, date_trunc('hour', min(ts)) AS t0,
          max(ts) AS tmax
        FROM e GROUP BY user_id),
      grid AS (
        SELECT user_id,
          unnest(generate_series(t0, tmax, INTERVAL 6 HOUR)) AS h
        FROM b),
      obs AS (
        SELECT e.user_id,
          b.t0 + (INTERVAL 6 HOUR) *
            CAST((epoch_us(e.ts) - epoch_us(b.t0)) // 21600000000
              AS BIGINT) AS h,
          max(e.value) AS obs_v
        FROM e JOIN b ON b.user_id = e.user_id
        WHERE e.event_type = 'purchase'
        GROUP BY 1, 2),
      j AS (
        SELECT g.user_id, g.h, o.obs_v
        FROM grid g LEFT JOIN obs o
          ON o.user_id = g.user_id AND o.h = g.h)
      SELECT user_id, h, obs_v,
        last_value(obs_v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY h
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      FROM j ORDER BY user_id, h""")),

    // Containment near-dup (Dedup.containmentPairs): asymmetric Jaccard
    // |A∩B|/|A| over distinct 8-gram sets — catches the planted
    // truncations (each is a strict gram-subset of its source, so
    // containment hits 1.0 where symmetric Jaccard stays below any
    // useful threshold). Candidates via the LOSSLESS directed prefix
    // filter (rarest grams only — a hot gram never reaches the join),
    // exact array-intersect verify; the oracle is therefore plain brute
    // force, like d04's.
    QuerySpec("d16_containment", (s, dir) => {
      import s.implicits._
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val corpus = docs.unionByName(
        Dedup.withPlantedDups(docs, "doc_id", "text", nPlant = 40,
          idOffset = 100000L, dropWords = 5).filter($"doc_id" >= 100000L))
      Dedup.containmentPairs(corpus, "doc_id", "text", n = 8,
          thresholdPpm = 800000L)
        .orderBy($"id_a", $"id_b")
    }, oracle = Some("""
      WITH base AS (SELECT doc_id, text FROM documents),
      planted AS (
        SELECT doc_id + 100000 AS doc_id,
          array_to_string(list_slice(string_split_regex(trim(text), '\s+'),
            1, greatest(len(string_split_regex(trim(text), '\s+')) - 5, 1)),
            ' ') AS text
        FROM base WHERE doc_id < 40),
      corpus AS (
        SELECT doc_id, text FROM base
        UNION ALL SELECT doc_id, text FROM planted),
      grams AS (
        SELECT DISTINCT doc_id AS id,
          unnest(list_transform(
            generate_series(1, greatest(len(tk) - 8, 0) + 1),
            i -> array_to_string(list_slice(tk, i, i + 7), ' '))) AS t
        FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk
              FROM corpus)),
      sizes AS (
        SELECT id AS id_a, CAST(count(*) AS BIGINT) AS sz_a
        FROM grams GROUP BY id),
      pairs AS (
        SELECT x.id AS id_a, y.id AS id_b, count(*) AS shared
        FROM grams x JOIN grams y ON x.t = y.t AND x.id <> y.id
        GROUP BY x.id, y.id)
      SELECT id_a, id_b,
        CAST((shared * 1000000) // sz_a AS BIGINT) AS containment_ppm
      FROM pairs JOIN sizes USING (id_a)
      WHERE (shared * 1000000) // sz_a >= 800000
      ORDER BY id_a, id_b""")),

    // Maximum-inner-product search (Similarity.mipsTopK): top-k by RAW
    // dot product — the recommender/two-tower objective, different
    // from cosine whenever norms vary. The Shrivastava–Li augmentation
    // (mipsLshTopK) is the indexed scale path, recall- and
    // exactness-pinned in DedupSpec; this entry oracles the exact scan.
    QuerySpec("s18_mips", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      Similarity.mipsTopK(embs.filter($"vec_id" =!= 0), "vec_id",
          "embedding", q, k = 20)
        .select($"vec_id", round($"dot", 9).as("dot"))
    }, oracle = Some("""
      WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      scored AS (
        SELECT c.vec_id,
          list_aggregate(list_transform(list_zip(c.embedding, qe),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')
            AS dot
        FROM embeddings c, q WHERE c.vec_id <> 0)
      SELECT vec_id, round(dot, 9) AS dot FROM scored
      ORDER BY dot DESC, vec_id LIMIT 20""")),

    // Reciprocal-rank fusion (hybrid retrieval): the standard way a
    // RAG stack combines a lexical retriever with a vector retriever —
    // score = Σ 1/(k + rank_i) over the lists that returned the doc
    // (Cormack et al. SIGIR'09, k = 60). Ranks come from s07's BM25
    // top-20 and s01's exact cosine top-20 (vec_id ≡ doc_id in the
    // fixtures); contributions in integer micro-units (1e6 div (k +
    // rank)) so the fusion is engine-exact. Full-outer on doc id:
    // a doc in either list scores.
    QuerySpec("s17_rrf_fusion", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, dir, "documents").select($"doc_id", $"text")
      val lex = Retrieval.bm25TopK(docs, "doc_id", "text",
          terms = Seq("vector", "stream", "merge", "window", "spark"),
          topK = 20)
        .withColumn("r_lex", row_number().over(
          Window.orderBy($"score_micros".desc, $"doc_id")).cast("long"))
      val embs = Tables.load(s, dir, "embeddings")
      val q = embs.filter($"vec_id" === 0)
        .select($"embedding").head().getSeq[Float](0)
      val vec = Similarity.bruteForceTopK(embs.filter($"vec_id" =!= 0),
          "vec_id", "embedding", q, 20)
        .withColumn("r_vec", row_number().over(
          Window.orderBy($"cos".desc, $"vec_id")).cast("long"))
      lex.select($"doc_id", $"r_lex")
        .join(vec.select($"vec_id".as("doc_id"), $"r_vec"),
          Seq("doc_id"), "full_outer")
        .withColumn("rrf_micros",
          expr("coalesce(1000000L div (60 + r_lex), 0L) + " +
            "coalesce(1000000L div (60 + r_vec), 0L)"))
        .select($"doc_id", $"r_lex", $"r_vec", $"rrf_micros")
        .orderBy($"rrf_micros".desc, $"doc_id").limit(10)
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        FROM documents),
      stats AS (
        SELECT count(*) AS n, CAST(sum(len(t)) AS BIGINT) AS tot FROM toks),
      tf AS (
        SELECT doc_id, dl, tok, count(*) AS tf FROM (
          SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS tok
          FROM toks)
        WHERE tok IN ('vector','stream','merge','window','spark')
        GROUP BY doc_id, dl, tok),
      df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
      bm AS (
        SELECT tf.doc_id,
          CAST(sum(CAST(floor(1000000.0 *
            ln((stats.n - df.df + 0.5) / (df.df + 0.5) + 1.0) *
            (tf.tf * 2.2) /
            (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl /
              (CAST(stats.tot AS DOUBLE) / stats.n)))) AS BIGINT))
            AS BIGINT) AS score_micros
        FROM tf JOIN df USING (tok) CROSS JOIN stats
        GROUP BY tf.doc_id
        ORDER BY score_micros DESC, doc_id LIMIT 20),
      lex AS (
        SELECT doc_id, CAST(row_number() OVER
          (ORDER BY score_micros DESC, doc_id) AS BIGINT) AS r_lex
        FROM bm),
      qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
      cosod AS (
        SELECT c.vec_id AS doc_id,
          list_aggregate(list_transform(list_zip(c.embedding, qe),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(c.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(qe,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM embeddings c, qv WHERE c.vec_id <> 0
        ORDER BY cos DESC, doc_id LIMIT 20),
      vec AS (
        SELECT doc_id, CAST(row_number() OVER
          (ORDER BY cos DESC, doc_id) AS BIGINT) AS r_vec
        FROM cosod)
      SELECT coalesce(l.doc_id, v.doc_id) AS doc_id, l.r_lex, v.r_vec,
        coalesce(1000000 // (60 + l.r_lex), 0) +
        coalesce(1000000 // (60 + v.r_vec), 0) AS rrf_micros
      FROM lex l FULL OUTER JOIN vec v ON v.doc_id = l.doc_id
      ORDER BY rrf_micros DESC, doc_id LIMIT 10""")),

    // Positional phrase search (Retrieval.phraseSearch): docs containing
    // the exact 3-token phrase, via n-1 equi-joins over (doc, pos - i)
    // postings pre-filtered to the phrase's tokens — Lucene's
    // PhraseQuery plan, relationally. Only the phrase's postings
    // shuffle; the corpus text never moves.
    QuerySpec("s16_phrase_search", (s, dir) => {
      import s.implicits._
      Retrieval.phraseSearch(
          Tables.load(s, dir, "documents").select($"doc_id", $"text"),
          "doc_id", "text", Seq("part", "filter", "scan"))
        .orderBy($"doc_id")
    }, oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
          unnest(string_split_regex(trim(text), '\s+')) AS tok,
          unnest(generate_series(1,
            len(string_split_regex(trim(text), '\s+')))) AS ord
        FROM documents),
      m AS (
        SELECT a.doc_id, a.ord - 1 AS base
        FROM toks a
        JOIN toks b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
        JOIN toks c ON c.doc_id = a.doc_id AND c.ord = a.ord + 2
        WHERE a.tok = 'part' AND b.tok = 'filter' AND c.tok = 'scan')
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
        CAST(min(base) AS BIGINT) AS first_pos
      FROM m GROUP BY doc_id ORDER BY doc_id""")),

    // RANGE (radius) search over a probe TABLE (Similarity.rangeSearch):
    // all corpus vectors with cosine >= tau per probe, multi-probe LSH
    // (each probe explodes to its Hamming<=1 bucket neighborhood, so
    // matching is an equi-join on bucket — no per-row Hamming scan).
    // Probes are planted copies of every 25th corpus vector, so each is
    // GUARANTEED its source (identical vector → identical bucket,
    // cos = 1); tau under the corpus's organic cosine ceiling (~0.51)
    // lets genuinely-close bucket-adjacent pairs surface too. FULL
    // oracle: DuckDB rebuilds planes, both bucket sets, the Hamming<=1
    // candidate join, and the exact-cosine verify.
    QuerySpec("s15_range_search", (s, dir) => {
      import s.implicits._
      val embs = Tables.load(s, dir, "embeddings")
      val probes = embs.filter($"vec_id" % 25 === 0)
        .select(($"vec_id" + 200000L).as("q_id"), $"embedding".as("qe"))
      Similarity.rangeSearch(embs, probes, "vec_id", "embedding",
          "q_id", "qe", tau = 0.45, bits = 12)
        .select($"q_id", $"doc_id", round($"cos", 9).as("cos"))
        .orderBy($"q_id", $"doc_id")
    }, oracle = Some(s"""
      WITH probes AS (
        SELECT vec_id + 200000 AS q_id, embedding AS qe
        FROM embeddings WHERE vec_id % 25 = 0),
      corpus AS (SELECT vec_id AS doc_id, embedding FROM embeddings),
      $LshBucketCte
      b AS (SELECT c.doc_id, $LshBucketSum AS bucket
            FROM corpus c, plane_lists p GROUP BY c.doc_id),
      qb AS (SELECT q.q_id, ${LshBucketSum.replace("c.embedding", "q.qe")}
               AS bucket
             FROM probes q, plane_lists p GROUP BY q.q_id),
      cand AS (
        SELECT qb.q_id, b.doc_id
        FROM qb JOIN b ON bit_count(xor(CAST(qb.bucket AS BIGINT),
          CAST(b.bucket AS BIGINT))) <= 1),
      scored AS (
        SELECT cand.q_id, cand.doc_id,
          list_aggregate(list_transform(list_zip(p.qe, c.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum') /
          (sqrt(list_aggregate(list_transform(p.qe,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) *
           sqrt(list_aggregate(list_transform(c.embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))) AS cos
        FROM cand JOIN probes p ON p.q_id = cand.q_id
        JOIN corpus c ON c.doc_id = cand.doc_id)
      SELECT q_id, doc_id, round(cos, 9) AS cos FROM scored
      WHERE cos >= 0.45 ORDER BY q_id, doc_id"""))
  )
}
