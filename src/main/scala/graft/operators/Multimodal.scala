package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in partition-local batches.
  *
  * The decode step is STUBBED (this container has no image/audio codecs):
  * `fakeDecodeFeatures` stands in for a real decoder with a deterministic
  * byte-histogram "feature vector" so the Spark-side contract — schema,
  * batching, partitioning, null handling — is real and tested. In
  * production the same `mapPartitions` body calls the codec (or the
  * pipeline runs the Python `mapInPandas` twin with PIL/ffmpeg); the plan
  * shape is identical.
  *
  * Scale posture: binary payloads stay columnar in parquet; decode is
  * partition-local (zero shuffle); `spark.sql.files.maxPartitionBytes`
  * bounds batch memory; metadata-only predicates (size/format) push down
  * to the scan so undecodable rows are skipped before the expensive step.
  */
object Multimodal {

  final case class MediaRecord(media_id: Long, payload: Array[Byte],
      format: String, n_bytes: Long)
  final case class MediaFeatures(media_id: Long, format: String,
      n_bytes: Long, features: Array[Double])

  /** Build a deterministic binary corpus from the documents table (stands
    * in for real image/audio payloads; derived only from fixture data). */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      // deterministic fake modality tag
      element_at(array(lit("png"), lit("jpeg"), lit("wav")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
      length(col("text")).cast("long").as("n_bytes"))

  /** REAL binary media corpus (no codecs needed): even doc_ids carry a
    * deterministic P6 PPM image, odd doc_ids a PCM16 mono WAV — actual
    * fixed-layout binary formats encoded pure-JVM ([[MediaCodec]]), so the
    * m01/m02 decoders parse genuine headers and sample data. Payload
    * bytes derive from md5("<id>_<block>"), which is what lets the DuckDB
    * oracle replay the decode reductions relationally. */
  def mediaCorpus(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(2)) === 0,
          MediaCodecColumns.ppmEncode(col("doc_id")))
        .otherwise(MediaCodecColumns.wavEncode(col("doc_id"))).as("payload"),
      when(pmod(col("doc_id"), lit(2)) === 0, lit("ppm"))
        .otherwise(lit("wav")).as("format"))
      .withColumn("n_bytes", length(col("payload")).cast("long"))

  /** Out-of-JVM-codec SHAPE, kept by design (not a stub): the real
    * decodes live in [[MediaCodec]] (genuine PPM/WAV parsers, m01/m02
    * oracled end to end); THIS path models the production case where the
    * codec is an external library behind a mapPartitions batch boundary,
    * so the body is a deterministic 16-bin byte histogram standing where
    * an external codec call would go. The Spark-side plumbing — schema,
    * batching, partitioning — is the tested contract. */
  def decodeOne(payload: Array[Byte]): Array[Double] = {
    val hist = new Array[Double](16)
    var i = 0
    while (i < payload.length) { hist((payload(i) & 0xFF) >> 4) += 1.0; i += 1 }
    val n = math.max(payload.length, 1).toDouble
    hist.map(_ / n)
  }

  /** codegen bridge for [[BinaryByteHistogram]]. */
  def decodeOneArrayData(payload: Array[Byte]): ArrayData =
    new GenericArrayData(decodeOne(payload))

  /** The decode stub as a NATIVE Catalyst expression: binary → features
    * without leaving WholeStageCodegen (no Dataset encoder boundary). The
    * hot summary path uses this; `extractFeatures` below keeps the
    * batched-iterator shape a real out-of-JVM codec needs — the two are
    * asserted identical in tests. */
  def byteHistogram(c: Column): Column =
    ColumnBridge.column(BinaryByteHistogram(ColumnBridge.expression(c)))

  /** Partition-local feature extraction over the binary column — the
    * batched-UDF shape (`mapPartitions` here ≡ `mapInPandas` in the
    * Python twin: one iterator of records per partition, constant memory). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        MediaFeatures(r.media_id, r.format, r.n_bytes, decodeOne(r.payload))
      }
    }
  }

  /** Frame sampling over "video" payloads: split the binary into
    * fixed-size frame chunks (standing in for a real container demuxer,
    * which would be an external library — the out-of-JVM-codec shape
    * kept by design, like `decodeOne`) and keep every `stride`-th
    * frame. The Spark-side plumbing is the real contract: one row per
    * sampled frame with (media_id, frame_idx, frame_bytes), produced by
    * a codegen'd generator expression chain (no UDF) — partition-local,
    * zero shuffle, output rows ∝ payload size / (frameBytes × stride).
    * A real decoder drops into the same schema via mapPartitions /
    * mapInArrow batches (see extractFeatures for that shape). */
  def sampleFrames(media: DataFrame, frameBytes: Int = 256,
      stride: Int = 4): DataFrame = {
    val nFrames = ceil(length(col("payload")) / frameBytes.toDouble).cast("int")
    media
      .withColumn("frame_idx",
        explode(filter(sequence(lit(0), greatest(nFrames - 1, lit(0))),
          i => i % stride === 0)))
      .select(col("media_id"), col("format"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes))
          .as("frame_bytes"))
      .filter(length(col("frame_bytes")) > 0)
  }

  /** Scene-cut detection over an ordered frame stream: per video, the
    * Hamming distance between consecutive frames' perceptual hashes,
    * flagged as a cut where the jump reaches `threshold` — the shot-
    * boundary pass every video-curation pipeline runs before frame
    * sampling (sample per SCENE, not per fixed stride, or repeated
    * shots dominate the training mix).
    *
    * Input contract: one row per frame with (video, frame index, 64-bit
    * perceptual hash) — the hash typically [[MediaCodecColumns.ppmAHash]]
    * over the decoded frame. The window partitions by video, so state
    * is per-video and the shuffle is one (video, long, long) exchange;
    * no payload bytes move — hash first, window second (frames are the
    * big thing; hashes are 8 bytes).
    *
    * @return input columns plus (hamming, is_cut); the first frame of
    *         each video has NULL hamming (nothing to compare against)
    */
  def sceneCuts(frames: DataFrame, videoCol: String, idxCol: String,
      hashCol: String, threshold: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(videoCol)).orderBy(col(idxCol))
    frames
      .withColumn("prev_h", lag(col(hashCol), 1).over(w))
      .withColumn("hamming",
        expr(s"bit_count($hashCol ^ prev_h)").cast("long"))
      .withColumn("is_cut", col("hamming") >= threshold)
      .drop("prev_h")
  }

  /** Metadata/feature summary — pushdown-friendly metadata filter, then
    * the codegen'd expression decode (one whole-stage pipeline: scan →
    * filter → decode → partial agg, zero serialization boundaries). */
  def featureSummary(spark: SparkSession, docs: DataFrame): DataFrame =
    mediaFromDocuments(docs).filter(col("n_bytes") > 0)
      .withColumn("features", byteHistogram(col("payload")))
      .groupBy(col("format"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(element_at(col("features"), 7)), 6).as("mean_bin6"))
      .orderBy(col("format"))
}

/** Deterministic binary→feature decode as a unary expression with full
  * codegen (the serialization-free twin of the mapPartitions path). */
case class BinaryByteHistogram(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "byte_histogram"

  override protected def nullSafeEval(v: Any): Any =
    Multimodal.decodeOneArrayData(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.operators.Multimodal.decodeOneArrayData($c)")

  override protected def withNewChildInternal(newChild: Expression): BinaryByteHistogram =
    copy(child = newChild)
}
