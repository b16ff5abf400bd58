package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Fixture-encoding contract: `Tables.load` must yield the SAME logical
  * `events.ts` — `TimestampType`, identical epoch micros — no matter which
  * physical parquet encoding the fixture writer used. Round 9's fixtures
  * silently switched from int64 TIMESTAMP(NANOS) to timestamp[us] NTZ and
  * broke five queries; this spec writes the events shape in all three
  * encodings a writer can plausibly produce and pins the normalized result,
  * so the next regeneration cannot break the build unseen.
  *
  * (The reference funnels every PG wire type through one typio layer —
  * `/root/reference/psc/postgresql/types/io/stdlib_datetime.py` — for the
  * same reason: downstream code sees one shape.)
  */
class TablesEncodingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  // Distinct sub-second parts so a millis/micros confusion cannot hide.
  private val epochMicros = Seq(
    1704067200000000L,          // 2024-01-01T00:00:00Z
    1704067201234567L,          // …:01.234567
    1735689599999999L)          // 2024-12-31T23:59:59.999999Z

  private def writeAndLoad(write: String => Unit): (DataTypeHolder, Seq[Long]) = {
    val dir = Files.createTempDirectory("events_enc_").toFile
    dir.deleteOnExit()
    write(dir.getAbsolutePath)
    val df = Tables.load(spark, dir.getAbsolutePath, "events")
    val micros = df.orderBy("event_id")
      .select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
    (DataTypeHolder(df.schema("ts").dataType), micros)
  }

  private case class DataTypeHolder(dt: DataType)

  private def baseRows: Seq[Row] =
    epochMicros.zipWithIndex.map { case (us, i) => Row(i.toLong, us) }

  test("int64-nanos, NTZ-micros and UTC-micros all normalize to identical TimestampType micros") {
    // 1. int64 nanos — what TIMESTAMP(NANOS) parquet surfaces as under
    //    spark.sql.legacy.parquet.nanosAsLong (Spark cannot author true
    //    nanos parquet, so we author the surfaced shape directly).
    val (nanosTy, nanosVals) = writeAndLoad { dir =>
      val rows = epochMicros.zipWithIndex.map { case (us, i) => Row(i.toLong, us * 1000L) }
      spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1),
          StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType))))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }

    // 2. timestamp[us] WITHOUT timezone (TIMESTAMP_NTZ) — round 9+ fixtures.
    val (ntzTy, ntzVals) = writeAndLoad { dir =>
      spark.createDataFrame(
          spark.sparkContext.parallelize(baseRows, 1),
          StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType))))
        .withColumn("ts", timestamp_micros(col("ts")).cast(TimestampNTZType))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }

    // 3. timestamp[us] adjusted-to-UTC — Spark's own default writer output.
    val (utcTy, utcVals) = writeAndLoad { dir =>
      spark.createDataFrame(
          spark.sparkContext.parallelize(baseRows, 1),
          StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType))))
        .withColumn("ts", timestamp_micros(col("ts")))
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
    }

    for ((label, ty) <- Seq(("int64-nanos", nanosTy), ("ntz-micros", ntzTy), ("utc-micros", utcTy)))
      assert(ty.dt == TimestampType, s"$label must normalize to TimestampType, got ${ty.dt}")
    assert(nanosVals == epochMicros, "nanos values must truncate to the same micros")
    assert(ntzVals == epochMicros, "NTZ values must reinterpret losslessly under UTC")
    assert(utcVals == epochMicros, "UTC values must pass through unchanged")
  }

  test("the live fixture loads as TimestampType whatever its current physical encoding") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampType)
    // unix_micros must analyze — this is exactly what broke in round 9.
    assert(df.select(unix_micros(col("ts"))).limit(1).count() == 1)
  }

  test("NTZ timestamp columns normalize in EVERY table, not just events") {
    // the round-9 regeneration changed events.ts; the next one could emit
    // orders.o_orderdate as timestamp-without-timezone the same way
    val dir = Files.createTempDirectory("orders_enc_").toFile
    dir.deleteOnExit()
    spark.createDataFrame(
        spark.sparkContext.parallelize(baseRows, 1),
        StructType(Seq(StructField("o_orderkey", LongType), StructField("ts", LongType))))
      .withColumn("o_orderdate", timestamp_micros(col("ts")).cast(TimestampNTZType))
      .drop("ts")
      .write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/orders.parquet")
    val df = Tables.load(spark, dir.getAbsolutePath, "orders")
    assert(df.schema("o_orderdate").dataType == TimestampType)
    val got = df.orderBy("o_orderkey")
      .select(unix_micros(col("o_orderdate"))).collect().map(_.getLong(0)).toSeq
    assert(got == epochMicros, "NTZ order dates must reinterpret losslessly")
  }

  test("an unrecognized ts encoding fails loudly, not silently") {
    val df = spark.range(1).select(col("id").as("event_id"),
      col("id").cast(StringType).as("ts"))
    val e = intercept[IllegalStateException](Tables.normalizeTs(spark, df))
    assert(e.getMessage.contains("unsupported physical type"))
  }
}
