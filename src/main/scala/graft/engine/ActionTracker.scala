package graft.engine

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** On-target execution state with the reference's 4-table schema
  * (reference: actiontracker/actiontracker.py:38-95 DDL):
  *
  *   dbc_packets(id, name, status, dt, packet_hash, meta_data)
  *   dbc_steps  (id, name, packet_id, status, dt, exception_descr)
  *   dbc_actions(dt, packet_id, step_id, step_hash)
  *   dbc_locks  (id, name, locked, dt)
  *
  * Storage: one parquet directory per table under `stateDir` (the Spark
  * analogue of the reference's `schema_location`). The three small
  * metadata tables are rewritten atomically (write-new + swap — they hold
  * one row per packet/step). `dbc_actions` is APPEND-ONLY: each flush adds
  * a parquet file, never rewrites history — the action log is a WAL, which
  * is what makes a crash-resume read-your-writes safe, and at 100 TB the
  * executed-hash check is a broadcast left_anti join against it
  * (reference per-action EXISTS, actiontracker.py:101-116), not a
  * driver-side scan.
  *
  * Clock injection: `now` is a constructor param so tests and replays are
  * deterministic; production uses System.currentTimeMillis.
  */
final class ActionTracker(spark: SparkSession, stateDir: String,
    now: () => Long = () => System.currentTimeMillis()) {

  import ActionTracker._

  private def path(table: String) = s"$stateDir/$table"

  private def ts(): Timestamp = new Timestamp(now())

  private def readOr(table: String, schema: StructType): DataFrame = {
    val dir = new java.io.File(path(table))
    if (dir.isDirectory && dir.listFiles().exists(_.getName.endsWith(".parquet")))
      spark.read.schema(schema).parquet(path(table))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  def packets: DataFrame = readOr("dbc_packets", PacketsSchema)
  def steps: DataFrame = readOr("dbc_steps", StepsSchema)
  def actions: DataFrame = readOr("dbc_actions", ActionsSchema)
  def locks: DataFrame = readOr("dbc_locks", LocksSchema)

  // -- small-table persistence: collect → mutate → rewrite ---------------
  private def writeRows(table: String, schema: StructType, rows: Seq[Row]): Unit = {
    val tmp = path(table) + ".tmp"
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val dst = new java.io.File(path(table))
    if (dst.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(dst)
    }
    new java.io.File(tmp).renameTo(dst)
  }

  def initTables(): Unit = Seq(
    "dbc_packets" -> PacketsSchema, "dbc_steps" -> StepsSchema,
    "dbc_actions" -> ActionsSchema, "dbc_locks" -> LocksSchema
  ).foreach { case (t, s) =>
    if (!new java.io.File(path(t)).isDirectory) writeRows(t, s, Nil)
  }

  def wipeAll(): Unit = Seq("dbc_packets", "dbc_steps", "dbc_actions", "dbc_locks")
    .foreach { t =>
      writeRows(t, t match {
        case "dbc_packets" => PacketsSchema; case "dbc_steps" => StepsSchema
        case "dbc_actions" => ActionsSchema; case _ => LocksSchema
      }, Nil)
    }

  // -- packets / steps upserts (reference begin_action DO-block,
  //    actiontracker.py:166-198; insert_step :225-255) -------------------
  private def packetRows: Seq[Row] = packets.collect().toSeq
  private def stepRows: Seq[Row] = steps.collect().toSeq

  /** id of the packet row, inserting `started` if absent. */
  def ensurePacket(name: String, packetHash: String, metaData: String): Long = {
    val rows = packetRows
    rows.find(_.getString(1) == name) match {
      case Some(r) => r.getLong(0)
      case None =>
        val id = if (rows.isEmpty) 1L else rows.map(_.getLong(0)).max + 1
        writeRows("dbc_packets", PacketsSchema,
          rows :+ Row(id, name, "started", ts(), packetHash, metaData))
        id
    }
  }

  /** id of the step row under the packet, inserting `started` if absent. */
  def ensureStep(packetId: Long, stepName: String): Long = {
    val rows = stepRows
    rows.find(r => r.getString(1) == stepName && r.getLong(2) == packetId) match {
      case Some(r) => r.getLong(0)
      case None =>
        val id = if (rows.isEmpty) 1L else rows.map(_.getLong(0)).max + 1
        writeRows("dbc_steps", StepsSchema,
          rows :+ Row(id, stepName, packetId, "started", ts(), null))
        id
    }
  }

  def beginAction(packetName: String, packetHash: String, stepName: String,
      metaData: String): Unit = {
    val pid = ensurePacket(packetName, packetHash, metaData)
    ensureStep(pid, stepName)
  }

  // -- action WAL --------------------------------------------------------
  private var pendingActions = Vector.empty[Row]

  /** Record a successfully executed action (reference apply_action,
    * actiontracker.py:203-223). Buffered; `flushActions` appends one
    * parquet file per flush (runner flushes per step and on exception). */
  def applyAction(packetName: String, stepName: String, stepHash: String): Unit = {
    val pid = ensurePacket(packetName, "", "{}")
    val sid = ensureStep(pid, stepName)
    pendingActions :+= Row(ts(), pid, sid, stepHash)
  }

  def flushActions(): Unit = if (pendingActions.nonEmpty) {
    spark.createDataFrame(
        spark.sparkContext.parallelize(pendingActions, 1), ActionsSchema)
      .coalesce(1).write.mode("append").parquet(path("dbc_actions"))
    pendingActions = Vector.empty
  }

  /** Executed step_hash values of (packet, step) as a DataFrame: the
    * action log joined to the two (broadcast) id tables — reference
    * is_action_exists join, actiontracker.py:101-116. */
  def executedHashesDf(packetName: String, stepName: String): DataFrame = {
    val a = actions
    val p = packets.filter(col("name") === packetName)
      .select(col("id").as("pid"))
    val s = steps.filter(col("name") === stepName)
      .select(col("id").as("sid"), col("packet_id").as("s_pid"))
    a.join(broadcast(p), col("packet_id") === col("pid"))
      .join(broadcast(s), col("step_id") === col("sid") &&
        col("s_pid") === col("packet_id"))
      .select(col("step_hash"))
  }

  /** Driver-side dedup set for bounded fan-outs. */
  def executedHashes(packetName: String, stepName: String): Set[String] =
    executedHashesDf(packetName, stepName).collect().map(_.getString(0)).toSet

  /** Scale path: anti-join a DataFrame of candidate actions against the
    * executed log — used when a generator fan-out is too large for a
    * driver-side hash set. */
  def notYetExecuted(candidates: DataFrame, hashCol: String,
      packetName: String, stepName: String): DataFrame =
    candidates.join(
      executedHashesDf(packetName, stepName).withColumnRenamed("step_hash", hashCol),
      Seq(hashCol), "left_anti")

  // -- statuses ----------------------------------------------------------
  def setStepStatus(packetName: String, stepName: String, status: String,
      exceptionDescr: Option[String] = None): Unit = {
    val pid = ensurePacket(packetName, "", "{}")
    ensureStep(pid, stepName)
    val updated = stepRows.map { r =>
      if (r.getString(1) == stepName && r.getLong(2) == pid)
        Row(r.getLong(0), r.getString(1), r.getLong(2), status, ts(),
          exceptionDescr.orNull)
      else r
    }
    writeRows("dbc_steps", StepsSchema, updated)
  }

  def setPacketStatus(packetName: String, status: String): Unit = {
    val updated = packetRows.map { r =>
      if (r.getString(1) == packetName)
        Row(r.getLong(0), r.getString(1), status, ts(), r.getString(4), r.getString(5))
      else r
    }
    writeRows("dbc_packets", PacketsSchema, updated)
  }

  /** Latest packet+step status (reference get_packet_status,
    * actiontracker.py:334-351: packets ⋈ steps ORDER BY s.dt DESC LIMIT 1). */
  def packetStatus(packetName: String): Option[PacketStatusRow] = {
    val p = packets.filter(col("name") === packetName)
      .select(col("id").as("pid"), col("status").as("p_status"), col("packet_hash"))
    val joined = p.join(steps, col("packet_id") === col("pid"))
      .orderBy(col("dt").desc, col("id").desc).limit(1)
      .select(col("p_status"), col("exception_descr"), col("dt"), col("packet_hash"))
      .collect()
    joined.headOption.map(r => PacketStatusRow(
      status = r.getString(0),
      exceptionDescr = Option(r.getString(1)),
      dt = Option(r.getTimestamp(2)),
      hash = r.getString(3)))
  }

  // -- locks (reference is_packet_locked/set_packet_lock/unlock,
  //    actiontracker.py:118-164) -----------------------------------------
  private def lockRows: Seq[Row] = locks.collect().toSeq

  def isPacketLocked(packetName: String): Boolean =
    lockRows.exists(r => r.getString(1) == packetName && r.getBoolean(2))

  def setPacketLock(packetName: String): Unit = {
    val rows = lockRows
    val updated =
      if (rows.exists(_.getString(1) == packetName))
        rows.map(r => if (r.getString(1) == packetName)
          Row(r.getLong(0), packetName, true, ts()) else r)
      else {
        val id = if (rows.isEmpty) 1L else rows.map(_.getLong(0)).max + 1
        rows :+ Row(id, packetName, true, ts())
      }
    writeRows("dbc_locks", LocksSchema, updated)
  }

  def setPacketUnlock(packetName: String): Unit = {
    val updated = lockRows.map(r => if (r.getString(1) == packetName)
      Row(r.getLong(0), r.getString(1), false, ts()) else r)
    writeRows("dbc_locks", LocksSchema, updated)
  }

  def unlockAll(): Unit =
    writeRows("dbc_locks", LocksSchema,
      lockRows.map(r => Row(r.getLong(0), r.getString(1), false, ts())))

  // -- wipe (reference wipe_packet FK-ordered cascade,
  //    actiontracker.py:257-294) -----------------------------------------
  /** @return true if the packet had any tracked data (reference returns
    *         is_data_exists for the nothing_todo result code). */
  def wipePacket(packetName: String): Boolean = {
    val pids = packetRows.filter(_.getString(1) == packetName).map(_.getLong(0)).toSet
    if (pids.isEmpty) return false
    val sids = stepRows.filter(r => pids.contains(r.getLong(2))).map(_.getLong(0)).toSet
    // actions → steps → packets, same FK order as the reference
    val keptActions = actions.collect().toSeq
      .filterNot(r => pids.contains(r.getLong(1)) && sids.contains(r.getLong(2)))
    writeRows("dbc_actions", ActionsSchema, keptActions)
    writeRows("dbc_steps", StepsSchema,
      stepRows.filterNot(r => pids.contains(r.getLong(2))))
    writeRows("dbc_packets", PacketsSchema,
      packetRows.filterNot(r => pids.contains(r.getLong(0))))
    true
  }
}

object ActionTracker {
  val PacketsSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("status", StringType, nullable = false), // done|started|exception
    StructField("dt", TimestampType, nullable = false),
    StructField("packet_hash", StringType, nullable = false),
    StructField("meta_data", StringType, nullable = false))) // jsonb → json text

  val StepsSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("packet_id", LongType, nullable = false),
    StructField("status", StringType, nullable = false),
    StructField("dt", TimestampType, nullable = false),
    StructField("exception_descr", StringType, nullable = true)))

  val ActionsSchema: StructType = StructType(Seq(
    StructField("dt", TimestampType, nullable = false),
    StructField("packet_id", LongType, nullable = false),
    StructField("step_id", LongType, nullable = false),
    StructField("step_hash", StringType, nullable = false)))

  val LocksSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("locked", BooleanType, nullable = false),
    StructField("dt", TimestampType, nullable = false)))

  final case class PacketStatusRow(status: String,
      exceptionDescr: Option[String], dt: Option[java.sql.Timestamp],
      hash: String)
}
