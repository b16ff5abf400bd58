package graft.engine

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

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
  * Storage: one directory per table under `stateDir` (the Spark analogue
  * of the reference's `schema_location`), rows as TSV lines with
  * base64-encoded strings — written with plain java IO. Tracker state is
  * OPERATIONAL driver-side data (tens of rows): paying a Spark job per
  * write (~250 ms scheduling + executor round trip for one row) was the
  * engine path's largest fixed cost, and on a real cluster those jobs
  * would contend with data jobs for executors. The crash-rename protocol
  * and WAL-append semantics are unchanged; public accessors still expose
  * DataFrames (local relations over the parsed rows).
  *
  * Durability tiers (a tracker instance is the single writer for its
  * stateDir during a run):
  *  - `dbc_actions` is an APPEND-ONLY WAL: `flushActions` appends one
  *    parquet file per flush (the runner flushes per step and on
  *    exception) and never rewrites history — this is what makes
  *    crash-resume correct;
  *  - `dbc_locks` writes THROUGH immediately (a lock someone cannot see
  *    is not a lock);
  *  - `dbc_packets`/`dbc_steps` statuses are write-BEHIND: mutated in
  *    memory and persisted at flush points (`persistMeta`, called by the
  *    runner per run and on exception). They are advisory bookkeeping —
  *    resume correctness never depends on them, and write-through would
  *    cost a fixed-overhead Spark job per action.
  *
  * The executed-hash dedup check is a driver-side set for bounded
  * fan-outs (the WAL is loaded once per run, not re-joined per step) and
  * a broadcast left_anti join (`notYetExecuted`) for fan-outs too large
  * to hold on the driver — the reference's per-action indexed EXISTS
  * (actiontracker.py:101-116) split into its two scale regimes.
  *
  * Clock injection: `now` is a constructor param so tests and replays are
  * deterministic; production uses System.currentTimeMillis.
  */
final class ActionTracker(spark: SparkSession, stateDir: String,
    now: () => Long = () => System.currentTimeMillis()) {

  import ActionTracker._

  private def path(table: String) = s"$stateDir/$table"

  private def ts(): Timestamp = new Timestamp(now())

  private def schemaOf(table: String): StructType = table match {
    case "dbc_packets" => PacketsSchema
    case "dbc_steps" => StepsSchema
    case "dbc_actions" => ActionsSchema
    case _ => LocksSchema
  }

  // -- TSV codec: positional fields per schema; strings base64'd (no
  //    escaping pitfalls), timestamps as epoch millis, null as \N --------
  private def encodeRow(r: Row, schema: StructType): String =
    schema.fields.zipWithIndex.map { case (f, i) =>
      if (r.isNullAt(i)) "\\N"
      else f.dataType match {
        case StringType => java.util.Base64.getEncoder.encodeToString(
          r.getString(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case TimestampType => r.getTimestamp(i).getTime.toString
        case _ => String.valueOf(r.get(i))
      }
    }.mkString("\t")

  private def decodeRow(line: String, schema: StructType): Row = {
    val parts = line.split("\t", -1)
    Row.fromSeq(schema.fields.zipWithIndex.map { case (f, i) =>
      val v = parts(i)
      if (v == "\\N") null
      else f.dataType match {
        case StringType => new String(java.util.Base64.getDecoder.decode(v),
          java.nio.charset.StandardCharsets.UTF_8)
        case TimestampType => new Timestamp(v.toLong)
        case LongType => v.toLong
        case IntegerType => v.toInt
        case BooleanType => v.toBoolean
        case other => throw new IllegalStateException(s"unsupported $other")
      }
    }.toSeq)
  }

  private def rmAll(f: java.io.File): Unit = if (f.exists()) {
    if (f.isDirectory) f.listFiles().foreach(rmAll); f.delete()
  }

  private def writeFile(dir: java.io.File, name: String, rows: Seq[Row],
      schema: StructType, replaceDir: Boolean): Unit = {
    if (replaceDir) rmAll(dir)
    java.nio.file.Files.createDirectories(dir.toPath)
    val bytes = rows.map(encodeRow(_, schema)).mkString("", "\n", "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // write via a temp name + rename so a reader never sees a torn file
    val tmp = new java.io.File(dir, s".$name.tmp")
    java.nio.file.Files.write(tmp.toPath, bytes)
    val dst = new java.io.File(dir, name)
    // renameTo silently replaces on POSIX: an append-mode target that
    // already exists would OVERWRITE history — refuse instead
    if (!replaceDir && dst.exists())
      throw new java.io.IOException(s"refusing to overwrite $dst")
    if (!tmp.renameTo(dst))
      throw new java.io.IOException(s"cannot publish $tmp")
  }

  private def dataFiles(f: java.io.File): Seq[java.io.File] = {
    if (!f.isDirectory) return Nil
    val all = f.listFiles()
    // a stateDir from a different tracker build must fail LOUD, not read
    // as empty (empty state re-runs every executed action)
    if (all.exists(_.getName.endsWith(".parquet")))
      throw new IllegalStateException(
        s"$f holds a legacy-format state table; wipe or convert it")
    all.filter(_.getName.endsWith(".tsv")).sortBy(_.getName).toSeq
  }

  private def readRows(table: String): Seq[Row] = {
    val dir = dataFiles(new java.io.File(path(table)))
    // `.old` is the staged-aside copy from writeRows — present only if a
    // crash hit between its two renames
    val files =
      if (dir.nonEmpty) dir
      else dataFiles(new java.io.File(path(table) + ".old"))
    val schema = schemaOf(table)
    files.flatMap { f =>
      java.nio.file.Files.readAllLines(f.toPath).asScala
        .filter(_.nonEmpty).map(l => decodeRow(l, schema))
    }
  }

  private def readOr(table: String): DataFrame =
    spark.createDataFrame(readRows(table).asJava, schemaOf(table))

  /** On-disk DataFrame views (external inspection; in-run state is
    * authoritative in this instance's cache until persisted). */
  def packets: DataFrame = readOr("dbc_packets")
  def steps: DataFrame = readOr("dbc_steps")
  def actions: DataFrame = readOr("dbc_actions")
  def locks: DataFrame = readOr("dbc_locks")

  // -- cache + persistence ----------------------------------------------
  private val cache = scala.collection.mutable.Map.empty[String, Seq[Row]]
  private var dirtyMeta = Set.empty[String]
  /** set when a NEW packet/step id mapping row was inserted since the
    * last persist — the only metadata the WAL's durability depends on
    * (status mutations are advisory and persist at run end) */
  private var mappingDirty = false

  private def rowsOf(table: String): Seq[Row] =
    cache.getOrElseUpdate(table, readOr(table).collect().toSeq)

  private def setRows(table: String, rows: Seq[Row], durable: Boolean): Unit = {
    cache(table) = rows
    if (durable) { writeRows(table, rows); dirtyMeta -= table }
    else dirtyMeta += table
  }

  /** Persist write-behind metadata mutations (runner flush point). */
  def persistMeta(): Unit = {
    dirtyMeta.foreach(t => writeRows(t, cache(t)))
    dirtyMeta = Set.empty
    mappingDirty = false
  }

  /** Crash-safe replace: write tmp → rename live aside → rename tmp in →
    * drop the old copy. A crash between the renames leaves `.old`, which
    * `readOr` falls back to — the table never just vanishes (the lock
    * table's write-through promise depends on this). */
  private def writeRows(table: String, rows: Seq[Row]): Unit = {
    val tmp = new java.io.File(path(table) + ".tmp")
    val old = new java.io.File(path(table) + ".old")
    writeFile(tmp, "rows.tsv", rows, schemaOf(table), replaceDir = true)
    val dst = new java.io.File(path(table))
    if (dst.exists()) {
      // only drop the `.old` fallback while `dst` is the durable copy —
      // when `dst` is absent (crash between the renames), `.old` is the ONLY
      // durable copy and must survive until tmp is published below
      rmAll(old)
      if (!dst.renameTo(old))
        throw new java.io.IOException(s"cannot stage $dst aside")
    }
    if (!tmp.renameTo(dst))
      throw new java.io.IOException(s"cannot publish $tmp")
    rmAll(old)
  }

  /** DDL analogue (reference init_tbls, actiontracker.py:17-99): an empty
    * table is an empty directory — `readOr` supplies the schema, so no
    * Spark job is needed until the first real row lands. */
  def initTables(): Unit = Seq(
    "dbc_packets", "dbc_steps", "dbc_actions", "dbc_locks"
  ).foreach(t => new java.io.File(path(t)).mkdirs())

  def wipeAll(): Unit = {
    invalidateMemos()
    Seq("dbc_packets", "dbc_steps", "dbc_actions", "dbc_locks")
      .foreach(t => setRows(t, Nil, durable = true))
  }

  // -- packets / steps upserts (reference begin_action DO-block,
  //    actiontracker.py:166-198; insert_step :225-255) -------------------
  // id memos: resolved ids are stable for the single writer
  private var packetIdMemo = Map.empty[String, Long]
  private var stepIdMemo = Map.empty[(Long, String), Long]
  private def invalidateMemos(): Unit = {
    packetIdMemo = Map.empty; stepIdMemo = Map.empty
  }

  /** id of the packet row, inserting `started` if absent. */
  def ensurePacket(name: String, packetHash: String, metaData: String): Long =
    packetIdMemo.getOrElse(name, {
      val rows = rowsOf("dbc_packets")
      val id = rows.find(_.getString(1) == name) match {
        case Some(r) => r.getLong(0)
        case None =>
          val newId = if (rows.isEmpty) 1L else rows.map(_.getLong(0)).max + 1
          setRows("dbc_packets",
            rows :+ Row(newId, name, "started", ts(), packetHash, metaData),
            durable = false)
          mappingDirty = true
          newId
      }
      packetIdMemo += name -> id
      id
    })

  /** id of the step row under the packet, inserting `started` if absent. */
  def ensureStep(packetId: Long, stepName: String): Long =
    stepIdMemo.getOrElse((packetId, stepName), {
      val rows = rowsOf("dbc_steps")
      val id = rows.find(r => r.getString(1) == stepName &&
          r.getLong(2) == packetId) match {
        case Some(r) => r.getLong(0)
        case None =>
          val newId = if (rows.isEmpty) 1L else rows.map(_.getLong(0)).max + 1
          setRows("dbc_steps",
            rows :+ Row(newId, stepName, packetId, "started", ts(), null),
            durable = false)
          mappingDirty = true
          newId
      }
      stepIdMemo += (packetId, stepName) -> id
      id
    })

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
    // the WAL references packet/step IDS whose name mappings live in the
    // write-behind tables — the mapping must be durable no later than the
    // actions that use it, so it is persisted FIRST: a crash between the two
    // writes then loses only unreferenced mapping rows, never a WAL whose ids
    // could be reassigned differently on a reordered multi-packet resume.
    // Status-only mutations don't force this (advisory; persisted at run end).
    if (mappingDirty) persistMeta()
    val prior = rowsOf("dbc_actions") // BEFORE the append, or they count twice
    // WAL semantics: a NEW uniquely-named file per flush, never a rewrite.
    // The sequence starts past any existing file (a resumed instance — or
    // a deterministic injected clock — must not collide with history;
    // writeFile additionally refuses to overwrite).
    val dir = new java.io.File(path("dbc_actions"))
    if (walSeq < 0) walSeq = dataFiles(dir).size
    writeFile(dir, f"actions-${now()}%013d-${walSeq}%06d.tsv",
      pendingActions, ActionsSchema, replaceDir = false)
    walSeq += 1
    cache("dbc_actions") = prior ++ pendingActions
    pendingActions = Vector.empty
  }
  private var walSeq = -1

  /** Driver-side dedup set for bounded fan-outs: WAL loaded once per
    * tracker instance, filtered in memory. */
  def executedHashes(packetName: String, stepName: String): Set[String] = {
    val pid = rowsOf("dbc_packets").find(_.getString(1) == packetName)
      .map(_.getLong(0))
    pid.fold(Set.empty[String]) { p =>
      rowsOf("dbc_steps")
        .find(r => r.getString(1) == stepName && r.getLong(2) == p)
        .map(_.getLong(0))
        .fold(Set.empty[String]) { s =>
          rowsOf("dbc_actions")
            .filter(r => r.getLong(1) == p && r.getLong(2) == s)
            .map(_.getString(3)).toSet
        }
    }
  }

  /** Executed hashes as a DataFrame (the distributed path). */
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
    val updated = rowsOf("dbc_steps").map { r =>
      if (r.getString(1) == stepName && r.getLong(2) == pid)
        Row(r.getLong(0), r.getString(1), r.getLong(2), status, ts(),
          exceptionDescr.orNull)
      else r
    }
    setRows("dbc_steps", updated, durable = false)
  }

  def setPacketStatus(packetName: String, status: String): Unit = {
    val updated = rowsOf("dbc_packets").map { r =>
      if (r.getString(1) == packetName)
        Row(r.getLong(0), r.getString(1), status, ts(), r.getString(4), r.getString(5))
      else r
    }
    setRows("dbc_packets", updated, durable = false)
  }

  /** Latest packet+step status (reference get_packet_status,
    * actiontracker.py:334-351: packets ⋈ steps ORDER BY s.dt DESC LIMIT 1). */
  def packetStatus(packetName: String): Option[PacketStatusRow] = {
    rowsOf("dbc_packets").find(_.getString(1) == packetName).flatMap { pr =>
      val pid = pr.getLong(0)
      val stepRows = rowsOf("dbc_steps").filter(_.getLong(2) == pid)
      if (stepRows.isEmpty) None
      else {
        val last = stepRows.maxBy(r => (r.getTimestamp(4).getTime, r.getLong(0)))
        Some(PacketStatusRow(
          status = pr.getString(2),
          exceptionDescr = Option(last.getString(5)),
          dt = Option(last.getTimestamp(4)),
          hash = pr.getString(4)))
      }
    }
  }

  // -- locks (reference is_packet_locked/set_packet_lock/unlock,
  //    actiontracker.py:118-164) — write-through: a lock someone cannot
  //    see is not a lock ---------------------------------------------------
  def isPacketLocked(packetName: String): Boolean =
    rowsOf("dbc_locks").exists(r => r.getString(1) == packetName && r.getBoolean(2))

  def setPacketLock(packetName: String): Unit = {
    val rows = rowsOf("dbc_locks")
    val updated =
      if (rows.exists(_.getString(1) == packetName))
        rows.map(r => if (r.getString(1) == packetName)
          Row(r.getLong(0), packetName, true, ts()) else r)
      else {
        val id = if (rows.isEmpty) 1L else rows.map(_.getLong(0)).max + 1
        rows :+ Row(id, packetName, true, ts())
      }
    setRows("dbc_locks", updated, durable = true)
  }

  def setPacketUnlock(packetName: String): Unit =
    setRows("dbc_locks",
      rowsOf("dbc_locks").map(r => if (r.getString(1) == packetName)
        Row(r.getLong(0), r.getString(1), false, ts()) else r),
      durable = true)

  def unlockAll(): Unit =
    setRows("dbc_locks",
      rowsOf("dbc_locks").map(r => Row(r.getLong(0), r.getString(1), false, ts())),
      durable = true)

  // -- wipe (reference wipe_packet FK-ordered cascade,
  //    actiontracker.py:257-294) -----------------------------------------
  /** @return true if the packet had any tracked data (reference returns
    *         is_data_exists for the nothing_todo result code). */
  def wipePacket(packetName: String): Boolean = {
    invalidateMemos()
    val pids = rowsOf("dbc_packets").filter(_.getString(1) == packetName)
      .map(_.getLong(0)).toSet
    if (pids.isEmpty) return false
    val sids = rowsOf("dbc_steps").filter(r => pids.contains(r.getLong(2)))
      .map(_.getLong(0)).toSet
    // actions → steps → packets, same FK order as the reference
    setRows("dbc_actions",
      rowsOf("dbc_actions").filterNot(r =>
        pids.contains(r.getLong(1)) && sids.contains(r.getLong(2))),
      durable = true)
    setRows("dbc_steps",
      rowsOf("dbc_steps").filterNot(r => pids.contains(r.getLong(2))),
      durable = true)
    setRows("dbc_packets",
      rowsOf("dbc_packets").filterNot(r => pids.contains(r.getLong(0))),
      durable = true)
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
