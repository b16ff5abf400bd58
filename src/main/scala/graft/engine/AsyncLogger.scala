package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.concurrent.ConcurrentLinkedQueue

/** Async batched rotating-file logger (reference E27, psc/psclogger/
  * psc_logger.py: a queue drained by a flusher thread into
  * `log/dbc_<db>_<packet>.log` with size-based rotation).
  *
  * Producers enqueue lock-free and never touch the filesystem; one daemon
  * thread drains the queue every `flushIntervalMs` and appends the batch
  * in a single write. Rotation keeps `maxFiles` generations
  * (`f.log → f.log.1 → … → f.log.N`, oldest deleted) once the active file
  * exceeds `maxBytes` — the reference's 50 MB × 5 defaults live in its
  * `[log]` conf section (db_converter.py:73-74).
  */
final class AsyncLogger(
    logDir: String,
    fileName: String,
    maxBytes: Long = 50L * 1024 * 1024,
    maxFiles: Int = 5,
    flushIntervalMs: Long = 1000) {

  private val queue = new ConcurrentLinkedQueue[String]()
  private val dir = Paths.get(logDir)
  Files.createDirectories(dir)
  private val path: Path = dir.resolve(fileName)
  private val fmt = DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss.SSS").withZone(ZoneOffset.UTC)

  /** Enqueue; returns immediately (reference PSCLogger.log). */
  def log(message: String, level: String = "Info",
      doPrint: Boolean = false): Unit = {
    queue.add(s"${fmt.format(Instant.now())} [$level] $message")
    if (doPrint) println(message)
  }

  /** Drain everything queued into one append, rotating first if the
    * active file is over budget. Called by the flusher thread and by
    * close(); safe to call directly in tests. */
  def flush(): Unit = synchronized {
    if (queue.isEmpty) return
    val batch = new StringBuilder
    var m = queue.poll()
    while (m != null) { batch.append(m).append('\n'); m = queue.poll() }
    if (Files.exists(path) && Files.size(path) > maxBytes) rotate()
    Files.write(path, batch.toString.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def rotate(): Unit = {
    val oldest = dir.resolve(s"$fileName.$maxFiles")
    Files.deleteIfExists(oldest)
    ((maxFiles - 1) to 1 by -1).foreach { i =>
      val from = dir.resolve(s"$fileName.$i")
      if (Files.exists(from))
        Files.move(from, dir.resolve(s"$fileName.${i + 1}"))
    }
    Files.move(path, dir.resolve(s"$fileName.1"))
  }

  @volatile private var running = true
  private val flusher = new Thread(() => {
    while (running) {
      // an IO failure (disk full, permissions) must not kill the flusher:
      // the queue would then grow for the rest of the run with no drain
      try flush() catch {
        case _: InterruptedException => running = false
        case scala.util.control.NonFatal(_) => ()
      }
      try Thread.sleep(flushIntervalMs)
      catch { case _: InterruptedException => running = false }
    }
  }, s"graft-logger-$fileName")
  flusher.setDaemon(true)
  flusher.start()

  /** Stop the flusher and write out anything still queued. Never throws —
    * a log-drain failure must not mask the run's real result. */
  def close(): Unit = {
    running = false
    flusher.interrupt()
    flusher.join(2000)
    try flush() catch { case scala.util.control.NonFatal(_) => () }
  }
}

object AsyncLogger {
  /** Reference log-file naming: `log/dbc_<db>_<packet>.log`
    * (psc_logger.py usage in db_converter.py:309-315). */
  def forRun(logDir: String, dbName: String, packetName: String,
      maxBytes: Long = 50L * 1024 * 1024, maxFiles: Int = 5): AsyncLogger =
    new AsyncLogger(logDir, s"dbc_${dbName}_$packetName.log",
      maxBytes, maxFiles)
}
