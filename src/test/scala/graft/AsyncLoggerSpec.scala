package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.AsyncLogger

/** E27 async batched logger: batching, naming parity, rotation. */
class AsyncLoggerSpec extends AnyFunSuite {

  test("messages are batched to the named file in order") {
    val dir = Files.createTempDirectory("graft-log").toString
    val lg = AsyncLogger.forRun(dir, "alpha", "test_common")
    (1 to 100).foreach(i => lg.log(s"msg $i"))
    lg.close()
    val lines = Files.readAllLines(
      Paths.get(dir, "dbc_alpha_test_common.log")).asScala
    assert(lines.size == 100)
    assert(lines.head.endsWith("[Info] msg 1"))
    assert(lines.last.endsWith("[Info] msg 100"))
    assert(lines.head.matches("""\d{4}-\d{2}-\d{2} .*"""))
  }

  test("levels are recorded; flusher drains without close") {
    val dir = Files.createTempDirectory("graft-log").toString
    val lg = new AsyncLogger(dir, "x.log", flushIntervalMs = 20)
    lg.log("boom", "Error")
    Thread.sleep(300)
    val lines = Files.readAllLines(Paths.get(dir, "x.log")).asScala
    assert(lines.exists(_.endsWith("[Error] boom")))
    lg.close()
  }

  test("rotation keeps maxFiles generations and caps the active file") {
    val dir = Files.createTempDirectory("graft-log").toString
    val lg = new AsyncLogger(dir, "r.log", maxBytes = 200, maxFiles = 3,
      flushIntervalMs = 100000)
    (1 to 40).foreach { i =>
      lg.log(s"line $i " + "x" * 40)
      lg.flush() // force per-message writes so rotation triggers often
    }
    lg.close()
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(files.contains("r.log") && files.contains("r.log.1"))
    assert(files.forall(f => f.matches("""r\.log(\.[123])?""")),
      files.mkString(","))
    // every line survives in exactly one generation or was rotated out
    val all = files.flatMap(f =>
      Files.readAllLines(Paths.get(dir, f)).asScala)
    assert(all.nonEmpty && all.forall(_.contains("line ")))
  }
}
