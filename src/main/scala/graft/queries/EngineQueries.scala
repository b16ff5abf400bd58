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
      FROM region r ORDER BY r_name"""))
  )
}
