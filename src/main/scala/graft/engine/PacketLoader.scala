package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Packet directory parser (reference E1: dbccore.py:280-345).
  *
  * Layout: step files = every `*.sql` / `*.py` whose name does not contain
  * `_gen_`, sorted lexicographically; `NN_gen_obj.sql` / `NN_gen_nsp.sql`
  * generators pair with step NN; `run_once.sql` executes before generators
  * are evaluated; optional `meta_data.json`.
  *
  * User placeholders `DBC_PL_*` are applied at parse time. The packet MD5
  * is computed over the raw (pre-substitution) contents of every
  * .sql/.py/.json file, concatenated in CONTENT-sorted order — the
  * reference sorts `packet_full_content` before hashing
  * (dbccore.py:333-336), so renaming a file does not change the hash but
  * editing any byte (including a `.py` step or meta_data.json) does.
  * The E16 hash-drift guard (dbccore.py:449-463) relies on exactly this.
  */
object PacketLoader {

  private val IdxRe = "^([0-9]{2})_.*".r
  private val GenObjRe = "^([0-9]{2})_gen_obj\\.sql$".r
  private val GenNspRe = "^([0-9]{2})_gen_nsp\\.sql$".r

  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  def load(packetDir: String,
      userPlaceholders: Map[String, String] = Map.empty): Packet = {
    val dir = Paths.get(packetDir)
    require(Files.isDirectory(dir), s"packet dir not found: $packetDir")
    val files: Seq[Path] = Using.resource(Files.list(dir)) { stream =>
      stream.iterator().asScala.toSeq
        .filter(Files.isRegularFile(_)).sortBy(_.getFileName.toString)
    }

    def read(p: Path): String =
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)

    var hashedContents = Vector.empty[String]
    var steps = Vector.empty[Step]
    var genObj = Map.empty[String, Generator]
    var genNsp = Map.empty[String, Generator]
    var meta = MetaData()

    files.foreach { f =>
      val name = f.getFileName.toString
      val isSql = name.endsWith(".sql")
      val isPy = name.endsWith(".py")
      val isJson = name.endsWith(".json")
      if (isSql || isPy || isJson) {
        val raw = read(f)
        hashedContents :+= raw
        name match {
          case "meta_data.json" => meta = MetaJson.parse(raw)
          case GenObjRe(idx) =>
            genObj += idx -> Generator(idx, GeneratorKind.Obj,
              Placeholders.applyUser(raw, userPlaceholders))
          case GenNspRe(idx) =>
            genNsp += idx -> Generator(idx, GeneratorKind.Nsp,
              Placeholders.applyUser(raw, userPlaceholders))
          case n if (isSql || isPy) && !n.contains("_gen_") =>
            val idx = n match { case IdxRe(i) => Some(i); case _ => None }
            steps :+= Step(n, Placeholders.applyUser(raw, userPlaceholders),
              idx, runOnce = n == "run_once.sql", isPython = isPy)
          case _ => () // other .json files: hashed, not loaded
        }
      }
    }
    // execution ordering: run_once first, then lexicographic by file name
    val (ro, rest) = steps.partition(_.runOnce)
    Packet(dir.getFileName.toString, ro ++ rest.sortBy(_.name),
      genObj, genNsp, md5Hex(hashedContents.sorted.mkString), meta)
  }
}

/** Minimal dependency-free JSON reader for meta_data.json (flat fields
  * plus the nested `hook` / `export_options` / `postgresql` objects —
  * the reference's schema, README.md:188-214). Nested objects are cut
  * out of the document BEFORE flat-field scans run, so `hook.username`
  * or `export_options.password` cannot cross-contaminate a top-level
  * field of the same name (and vice versa). Not a general JSON parser;
  * packets are trusted repo content. */
object MetaJson {
  private def strField(json: String, key: String): Option[String] =
    ("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(json).map(_.group(1).replace("\\\"", "\"").replace("\\n", "\n"))

  private def boolField(json: String, key: String): Option[Boolean] =
    ("\"" + key + "\"\\s*:\\s*(true|false)").r
      .findFirstMatchIn(json).map(_.group(1) == "true")

  private def arrField(json: String, key: String): Seq[String] =
    ("\"" + key + "\"\\s*:\\s*\\[([^\\]]*)\\]").r
      .findFirstMatchIn(json).map(_.group(1)).toSeq
      .flatMap(_.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty))

  /** Extract `"key": { ... }` (no nested braces inside — true for the
    * reference schema) and return (objectBody, documentWithoutIt). */
  private def cutObject(json: String, key: String): (String, String) = {
    val re = ("\"" + key + "\"\\s*:\\s*\\{([^}]*)\\}").r
    re.findFirstMatchIn(json) match {
      case Some(m) => (m.group(1), json.substring(0, m.start) + json.substring(m.end))
      case None => ("", json)
    }
  }

  private val kvRe = "\"([^\"]+)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r

  def parse(json: String): MetaData = {
    val (hookJson, rest1) = cutObject(json, "hook")
    val (exportJson, rest2) = cutObject(rest1, "export_options")
    // `spark` block preferred; `postgresql` accepted for packet-dir parity
    val (sparkJson, rest3) = cutObject(rest2, "spark")
    val (pgJson, top) = cutObject(rest3, "postgresql")
    val sessionConf = kvRe.findAllMatchIn(
      if (sparkJson.nonEmpty) sparkJson else pgJson)
      .map(m => m.group(1) -> m.group(2)).toMap
    val hook =
      if (hookJson.nonEmpty)
        Some(HookConf(
          hookType = strField(hookJson, "type").getOrElse("mattermost"),
          channel = strField(hookJson, "channel"),
          username = strField(hookJson, "username"),
          message = strField(hookJson, "message"),
          verbosity = {
            val v = arrField(hookJson, "verbosity").toSet
            if (v.isEmpty) Set("all") else v // reference default, dbccore.py:317-319
          },
          showParameters = boolField(hookJson, "show_parameters").getOrElse(false)))
      else None
    MetaData(
      packetType = PacketType.parse(strField(top, "type").getOrElse("default")),
      description = strField(top, "description").getOrElse(""),
      responsible = strField(top, "responsible").getOrElse(""),
      taskId = strField(top, "task_id").getOrElse(""),
      tags = arrField(top, "tags"),
      hook = hook,
      exportUseZip = boolField(exportJson, "use_zip").getOrElse(false),
      exportPassword = strField(exportJson, "password"),
      sessionConf = sessionConf)
  }
}
