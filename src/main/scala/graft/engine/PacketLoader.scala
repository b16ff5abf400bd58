package graft.engine

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Packet directory parser (reference E1: dbccore.py:280-345).
  *
  * Layout: `NN_step.sql` files (lexicographic order), optional paired
  * `NN_gen_obj.sql` / `NN_gen_nsp.sql` generators, optional `run_once.sql`
  * executed first, optional `meta_data.json`. User placeholders `DBC_PL_*`
  * are applied at parse time; the packet MD5 covers every SQL byte read
  * (pre-substitution, like the reference hashing raw files) so the hash
  * drift guard (E16, dbccore.py:449-463) catches edits.
  */
object PacketLoader {

  private val StepRe = "^([0-9]{2})_.*\\.sql$".r
  private val GenObjRe = "^([0-9]{2})_gen_obj\\.sql$".r
  private val GenNspRe = "^([0-9]{2})_gen_nsp\\.sql$".r

  def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  def load(packetDir: String,
      userPlaceholders: Map[String, String] = Map.empty): Packet = {
    val dir = Paths.get(packetDir)
    require(Files.isDirectory(dir), s"packet dir not found: $packetDir")
    val files = Files.list(dir).iterator().asScala.toSeq
      .filter(Files.isRegularFile(_)).sortBy(_.getFileName.toString)

    def read(p: Path): String =
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)

    var rawConcat = new StringBuilder
    var steps = Vector.empty[Step]
    var genObj = Map.empty[String, Generator]
    var genNsp = Map.empty[String, Generator]
    var meta = MetaData()

    files.foreach { f =>
      val name = f.getFileName.toString
      name match {
        case "meta_data.json" =>
          val raw = read(f); rawConcat ++= raw
          meta = MetaJson.parse(raw)
        case "run_once.sql" =>
          val raw = read(f); rawConcat ++= raw
          steps = Step(name, Placeholders.applyUser(raw, userPlaceholders),
            None, runOnce = true) +: steps
        case GenObjRe(idx) =>
          val raw = read(f); rawConcat ++= raw
          genObj += idx -> Generator(idx, GeneratorKind.Obj,
            Placeholders.applyUser(raw, userPlaceholders))
        case GenNspRe(idx) =>
          val raw = read(f); rawConcat ++= raw
          genNsp += idx -> Generator(idx, GeneratorKind.Nsp,
            Placeholders.applyUser(raw, userPlaceholders))
        case StepRe(idx) =>
          val raw = read(f); rawConcat ++= raw
          steps = steps :+ Step(name,
            Placeholders.applyUser(raw, userPlaceholders), Some(idx))
        case _ => () // .py steps / goldens / data files: not loaded here
      }
    }
    // ordering: run_once first, then lexicographic by file name
    val (ro, rest) = steps.partition(_.runOnce)
    Packet(dir.getFileName.toString, ro ++ rest.sortBy(_.name),
      genObj, genNsp, md5Hex(rawConcat.toString), meta)
  }
}

/** Minimal dependency-free JSON reader for meta_data.json (flat fields +
  * one nested hook object — the reference's schema, README.md:188-214).
  * Not a general JSON parser; packets are trusted repo content. */
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

  def parse(json: String): MetaData = {
    val hook =
      if (json.contains("\"hook\"")) {
        val hookJson = ("\"hook\"\\s*:\\s*\\{([^}]*)\\}").r
          .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
        Some(HookConf(
          channel = strField(hookJson, "channel"),
          username = strField(hookJson, "username"),
          message = strField(hookJson, "message"),
          verbosity = arrField(hookJson, "verbosity").toSet,
          showParameters = boolField(hookJson, "show_parameters").getOrElse(false)))
      } else None
    MetaData(
      packetType = PacketType.parse(strField(json, "type").getOrElse("default")),
      description = strField(json, "description").getOrElse(""),
      responsible = strField(json, "responsible").getOrElse(""),
      taskId = strField(json, "task_id").getOrElse(""),
      tags = arrField(json, "tags"),
      hook = hook,
      exportUseZip = boolField(json, "use_zip").getOrElse(false),
      exportPassword = strField(json, "password"))
  }
}
