package graft.engine

/** Core engine data model — Spark-native re-expression of the reference's
  * packet/step/generator/action abstractions (SURVEY.md §1.1; reference:
  * dbccore/dbccore.py:280-345 parse_packet, README.md:159-169).
  */

/** Packet execution semantics (reference: dbccore.py:22-27,
  * db_converter.py:426-457). */
sealed trait PacketType
object PacketType {
  case object Default extends PacketType      // tracked, committed
  case object ReadOnly extends PacketType     // no tracker writes
  case object NoCommit extends PacketType     // dry-run: plan, don't save
  case object Maintenance extends PacketType  // untracked maintenance cmds
  case object ExportData extends PacketType   // SELECT-only → CSV/zip sink

  def parse(s: String): PacketType = s.trim.toLowerCase match {
    case "read_only" => ReadOnly
    case "no_commit" => NoCommit
    case "maintenance" => Maintenance
    case "export_data" => ExportData
    case _ => Default
  }

  def name(t: PacketType): String = t match {
    case Default => "default"
    case ReadOnly => "read_only"
    case NoCommit => "no_commit"
    case Maintenance => "maintenance"
    case ExportData => "export_data"
  }
}

/** Hook verbosity subset (reference: dbccore.py:662-686). `hookType`
  * selects the webhook dialect (reference meta_data.json hook.type,
  * dbccore.py:632-648: "mattermost" | "slack" — same verbosity filter,
  * different payload shape and emphasis markup). */
final case class HookConf(
    hookType: String = "mattermost",
    channel: Option[String] = None,
    username: Option[String] = None,
    message: Option[String] = None,
    verbosity: Set[String] = Set.empty, // all | resultset | raise | stm_result
    showParameters: Boolean = false)

/** meta_data.json model (reference: dbccore.py:317-328). */
final case class MetaData(
    packetType: PacketType = PacketType.Default,
    description: String = "",
    responsible: String = "",
    taskId: String = "",
    tags: Seq[String] = Nil,
    hook: Option[HookConf] = None,
    exportUseZip: Boolean = false,
    exportPassword: Option[String] = None,
    /** per-packet session overrides (reference `postgresql` block consumed
      * by prepare_session, dbccore.py:347-377 — here Spark SQL confs,
      * e.g. "spark.sql.shuffle.partitions": "64") */
    sessionConf: Map[String, String] = Map.empty)

/** One step: ordered SQL text; generators attach by 2-digit index
  * (reference: NN_step.sql / NN_gen_obj.sql / NN_gen_nsp.sql pairing at
  * dbccore.py:296-301). `runOnce` steps execute before generators are
  * evaluated (dbccore.py:465-469). */
final case class Step(
    name: String,
    sql: String,
    index: Option[String],       // "01".."99"; None for run_once
    runOnce: Boolean = false,
    isPython: Boolean = false)   // NN_step.py → registered Scala callback (E26)

final case class Generator(index: String, kind: GeneratorKind, sql: String)
sealed trait GeneratorKind
object GeneratorKind {
  case object Obj extends GeneratorKind // GEN_OBJ_FLD_i placeholders
  case object Nsp extends GeneratorKind // GEN_NSP_FLD_i placeholders
}

final case class Packet(
    name: String,
    steps: Seq[Step],
    genObj: Map[String, Generator],
    genNsp: Map[String, Generator],
    packetHash: String,
    meta: MetaData)

/** Typed run-outcome kind for the steps loop (reference do_work /
  * skip / terminate classification, dbccore.py:465-576,1125-1171).
  * Retryability is a KIND, never a descr-string match. */
sealed trait Kind
object Kind {
  case object Done extends Kind
  case object Skipped extends Kind
  case object Retryable extends Kind
  case object Error extends Kind
  case object Terminate extends Kind
}

/** Outcome of a step / steps-pass / packet run: the kind, an optional
  * human description (error text or retry class), and the step file
  * that produced a non-Done outcome (needed so retry exhaustion can
  * write the terminal step status, dbccore.py:496-526). */
final case class Outcome(
    kind: Kind,
    descr: Option[String] = None,
    failedStep: Option[String] = None)

/** Step outcome taxonomy (reference classify at dbccore.py:465-543). */
sealed trait StepOutcome
object StepOutcome {
  final case class Done(rows: Long) extends StepOutcome
  final case class Skipped(reason: String) extends StepOutcome
  final case class Failed(error: String) extends StepOutcome
}

/** RAISE-style notice channel (reference notice capture dbccore.py:838-844). */
final case class Notice(severity: String, message: String)

/** One captured statement resultset (reference: psc_common.py:102-104
  * rows + column_names; collected into result_data at dbccore.py:901-902). */
final case class ResultSet(columns: Seq[String], rows: Seq[Seq[Any]])

/** Run result shape (reference DBCResult, db_converter.py:356-369). */
final case class RunResult(
    resultCode: Map[String, String],   // target -> success|fail|locked|nothing_todo|terminate
    packetStatus: Map[String, String], // target -> new|started|done|exception
    stepResults: Map[String, Map[String, StepOutcome]],
    notices: Seq[Notice],
    // target -> step file -> captured resultsets (reference result_data,
    // db_converter.py:364-369, asserted on by test_packets.py:904-939)
    resultData: Map[String, Map[String, Seq[ResultSet]]] = Map.empty)
