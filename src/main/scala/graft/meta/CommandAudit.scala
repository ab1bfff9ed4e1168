package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.atomic.AtomicLong

/** Persisted orchestration command audit — the reference's command-execution
  * history (`orchestration/orchestration_runner.py:139-226` begin/end/fail,
  * `persistence/orchestration_repo_client.py:306-390` start_command /
  * end_command / start_command_step / end_command_step / start_offload_chunk
  * / end_offload_chunk, `orchestration/execution_id.py` UUID execution ids).
  * The reference writes rows into GOE_REPO tables; here each event is one
  * JSON line appended to `<dir>/command_audit.jsonl` — durable across JVMs,
  * foldable into run histories, and a swap-in point for a JDBC-backed repo.
  *
  * Write shape: append-one-line-and-flush per event. The driver is the only
  * writer (orchestration runs on the Spark driver), appends are synchronized
  * within the JVM, and the reader tolerates a torn final line, so a crash
  * mid-event loses at most that event — never corrupts history. Event ids
  * are seeded from the existing file so they keep increasing across
  * restarts, matching the reference's repo-sequence semantics.
  */
object CommandAudit {

  /** Command status codes (`orchestration_constants.py:54-56`). */
  val Executing = "EXECUTING"
  val Success = "SUCCESS"
  val Error = "ERROR"

  /** New execution id — the reference's `ExecutionId()` UUID. */
  def newExecutionId(): String = java.util.UUID.randomUUID().toString

  final case class StepRun(
      stepId: Long, step: String, status: String,
      startTs: Long, endTs: Option[Long], details: String)
  final case class ChunkRun(
      chunkId: Long, chunkNumber: Int, partitions: Seq[String],
      status: String, rowCount: Option[Long],
      startTs: Long, endTs: Option[Long])
  final case class CommandRun(
      commandId: Long, executionId: String, commandType: String,
      commandInput: String, status: String,
      startTs: Long, endTs: Option[Long],
      steps: Seq[StepRun], chunks: Seq[ChunkRun])

  /** One instance per metadata dir, process-wide. Two concurrent commands
    * (the listener's thread pool locks per-*table*, so offloads of
    * different tables into one metadata dir overlap) must share the id
    * counter and the append lock — separate instances would seed the same
    * max id from the file and emit colliding event ids, cross-wiring run
    * histories when `runs()` folds end events by id. Keyed on the
    * canonical absolute path so `dir` spelling variants can't split. */
  private val instances =
    new java.util.concurrent.ConcurrentHashMap[String, CommandAudit]()

  def open(dir: String): CommandAudit = {
    val key = Paths.get(dir).toAbsolutePath.normalize.toString
    instances.computeIfAbsent(key, k => new CommandAudit(k))
  }
}

final class CommandAudit private (dir: String) {
  import CommandAudit._

  private val path = Paths.get(dir, "command_audit.jsonl")

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
  private def q(s: String): String = "\"" + esc(s) + "\""

  private val nextId: AtomicLong = {
    val seed =
      if (Files.exists(path)) readEvents().map(id).foldLeft(0L)(math.max)
      else 0L
    new AtomicLong(seed + 1)
  }

  private def append(fields: Seq[(String, String)]): Long = synchronized {
    Files.createDirectories(Paths.get(dir))
    val eid = nextId.getAndIncrement()
    val all = Seq("id" -> eid.toString,
      "ts" -> System.currentTimeMillis().toString) ++ fields
    val line = all.map { case (k, v) => q(k) + ":" + v }
      .mkString("{", ",", "}") + "\n"
    Files.write(path, line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    eid
  }

  /** `start_command` — returns the history-record id for [[endCommand]]. */
  def startCommand(executionId: String, commandType: String,
                   commandInput: String,
                   parameters: Map[String, String] = Map.empty): Long =
    append(Seq(
      "kind" -> q("command_begin"),
      "execution_id" -> q(executionId),
      "command_type" -> q(commandType),
      "command_input" -> q(commandInput),
      "parameters" -> parameters.toSeq.sortBy(_._1)
        .map { case (k, v) => q(k) + ":" + q(v) }.mkString("{", ",", "}")))

  def endCommand(commandId: Long, status: String): Unit =
    append(Seq("kind" -> q("command_end"),
      "command_id" -> commandId.toString, "status" -> q(status)))

  /** `start_command_step` — returns the step-record id for [[endStep]]. */
  def startStep(executionId: String, commandType: String,
                step: String): Long =
    append(Seq("kind" -> q("step_begin"),
      "execution_id" -> q(executionId),
      "command_type" -> q(commandType), "step" -> q(step)))

  def endStep(stepId: Long, status: String, details: String = ""): Unit =
    append(Seq("kind" -> q("step_end"), "step_id" -> stepId.toString,
      "status" -> q(status), "details" -> q(details)))

  /** `start_offload_chunk` — returns the chunk-record id for [[endChunk]]. */
  def startChunk(executionId: String, chunkNumber: Int,
                 partitions: Seq[String]): Long =
    append(Seq("kind" -> q("chunk_begin"),
      "execution_id" -> q(executionId),
      "chunk_number" -> chunkNumber.toString,
      "partitions" -> partitions.map(q).mkString("[", ",", "]")))

  def endChunk(chunkId: Long, status: String,
               rowCount: Option[Long] = None): Unit =
    append(Seq("kind" -> q("chunk_end"), "chunk_id" -> chunkId.toString,
      "status" -> q(status),
      "row_count" -> rowCount.map(_.toString).getOrElse("null")))

  // ---- reader ----

  private def strField(js: String, key: String): Option[String] = {
    val m = ("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    m.findFirstMatchIn(js).map(g => unescape(g.group(1)))
  }
  private def longField(js: String, key: String): Option[Long] =
    ("\"" + key + "\"\\s*:\\s*(\\d+)").r
      .findFirstMatchIn(js).map(_.group(1).toLong)
  private def arrField(js: String, key: String): Seq[String] =
    ("\"" + key + "\"\\s*:\\s*\\[(.*?)\\]").r.findFirstMatchIn(js)
      .map { g =>
        val body = g.group(1).trim
        if (body.isEmpty) Nil
        else "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(body)
          .map(x => unescape(x.group(1))).toSeq
      }.getOrElse(Nil)
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 'u' =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case c => sb += c; i += 2
        }
      } else { sb += s(i); i += 1 }
    }
    sb.toString
  }
  private def id(js: String): Long = longField(js, "id").getOrElse(0L)

  private def readEvents(): Seq[String] =
    if (!Files.exists(path)) Nil
    else {
      import scala.jdk.CollectionConverters._
      // a crash mid-append can tear the LAST line only; skip unparseable
      Files.readAllLines(path, StandardCharsets.UTF_8).asScala.toSeq
        .filter(l => l.startsWith("{") && l.endsWith("}"))
    }

  /** Fold the event log into per-command run histories, newest first. A
    * command with no `command_end` event is still `EXECUTING` (or was
    * killed — exactly the reference's semantics, where an abandoned run
    * stays EXECUTING until reconciled). */
  def runs(): Seq[CommandRun] = {
    val events = readEvents()
    def kind(js: String) = strField(js, "kind").getOrElse("")
    val stepEnds = events.filter(kind(_) == "step_end")
      .flatMap(e => longField(e, "step_id").map(_ -> e)).toMap
    val chunkEnds = events.filter(kind(_) == "chunk_end")
      .flatMap(e => longField(e, "chunk_id").map(_ -> e)).toMap
    val commandEnds = events.filter(kind(_) == "command_end")
      .flatMap(e => longField(e, "command_id").map(_ -> e)).toMap

    val stepsByExec = events.filter(kind(_) == "step_begin").map { e =>
      val end = stepEnds.get(id(e))
      strField(e, "execution_id").getOrElse("") -> StepRun(
        stepId = id(e),
        step = strField(e, "step").getOrElse(""),
        status = end.flatMap(strField(_, "status")).getOrElse(Executing),
        startTs = longField(e, "ts").getOrElse(0L),
        endTs = end.flatMap(longField(_, "ts")),
        details = end.flatMap(strField(_, "details")).getOrElse(""))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    val chunksByExec = events.filter(kind(_) == "chunk_begin").map { e =>
      val end = chunkEnds.get(id(e))
      strField(e, "execution_id").getOrElse("") -> ChunkRun(
        chunkId = id(e),
        chunkNumber = longField(e, "chunk_number").getOrElse(0L).toInt,
        partitions = arrField(e, "partitions"),
        status = end.flatMap(strField(_, "status")).getOrElse(Executing),
        rowCount = end.flatMap(longField(_, "row_count")),
        startTs = longField(e, "ts").getOrElse(0L),
        endTs = end.flatMap(longField(_, "ts")))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    events.filter(kind(_) == "command_begin").map { e =>
      val exec = strField(e, "execution_id").getOrElse("")
      val end = commandEnds.get(id(e))
      CommandRun(
        commandId = id(e),
        executionId = exec,
        commandType = strField(e, "command_type").getOrElse(""),
        commandInput = strField(e, "command_input").getOrElse(""),
        status = end.flatMap(strField(_, "status")).getOrElse(Executing),
        startTs = longField(e, "ts").getOrElse(0L),
        endTs = end.flatMap(longField(_, "ts")),
        steps = stepsByExec.getOrElse(exec, Nil).sortBy(_.stepId),
        chunks = chunksByExec.getOrElse(exec, Nil).sortBy(_.chunkId))
    }.sortBy(-_.commandId)
  }

  def run(executionId: String): Option[CommandRun] =
    runs().find(_.executionId == executionId)
}
