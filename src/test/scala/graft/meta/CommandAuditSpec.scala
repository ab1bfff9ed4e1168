package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.scalatest.funsuite.AnyFunSuite

class CommandAuditSpec extends AnyFunSuite {

  private def freshAudit(): (CommandAudit, String) = {
    val dir = Files.createTempDirectory("graft_audit").toString
    (CommandAudit.open(dir), dir)
  }

  test("runs() reads only appended bytes, not the whole file per call") {
    val (audit0, _) = freshAudit()
    val audit = audit0.asInstanceOf[FileCommandAudit]
    val exec = CommandAudit.newExecutionId()
    val cid = audit.startCommand(exec, "OFFLOAD", "t1")
    val sid = audit.startStep(exec, "OFFLOAD", "stage")
    audit.endStep(sid, CommandAudit.Success)
    audit.endCommand(cid, CommandAudit.Success)

    val afterWrites = audit.ingestedBytes
    assert(afterWrites > 0)
    val r1 = audit.runs()
    // no appends between the calls: the offset must not move (no re-read)
    assert(audit.ingestedBytes == afterWrites)
    val r2 = audit.runs()
    assert(audit.ingestedBytes == afterWrites)
    assert(r1 == r2)
    assert(r1.head.status == CommandAudit.Success)
    assert(r1.head.steps.map(_.status) == Seq(CommandAudit.Success))
  }

  test("events appended by another writer become visible incrementally") {
    val (audit, dir) = freshAudit()
    val exec = CommandAudit.newExecutionId()
    val cid = audit.startCommand(exec, "OFFLOAD", "t1")
    audit.endCommand(cid, CommandAudit.Success)
    assert(audit.runs().size == 1)

    // simulate a second JVM appending to the same file (sequential use —
    // concurrent cross-JVM writers were never supported)
    val line =
      s"""{"id":99,"ts":5,"kind":"command_begin","execution_id":"x2",""" +
        """"command_type":"OFFLOAD","command_input":"t2","parameters":{}}""" + "\n"
    Files.write(Paths.get(dir, "command_audit.jsonl"),
      line.getBytes(StandardCharsets.UTF_8), StandardOpenOption.APPEND)

    val runs = audit.runs()
    assert(runs.size == 2)
    assert(runs.head.commandId == 99) // newest first
    assert(runs.head.status == CommandAudit.Executing)
  }

  test("a torn final line is held back until its newline arrives") {
    val (audit, dir) = freshAudit()
    val exec = CommandAudit.newExecutionId()
    val cid = audit.startCommand(exec, "OFFLOAD", "t1")
    val path = Paths.get(dir, "command_audit.jsonl")

    // write the first half of an event with no newline — must be invisible
    val half = s"""{"id":50,"ts":7,"kind":"command_end","command_id":$cid,"""
    Files.write(path, half.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.APPEND)
    assert(audit.runs().head.status == CommandAudit.Executing)

    // complete the line: the held-back tail joins the new bytes
    Files.write(path, "\"status\":\"SUCCESS\"}\n".getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.APPEND)
    assert(audit.runs().head.status == CommandAudit.Success)
  }

  test("id sequence reseeds past externally-written ids on reopen") {
    val dir = Files.createTempDirectory("graft_audit").toString
    val line =
      """{"id":1000,"ts":1,"kind":"command_begin","execution_id":"e",""" +
        """"command_type":"OFFLOAD","command_input":"t","parameters":{}}""" + "\n"
    Files.write(Paths.get(dir, "command_audit.jsonl"),
      line.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    val audit = CommandAudit.open(dir)
    val cid = audit.startCommand("e2", "OFFLOAD", "t2")
    assert(cid > 1000)
  }
}
