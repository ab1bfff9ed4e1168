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

  test("rotation seals numbered segments; reads span every segment and " +
      "the id sequence stays monotone across rotations and reopens") {
    val dir = Files.createTempDirectory("graft_audit_rot").toString
    val audit = new FileCommandAudit(dir)
    def oneCommand(n: Int): Long = {
      val exec = CommandAudit.newExecutionId()
      val cid = audit.startCommand(exec, "OFFLOAD", s"t$n")
      val sid = audit.startStep(exec, "OFFLOAD", s"step$n")
      audit.endStep(sid, CommandAudit.Success)
      audit.endCommand(cid, CommandAudit.Success)
      cid
    }
    val c1 = oneCommand(1)
    audit.rotate()
    val c2 = oneCommand(2)
    audit.rotate()
    val c3 = oneCommand(3)
    assert(Files.exists(Paths.get(dir, "command_audit.000001.jsonl")))
    assert(Files.exists(Paths.get(dir, "command_audit.000002.jsonl")))
    assert(c1 < c2 && c2 < c3) // monotone across seals
    // one timeline across segments + active file
    val runs = audit.runs()
    assert(runs.map(_.commandInput).sorted == Seq("t1", "t2", "t3"))
    assert(runs.forall(r => r.status == CommandAudit.Success &&
      r.steps.nonEmpty))
    // an end event in a LATER segment resolves a begin sealed earlier
    val exec4 = CommandAudit.newExecutionId()
    val c4 = audit.startCommand(exec4, "OFFLOAD", "t4")
    audit.rotate()
    audit.endCommand(c4, CommandAudit.Success)
    assert(audit.run(exec4).get.status == CommandAudit.Success)
    // restart: a fresh instance folds all segments and seeds past them
    val reopened = new FileCommandAudit(dir)
    assert(reopened.runs().map(_.commandInput).sorted ==
      Seq("t1", "t2", "t3", "t4"))
    val next = reopened.startCommand("e5", "OFFLOAD", "t5")
    assert(next > reopened.runs().flatMap(r =>
      r.commandId +: r.steps.map(_.stepId)).filter(_ != next).max)
  }

  test("a reader instance opened before a rotation keeps seeing the " +
      "full timeline afterwards (cross-JVM reader heal)") {
    val dir = Files.createTempDirectory("graft_audit_xjvm").toString
    val writer = new FileCommandAudit(dir)
    val reader = new FileCommandAudit(dir) // second instance = second JVM
    val c1 = writer.startCommand(CommandAudit.newExecutionId(),
      "OFFLOAD", "before-rotation")
    writer.endCommand(c1, CommandAudit.Success)
    assert(reader.runs().map(_.commandInput) == Seq("before-rotation"))
    writer.rotate()
    // grow the FRESH active file PAST the reader's stale offset before
    // the reader looks again: a size-shrink heuristic would misread the
    // new file from a mid-record offset and drop its head silently — the
    // exact detection is the unseen sealed segment, not the size
    (1 to 6).foreach { i =>
      val c = writer.startCommand(CommandAudit.newExecutionId(),
        "OFFLOAD", s"after-rotation-$i")
      writer.endCommand(c, CommandAudit.Success)
    }
    val seen = reader.runs()
    assert(seen.map(_.commandInput).toSet ==
      (Set("before-rotation") ++
        (1 to 6).map(i => s"after-rotation-$i")))
    assert(seen.forall(_.status == CommandAudit.Success))
  }

  test("size-based auto-rotation seals segments as the fence is crossed") {
    val dir = Files.createTempDirectory("graft_audit_auto").toString
    sys.props("graft.audit.segment.bytes") = "256"
    try {
      val audit = new FileCommandAudit(dir)
      (1 to 8).foreach { i =>
        val cid = audit.startCommand(
          CommandAudit.newExecutionId(), "OFFLOAD", s"cmd$i")
        audit.endCommand(cid, CommandAudit.Success)
      }
      val segs = Files.list(Paths.get(dir)).iterator()
      var n = 0
      while (segs.hasNext) {
        if (segs.next().getFileName.toString
            .matches("command_audit\\.\\d{6}\\.jsonl")) n += 1
      }
      assert(n >= 2, s"expected auto-sealed segments, found $n")
      assert(audit.runs().size == 8)
      assert(audit.runs().forall(_.status == CommandAudit.Success))
    } finally { sys.props -= "graft.audit.segment.bytes"; () }
  }
}
