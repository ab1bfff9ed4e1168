package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.verify.Expectations._

final case class Reading(k: Option[Long], v: String, x: Double)

class StreamingExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    NotNull("stream", "k"),
    AcceptedValues("stream", "v", Seq("a", "b")),
    InRange("stream", "x", 0L, 100000L))

  private def cfg(base: String) = StreamingExpectations.Config(
    storeDir = s"$base/store", checkpointDir = s"$base/ckpt",
    rules = rules)

  private val batch0 = Seq(
    Reading(Some(1L), "a", 0.05),
    Reading(None, "a", 0.05),      // null key
    Reading(Some(2L), "zz", 0.2))  // bad value + out of range
  private val batch1 = Seq(
    Reading(Some(3L), "b", 0.01))  // clean

  test("per-batch reports accumulate; totals aggregate committed " +
      "batches only") {
    val c = cfg(Files.createTempDirectory("sexp").toString)
    StreamingExpectations.processBatch(batch0.toDF(), 0L, c)
    StreamingExpectations.processBatch(batch1.toDF(), 1L, c)
    val hist = StreamingExpectations.history(spark, c).collect()
    assert(hist.length === 6) // 3 rules × 2 batches
    val tot = StreamingExpectations.totals(spark, c).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations")))
      .toMap
    assert(tot("not_null:stream.k") === ((4L, 1L)))
    assert(tot("accepted_values:stream.v") === ((4L, 1L)))
    assert(tot("in_range:stream.x") === ((4L, 1L)))
  }

  test("distribution_within rides the streaming monitor: per-batch " +
      "moved-rows counts persist and regrade at read time") {
    val base = Files.createTempDirectory("sexp_dist").toString
    val c = StreamingExpectations.Config(
      storeDir = s"$base/store", checkpointDir = s"$base/ckpt",
      rules = Seq(DistributionWithin("stream", "v",
        Seq("a" -> 1L, "b" -> 1L))))
    // batch 0: a×3 b×1 vs 50/50 -> move 1 row; batch 1: balanced -> 0
    StreamingExpectations.processBatch(Seq(
      Reading(Some(1L), "a", 0.0), Reading(Some(2L), "a", 0.0),
      Reading(Some(3L), "a", 0.0), Reading(Some(4L), "b", 0.0))
      .toDF(), 0L, c)
    StreamingExpectations.processBatch(Seq(
      Reading(Some(5L), "a", 0.0), Reading(Some(6L), "b", 0.0))
      .toDF(), 1L, c)
    val hist = StreamingExpectations.history(spark, c).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_violations")).toMap
    assert(hist === Map(0L -> 1L, 1L -> 0L))
    // read-time grading: a 1-row drift budget tolerates batch 0
    val graded = StreamingExpectations.gradedHistory(spark, c.storeDir,
      Seq(Graded(DistributionWithin("stream", "v",
        Seq("a" -> 1L, "b" -> 1L)), warnAbove = 0L, errorAbove = 1L)))
      .collect()
      .map(r => r.getAs[Long]("batch_id") ->
        r.getAs[String]("severity")).toMap
    assert(graded === Map(0L -> "warn", 1L -> "pass"))
  }

  test("gradedHistory applies budgets at read time: severity per batch, " +
      "unlisted rules stay strict, budgets tune without reprocessing") {
    val c = cfg(Files.createTempDirectory("sexp_graded").toString)
    StreamingExpectations.processBatch(batch0.toDF(), 0L, c) // 1 viol/rule
    StreamingExpectations.processBatch(batch1.toDF(), 1L, c) // clean
    def graded(budgets: Seq[Graded]) = StreamingExpectations
      .gradedHistory(spark, c.storeDir, budgets).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[String]("rule_id")) ->
        (r.getAs[String]("severity"), r.getAs[Boolean]("passed")))
      .toMap
    // k tolerates 5 silently (warn-only: never errors), v warns then
    // errors above 0; x is unlisted -> strict
    val g1 = graded(Seq(
      Graded(NotNull("stream", "k"), 5L, Long.MaxValue),
      Graded(AcceptedValues("stream", "v", Seq("a", "b")), 0L, 10L)))
    assert(g1((0L, "not_null:stream.k")) === (("pass", true)))
    assert(g1((0L, "accepted_values:stream.v")) === (("warn", true)))
    assert(g1((0L, "in_range:stream.x")) === (("error", false)))
    assert(g1((1L, "in_range:stream.x")) === (("pass", true)))
    // tightening k's budget regrades the SAME store — no reprocessing
    val g2 = graded(Seq(Graded(NotNull("stream", "k"), 0L, 0L)))
    assert(g2((0L, "not_null:stream.k")) === (("error", false)))
  }

  test("committed replay skips; a mid-crash batch rewrites its own " +
      "report partition — counts never double") {
    val c = cfg(Files.createTempDirectory("sexp_replay").toString)
    StreamingExpectations.processBatch(batch0.toDF(), 0L, c)
    StreamingExpectations.processBatch(batch1.toDF(), 1L, c)
    def viol(): Long = StreamingExpectations.totals(spark, c)
      .agg(sum(col("n_violations"))).head.getLong(0)
    val v0 = viol()
    StreamingExpectations.processBatch(batch1.toDF(), 1L, c) // committed
    assert(viol() === v0)
    // crash window: report landed, HWM didn't
    val hwmP = new org.apache.hadoop.fs.Path(
      s"${c.storeDir}/reports__hwm")
    val fs = hwmP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Hwm.write(fs, hwmP, 0L)
    StreamingExpectations.processBatch(batch1.toDF(), 1L, c)
    assert(viol() === v0, "replay doubled the violation counts")
  }

  test("streaming end-to-end over MemoryStream") {
    val base = Files.createTempDirectory("sexp_e2e").toString
    val c = cfg(base)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Reading]
    mem.addData(batch0: _*)
    val q = StreamingExpectations.start(mem.toDF(), c)
    q.awaitTermination(60000)
    val tot = StreamingExpectations.totals(spark, c).collect()
    assert(tot.length === 3)
    assert(tot.forall(_.getAs[Long]("n_rows") === 3L))
    assert(tot.count(!_.getAs[Boolean]("passed")) === 3)
  }

  test("prune keeps the trailing window and never touches an " +
      "uncommitted partition") {
    val c = cfg(Files.createTempDirectory("sexp_prune").toString)
    (0L to 4L).foreach { b =>
      StreamingExpectations.processBatch(batch1.toDF(), b, c)
    }
    // crash window: batch 5's report landed but its HWM write didn't
    StreamingExpectations.processBatch(batch1.toDF(), 5L, c)
    val hwmP = new org.apache.hadoop.fs.Path(
      s"${c.storeDir}/reports__hwm")
    val fs = hwmP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Hwm.write(fs, hwmP, 4L)
    // keep the last 2 committed batches (3, 4): batches 0-2 drop;
    // batch 5 is ABOVE the HWM and must survive for its replay
    val dropped = StreamingExpectations.prune(spark, c.storeDir, 2L)
    assert(dropped === 3L)
    val ids = spark.read.parquet(s"${c.storeDir}/reports")
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(3L, 4L, 5L))
    // history (committed view) covers exactly the retained window
    val hist = StreamingExpectations.history(spark, c)
      .select(col("batch_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(hist === Set(3L, 4L))
  }

  test("a batch id BELOW the committed HWM fails loudly (checkpoint " +
      "reset / wrong store binding), only == is the benign replay") {
    val c = cfg(Files.createTempDirectory("sexp_reset").toString)
    StreamingExpectations.processBatch(batch0.toDF(), 0L, c)
    StreamingExpectations.processBatch(batch1.toDF(), 1L, c)
    // == HWM: the one legitimate foreachBatch replay — silent no-op
    StreamingExpectations.processBatch(batch1.toDF(), 1L, c)
    // < HWM: ids restarted at 0 — silently skipping would drop every
    // new batch until ids pass the old HWM, so the store must refuse
    val ex = intercept[IllegalStateException] {
      StreamingExpectations.processBatch(batch0.toDF(), 0L, c)
    }
    assert(ex.getMessage.contains("below the committed HWM"))
  }

  test("referential rules are rejected at construction") {
    intercept[IllegalArgumentException] {
      StreamingExpectations.Config("x", "y",
        Seq(RefIntegrity("c", "fk", "p", "pk")))
    }
    ()
  }
}
