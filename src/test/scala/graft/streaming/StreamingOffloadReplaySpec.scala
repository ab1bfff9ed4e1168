package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.meta.{MetadataStore, OffloadMetadata}

/** Exactly-once replay protocol of the streaming offload sink: committed
  * batch ids skip via the recorded snapshot; a batch that crashed
  * between the final-table append and the metadata commit left the
  * pending-chunk marker, and the rerun reconciles against the final
  * table instead of blindly re-appending (the batch path's own
  * crash-window protocol, `OffloadRunner`). */
class StreamingOffloadReplaySpec extends SparkSpec {
  import spark.implicits._

  test("committed ids skip; a mid-crash rerun reconciles via the " +
      "pending marker — no duplicated and no lost batch") {
    val base = Files.createTempDirectory("graft_so_replay").toString
    val cfg = StreamingOffload.Config("t", s"$base/final", s"$base/meta",
      "ts", Nil, s"$base/ckpt")
    def batchAt(h: Int): DataFrame =
      Seq((1L, s"2024-01-01 0$h:00:00")).toDF("id", "ts_s")
        .select(col("id"), col("ts_s").cast("timestamp").as("ts"))
    StreamingOffload.writeBatch(batchAt(1), 0L, cfg)
    StreamingOffload.writeBatch(batchAt(2), 1L, cfg)
    def finalCount() = spark.read.parquet(s"$base/final").count()
    assert(finalCount() === 2L)

    // committed replay: snapshotId covers batch 1 — skipped outright
    StreamingOffload.writeBatch(batchAt(2), 1L, cfg)
    assert(finalCount() === 2L)

    // mid-crash replay, append LANDED: restore the pre-commit metadata
    // (marker records pre=1 row, batch=1 row; the table already holds
    // pre+batch = 2) — the rerun must NOT duplicate the slice, only
    // commit the metadata
    MetadataStore.save(s"$base/meta", OffloadMetadata(
      sourceTable = "t", backendTable = s"$base/final",
      offloadType = "INCREMENTAL", incrementalKey = Seq("ts"),
      incrementalHighValue = Seq("2024-01-01 01:00:00.0"),
      snapshotId = Some(0L),
      pendingChunkKeys = Seq("ts"),
      pendingChunkHwm = Seq("1", "1", "1")))
    StreamingOffload.writeBatch(batchAt(2), 1L, cfg)
    assert(finalCount() === 2L, "mid-crash replay duplicated the batch")
    val meta = MetadataStore.load(s"$base/meta", "t").get
    assert(meta.snapshotId.contains(1L) && meta.pendingChunkHwm.isEmpty)

    // mid-crash replay, append LOST: marker present but the table still
    // holds only the pre-append count — the rerun appends (no lost batch)
    MetadataStore.save(s"$base/meta",
      MetadataStore.load(s"$base/meta", "t").get.copy(
        snapshotId = Some(1L),
        pendingChunkKeys = Seq("ts"),
        pendingChunkHwm = Seq("2", "2", "1")))
    StreamingOffload.writeBatch(batchAt(3), 2L, cfg)
    assert(finalCount() === 3L, "marker-only replay lost the batch")
    assert(MetadataStore.load(s"$base/meta", "t").get
      .incrementalHighValue.head.startsWith("2024-01-01 03"))

    // a LEGACY (pre-upgrade) single-element marker — batch id only, no
    // row accounting — reconciles with the old max-HWM heuristic: the
    // landed batch 2 must NOT be re-appended after the code upgrade
    MetadataStore.save(s"$base/meta",
      MetadataStore.load(s"$base/meta", "t").get.copy(
        snapshotId = Some(1L),
        incrementalHighValue = Seq("2024-01-01 02:00:00.0"),
        pendingChunkKeys = Seq("ts"), pendingChunkHwm = Seq("2")))
    StreamingOffload.writeBatch(batchAt(3), 2L, cfg)
    assert(finalCount() === 3L, "legacy marker replay duplicated the batch")
    assert(MetadataStore.load(s"$base/meta", "t").get
      .snapshotId.contains(2L))

    // a PARTIAL append (table row count matches neither pre nor
    // pre+batch) fails loudly instead of silently losing or duplicating
    MetadataStore.save(s"$base/meta",
      MetadataStore.load(s"$base/meta", "t").get.copy(
        snapshotId = Some(2L),
        pendingChunkKeys = Seq("ts"),
        pendingChunkHwm = Seq("3", "1", "1")))
    val e = intercept[IllegalStateException] {
      StreamingOffload.writeBatch(batchAt(4), 3L, cfg)
    }
    assert(e.getMessage.contains("partial append"))
    assert(finalCount() === 3L)
  }

  test("a checkpoint reset (batch ids restarting below the committed " +
      "snapshot) fails loudly instead of silently no-op'ing every batch") {
    val base = Files.createTempDirectory("graft_so_reset").toString
    val cfg = StreamingOffload.Config("t", s"$base/final", s"$base/meta",
      "ts", Nil, s"$base/ckpt")
    def batchAt(h: Int): DataFrame =
      Seq((1L, s"2024-01-01 0$h:00:00")).toDF("id", "ts_s")
        .select(col("id"), col("ts_s").cast("timestamp").as("ts"))
    StreamingOffload.writeBatch(batchAt(1), 0L, cfg)
    StreamingOffload.writeBatch(batchAt(2), 1L, cfg)
    StreamingOffload.writeBatch(batchAt(3), 2L, cfg)
    // the operator wipes the checkpoint; the new stream's batch 0 would
    // previously skip forever (0 <= snapshot 2), dropping all new data
    val e = intercept[IllegalStateException] {
      StreamingOffload.writeBatch(batchAt(4), 0L, cfg)
    }
    assert(e.getMessage.contains("checkpoint was reset") ||
      e.getMessage.contains("below the committed snapshot"))
    // nothing was silently dropped OR appended
    assert(spark.read.parquet(s"$base/final").count() === 3L)
    // an exact replay of the last committed batch still skips benignly
    StreamingOffload.writeBatch(batchAt(3), 2L, cfg)
    assert(spark.read.parquet(s"$base/final").count() === 3L)
  }
}
