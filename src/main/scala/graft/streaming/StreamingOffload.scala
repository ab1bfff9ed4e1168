package graft.streaming

import org.apache.spark.sql.{DataFrame, ForeachWriter, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.meta.{MetadataStore, OffloadMetadata}

/** Streaming offload: the incremental HWM model as a continuous query.
  *
  * The reference's incremental offload is a BATCH loop over new partitions;
  * its streaming-native restatement is `readStream → foreachBatch(append +
  * HWM update)`: every micro-batch is one "offload chunk", the watermark is
  * the HWM, and the metadata store records progress exactly like the batch
  * path — so a consumer can switch between batch and streaming ingest
  * without changing the metadata contract.
  *
  * Scale: the sink appends partitioned parquet; each micro-batch writes only
  * its own files (no rewrite), and the per-batch metadata write is O(1).
  */
object StreamingOffload {

  final case class Config(
      sourceTable: String,
      finalPath: String,
      metadataDir: String,
      hwmColumn: String,
      partitionCols: Seq[String] = Nil,
      checkpointDir: String)

  /** Attach the offload sink to a streaming DataFrame. Caller starts/stops
    * the returned query. */
  def start(stream: DataFrame, cfg: Config): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, batchId, cfg)
      }
      .start()

  /** One micro-batch = one offload chunk, EXACTLY-ONCE via the batch
    * path's own crash-window protocol (`OffloadRunner`'s pending-chunk
    * marker): a fully-committed batch replays as a no-op (`snapshotId`
    * records the last committed batch id); a batch that crashed BETWEEN
    * the append and the metadata commit left the pending marker, so the
    * rerun reconciles against the final table — the append landed iff
    * the table's max HWM already covers the batch's — and only then
    * skips the re-append that would have duplicated the slice. */
  private[streaming] def writeBatch(batch: DataFrame, batchId: Long,
                                    cfg: Config): Unit = {
    if (batch.isEmpty) return
    val previous = MetadataStore.load(cfg.metadataDir, cfg.sourceTable)
    // committed replay: the recorded snapshot already covers this batch
    if (previous.flatMap(_.snapshotId).exists(_ >= batchId)) return

    val spark = batch.sparkSession
    val newMaxS = String.valueOf(
      batch.agg(max(col(cfg.hwmColumn))).head().get(0))
    // rendered HWMs compare lexicographically; valid for the fixed-width
    // timestamp rendering used on event-time columns (the streaming HWM
    // case) — a replayed old batch therefore never regresses the HWM
    val prevHwm = previous.map(_.incrementalHighValue).getOrElse(Nil)

    // mid-crash replay: this batch's marker is set — the append may or
    // may not have landed; it landed iff the final table already holds
    // rows at (or beyond) this batch's max HWM value
    val markerSet = previous.exists(p =>
      p.pendingChunkKeys == Seq(cfg.hwmColumn) &&
        p.pendingChunkHwm == Seq(batchId.toString))
    val landed = markerSet && {
      val fs = new org.apache.hadoop.fs.Path(cfg.finalPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(new org.apache.hadoop.fs.Path(cfg.finalPath)) && {
        val m = spark.read.parquet(cfg.finalPath)
          .agg(max(col(cfg.hwmColumn))).head().get(0)
        m != null && String.valueOf(m) >= newMaxS
      }
    }
    if (!landed) {
      // pending marker BEFORE the append — the crash-window breadcrumb
      MetadataStore.save(cfg.metadataDir, OffloadMetadata(
        sourceTable = cfg.sourceTable,
        backendTable = cfg.finalPath,
        offloadType = "INCREMENTAL",
        incrementalKey = Seq(cfg.hwmColumn),
        incrementalHighValue = prevHwm,
        snapshotId = previous.flatMap(_.snapshotId),
        pendingChunkKeys = Seq(cfg.hwmColumn),
        pendingChunkHwm = Seq(batchId.toString)))
      val writer = batch.write.mode("append")
      (if (cfg.partitionCols.nonEmpty) writer.partitionBy(cfg.partitionCols: _*)
       else writer).parquet(cfg.finalPath)
    }
    val advanced =
      if (prevHwm.isEmpty || prevHwm.head < newMaxS) Seq(newMaxS)
      else prevHwm
    // commit: HWM + snapshot advance and the pending marker clears, in
    // one atomic metadata save
    MetadataStore.save(cfg.metadataDir, OffloadMetadata(
      sourceTable = cfg.sourceTable,
      backendTable = cfg.finalPath,
      offloadType = "INCREMENTAL",
      incrementalKey = Seq(cfg.hwmColumn),
      incrementalHighValue = advanced,
      snapshotId = Some(batchId)))
  }
}
