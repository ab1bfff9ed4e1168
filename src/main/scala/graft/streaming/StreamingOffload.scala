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

  /** One micro-batch = one offload chunk: append the slice, then advance the
    * HWM metadata (idempotent per batch id — a replayed batch rewrites the
    * same HWM, not a regressed one). */
  private[streaming] def writeBatch(batch: DataFrame, batchId: Long,
                                    cfg: Config): Unit = {
    if (!batch.isEmpty) {
      val writer = batch.write.mode("append")
      (if (cfg.partitionCols.nonEmpty) writer.partitionBy(cfg.partitionCols: _*)
       else writer).parquet(cfg.finalPath)

      val newMax = batch.agg(max(col(cfg.hwmColumn))).head().get(0)
      val previous = MetadataStore.load(cfg.metadataDir, cfg.sourceTable)
      val prevHwm = previous.map(_.incrementalHighValue).getOrElse(Nil)
      // rendered HWMs compare lexicographically; valid for the fixed-width
      // timestamp rendering used on event-time columns (the streaming HWM
      // case) — a replayed old batch therefore never regresses the HWM
      val advanced =
        if (prevHwm.isEmpty || prevHwm.head < String.valueOf(newMax))
          Seq(String.valueOf(newMax))
        else prevHwm
      MetadataStore.save(cfg.metadataDir, OffloadMetadata(
        sourceTable = cfg.sourceTable,
        backendTable = cfg.finalPath,
        offloadType = "INCREMENTAL",
        incrementalKey = Seq(cfg.hwmColumn),
        incrementalHighValue = advanced,
        snapshotId = Some(batchId)))
    }
  }
}
