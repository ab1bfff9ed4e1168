package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IvfIndex

/** Streaming IVF ingest: every micro-batch of embeddings is assigned to
  * its cell with the PERSISTED model and appended to the cell-partitioned
  * index store — [[IvfIndex.appendIndex]] run continuously. The model
  * loads once at stream start (centroids are fixed at train time; a
  * deployment retrains out-of-band and swaps `modelPath`), so the
  * steady-state cost per batch is one assignment pass plus the appended
  * files — the existing index is never read, rewritten, or rebuilt, and
  * probes see new vectors as soon as their batch commits.
  *
  * This is the ANN ingest analogue of [[StreamingDedup]]: same
  * append-only store discipline, same pruning story (the cell directory
  * is the partition unit probes prune on), same at-least-once caveat — a
  * replayed batch re-appends its rows, so downstream consumers dedupe by
  * vector id or the store uses a transactional table format.
  */
object StreamingIvf {

  final case class Config(
      indexPath: String,
      checkpointDir: String,
      modelPath: String,
      dim: Int,
      vecCol: String = "embedding")

  /** Attach the ingest sink to a streaming DataFrame of embeddings
    * (id, vector). Caller starts/stops the returned query. */
  def start(embeddings: DataFrame, cfg: Config): StreamingQuery = {
    val model = IvfIndex.loadModel(embeddings.sparkSession, cfg.modelPath)
    embeddings.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, model, cfg)
      }
      .start()
  }

  /** One micro-batch: assign with the pinned model, append to the store. */
  private[streaming] def processBatch(batch: DataFrame,
                                      model: IvfIndex.Model,
                                      cfg: Config): Unit = {
    if (batch.isEmpty) return
    IvfIndex.appendIndex(batch, model, cfg.dim, cfg.indexPath, cfg.vecCol)
  }
}
