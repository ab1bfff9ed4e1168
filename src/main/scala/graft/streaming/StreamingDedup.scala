package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Dedup

/** Streaming incremental dedup: every micro-batch of documents is
  * MinHash-signed, probed against the ACCUMULATED signature index, its
  * candidate pairs appended to a pairs table, and its signatures appended
  * to the index — [[graft.operators.Dedup.lshCandidatesIncremental]] run
  * continuously. The stored corpus is only ever probed and appended-to;
  * no micro-batch re-pairs the existing corpus with itself, so per-batch
  * cost tracks the BATCH size, not the corpus size.
  *
  * Replay semantics: foreachBatch is at-least-once — a replayed batch
  * would re-append its signatures. The pairs output is tagged with the
  * batch id, so downstream consumers dedupe replays by (batch_id, id_a,
  * id_b); for an exactly-once index use a transactional table format or
  * partition the index by batch id and overwrite that partition.
  */
object StreamingDedup {

  final case class Config(
      indexPath: String,
      pairsPath: String,
      checkpointDir: String,
      numHashes: Int = 16,
      bands: Int = 4)

  /** Attach the dedup sink to a streaming DataFrame of documents
    * (doc_id, text). Caller starts/stops the returned query. */
  def start(docs: DataFrame, cfg: Config): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, cfg)
      }
      .start()

  /** One micro-batch: sign → probe index → append pairs → append index. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
                                      cfg: Config): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val fresh = Dedup.minhashSignatures(batch, cfg.numHashes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // explicit existence check — a swallow-all Try would treat a CORRUPT
    // index as absent and silently emit wrong pairs; a real read error
    // must fail the batch (and be retried by the stream)
    val indexFs = new org.apache.hadoop.fs.Path(cfg.indexPath)
    val exists = indexFs.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(indexFs)
    val existing =
      if (exists) Some(spark.read.parquet(cfg.indexPath)) else None
    val pairs = existing match {
      case Some(idx) =>
        Dedup.lshCandidatesIncremental(idx, fresh, cfg.numHashes, cfg.bands)
      case None =>
        Dedup.lshCandidates(fresh, cfg.numHashes, cfg.bands)
    }
    pairs.withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(cfg.pairsPath)
    fresh.write.mode("append").parquet(cfg.indexPath)
    fresh.unpersist()
  }
}
