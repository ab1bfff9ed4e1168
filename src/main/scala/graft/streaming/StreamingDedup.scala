package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup

/** Streaming incremental dedup: every micro-batch of documents is
  * MinHash-signed, probed against the ACCUMULATED band index, its
  * candidate pairs appended to a pairs table, and its banded signatures
  * appended to the index — [[graft.operators.Dedup.lshCandidatesIncremental]]
  * run continuously. The stored corpus is only ever probed and
  * appended-to; no micro-batch re-pairs the existing corpus with itself.
  *
  * Index layout: the persisted index is the BAND RELATION
  * (sid, band, band_key) partitioned on `bucket` = hash(band_key) mod
  * [[Config.indexBuckets]]. A probe collects the batch's distinct buckets
  * (≤ indexBuckets values — metadata scale) and pushes `bucket IN (...)`
  * into the index read, so partition pruning keeps the per-batch scan
  * proportional to the BATCH's key footprint, not the corpus: without it
  * every micro-batch re-reads an index that grows with the corpus, which
  * at 100 TB is a full-index scan per batch. The pruning is
  * machine-checked by the flat-file-reads spec in `StreamingDedupSpec`.
  *
  * Replay semantics: foreachBatch is at-least-once — a replayed batch
  * would re-append its band rows. The pairs output is tagged with the
  * batch id, so downstream consumers dedupe replays by (batch_id, id_a,
  * id_b); for an exactly-once index use a transactional table format or
  * partition the index additionally by batch id and overwrite that
  * partition.
  */
object StreamingDedup {

  final case class Config(
      indexPath: String,
      pairsPath: String,
      checkpointDir: String,
      numHashes: Int = 16,
      bands: Int = 4,
      /** Band-key hash-partition count for the stored index. More buckets
        * = finer pruning per probe; keep `expected index files / buckets`
        * comfortably above 1 so appends don't degenerate into one tiny
        * file per bucket per batch (compact periodically regardless). */
      indexBuckets: Int = 64)

  /** Stable bucket of a band key, the index's partition column. */
  private[streaming] def bucketCol(buckets: Int) =
    pmod(xxhash64(col("band_key")), lit(buckets.toLong)).cast("int")

  /** The batch's banded signatures with their index bucket attached. */
  private[streaming] def bandedWithBucket(sigs: DataFrame,
                                          cfg: Config): DataFrame =
    Dedup.bandRelation(sigs, cfg.numHashes, cfg.bands)
      .withColumn("bucket", bucketCol(cfg.indexBuckets))

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

  /** Bucket-pruned probe: the batch's band rows against the stored index.
    * Output (id_a, id_b), a < b — NOT distinct (the caller unions and
    * dedupes). */
  private[streaming] def probeIndex(spark: SparkSession, cfg: Config,
                                    freshBand: DataFrame): DataFrame = {
    val buckets = freshBand.select(col("bucket")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val idx = spark.read.parquet(cfg.indexPath)
      .filter(col("bucket").isInCollection(buckets))
    freshBand.select(col("band"), col("band_key"), col("sid").as("id_f"))
      .join(idx.select(col("band"), col("band_key"), col("sid").as("id_e")),
        Seq("band", "band_key"))
      .select(least(col("id_f"), col("id_e")).as("id_a"),
              greatest(col("id_f"), col("id_e")).as("id_b"))
  }

  /** One micro-batch: sign → band → probe index → append pairs → append
    * banded index rows. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
                                      cfg: Config): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val fresh = Dedup.minhashSignatures(batch, cfg.numHashes)
    val freshBand = bandedWithBucket(fresh, cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // explicit existence check — a swallow-all Try would treat a CORRUPT
      // index as absent and silently emit wrong pairs; a real read error
      // must fail the batch (and be retried by the stream). recover()
      // first: a compaction that crashed mid-swap leaves the index
      // aside-renamed, and mistaking that for "no index yet" would
      // silently drop every cross-batch pair
      graft.sink.Compaction.recover(spark, cfg.indexPath)
      val indexFs = new org.apache.hadoop.fs.Path(cfg.indexPath)
      val exists = indexFs
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(indexFs)
      val within = freshBand
        .select(col("band"), col("band_key"), col("sid").as("id_a"))
        .join(freshBand
          .select(col("band"), col("band_key"), col("sid").as("id_b")),
          Seq("band", "band_key"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
      val pairs =
        (if (exists) within.union(probeIndex(spark, cfg, freshBand))
         else within).distinct()
      pairs.withColumn("batch_id", lit(batchId))
        .write.mode("append").parquet(cfg.pairsPath)
      freshBand.select(col("sid"), col("band"), col("band_key"),
          col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(cfg.indexPath)
    } finally { freshBand.unpersist(); () }
  }

  /** Reclaim the per-batch small files the append-only ingest accretes:
    * the generic [[graft.sink.Compaction]] pass, which preserves the
    * `bucket=` directory layout (the probe's pruning unit) while
    * rewriting each bucket's accumulated appends into full-size files.
    * Probe cost depends on FILES in the probed buckets, so without a
    * periodic fold it grows with batch count even though pruned rows
    * stay flat. Maintenance only — [[probeIndex]] is correct (just
    * slower) without it, and a crashed pass is healed by the
    * `recover()` call on the ingest/probe paths. */
  def compactIndex(spark: SparkSession, cfg: Config)
      : graft.sink.Compaction.CompactionResult =
    graft.sink.Compaction.compact(spark, cfg.indexPath)
}
