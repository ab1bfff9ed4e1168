package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** Continuous corpus ingestion: every micro-batch of raw documents runs
  * the [[graft.operators.TextAnalysis.curate]] filter chain (quality
  * floor, repetition ceiling, within-batch exact-dup canonicalisation),
  * is then probed against the ACCUMULATED content-hash index so documents
  * already ingested in EARLIER batches drop as `seen_exact`, and finally
  * lands as kept rows (appended to the corpus), rejected rows with their
  * first-failure reason (appended to the quarantine), and fresh content
  * hashes (appended to the index). The exact-dedup complement of
  * [[StreamingDedup]]'s near-dup stream — together they are the
  * continuously-fed version of the batch curation pipeline (q61/q100).
  *
  * Index layout: same scheme as [[StreamingDedup]] — the hash index is
  * parquet partitioned on `bucket = hash(exact_key) mod indexBuckets`;
  * each probe collects the batch's distinct buckets (≤ indexBuckets
  * values, metadata-scale) and pushes `bucket IN (...)` into the read, so
  * the per-batch scan is the batch's key footprint, not the corpus.
  *
  * Replay semantics: EXACTLY-ONCE BY CONSTRUCTION (the
  * [[StreamingDedup]]/[[StreamingTextIndex]] scheme): all three outputs
  * are partitioned by `batch_id` and written with batch-scoped DYNAMIC
  * partition overwrite, a sibling HWM file skips fully-committed
  * replays, and the seen-probe excludes the replaying batch's OWN
  * stored hashes — without that exclusion a mid-crash rerun would mark
  * its docs `seen_exact` and overwrite its corpus partition with
  * nothing, silently losing the batch.
  */
object StreamingCuration {

  final case class Config(
      corpusPath: String,
      rejectPath: String,
      keyIndexPath: String,
      checkpointDir: String,
      minQuality: Double = 0.3,
      maxDupFrac: Double = 0.5,
      indexBuckets: Int = 64)

  private def bucketCol(buckets: Int) =
    pmod(xxhash64(col("exact_key")), lit(buckets.toLong)).cast("int")

  /** Attach the curation sink to a streaming DataFrame of documents
    * (doc_id, text). Caller starts/stops the returned query. */
  def start(docs: DataFrame, cfg: Config): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, cfg)
      }
      .start()

  private def hwmPath(cfg: Config) =
    new org.apache.hadoop.fs.Path(cfg.keyIndexPath + "__hwm")

  private[streaming] def lastBatch(spark: SparkSession,
                                   cfg: Config): Long =
    Hwm.read(hwmPath(cfg)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), hwmPath(cfg))

  /** One micro-batch: curate → bucket-pruned seen-probe → three
    * batch-scoped writes. Exposed for batch-equivalence specs. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
                                      cfg: Config): Unit = {
    val spark = batch.sparkSession
    if (!Hwm.replayGuard(batchId, lastBatch(spark, cfg),
        "streaming curation")) return // committed replay: skip
    // one-time upgrade of pre-batch_id layouts (mixed-depth leaves wedge
    // partition discovery)
    val lfs = new org.apache.hadoop.fs.Path(cfg.keyIndexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    LegacyLayout.fold(lfs,
      new org.apache.hadoop.fs.Path(cfg.keyIndexPath))
    // corpus/quarantine legacy files carry batch_id as a DATA column —
    // they rewrite once instead of renaming (column/partition collision)
    Seq(cfg.corpusPath, cfg.rejectPath).foreach(pth =>
      LegacyLayout.rewriteFold(spark, new org.apache.hadoop.fs.Path(pth)))
    val verdicts = TextAnalysis.curate(batch, cfg.minQuality, cfg.maxDupFrac)
    val keyed = batch
      .withColumn("exact_key", TextAnalysis.exactKey(col("text")))
      .withColumn("bucket", bucketCol(cfg.indexBuckets))
      .join(verdicts, Seq("doc_id"))
      .persist()
    try {
      val seen: DataFrame =
        if (indexExists(spark, cfg.keyIndexPath)) {
          val buckets = keyed.select(col("bucket")).distinct()
            .collect().map(_.getInt(0)).toSeq
          // exclude the replaying batch's own partitions: a mid-crash
          // rerun must not see its first attempt's hashes as "seen"
          val idx0 = spark.read.parquet(cfg.keyIndexPath)
            .filter(col("bucket").isInCollection(buckets))
          val idx =
            if (idx0.columns.contains("batch_id"))
              idx0.filter(col("batch_id").cast("long") =!= batchId)
            else idx0
          idx.select(col("exact_key")).distinct()
        } else spark.emptyDataFrame.select(lit("").as("exact_key")).limit(0)
      val probed = keyed.join(broadcastSafe(seen), Seq("exact_key"),
        "left_outer")
      val kept = probed
        .filter(col("keep") && col("seen_flag").isNull)
        .select(col("doc_id"), col("text"), col("exact_key"),
          col("bucket"), lit(batchId).as("batch_id"))
      val rejected = probed
        .filter(!col("keep") || col("seen_flag").isNotNull)
        .select(col("doc_id"),
          coalesce(col("drop_reason"), lit("seen_exact")).as("drop_reason"),
          lit(batchId).as("batch_id"))
      kept.drop("bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(cfg.corpusPath)
      rejected.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(cfg.rejectPath)
      kept.select(col("exact_key"), col("bucket"),
          lit(batchId).as("batch_id")).distinct()
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "bucket")
        .parquet(cfg.keyIndexPath)
      Hwm.write(hwmPath(cfg)
        .getFileSystem(spark.sparkContext.hadoopConfiguration),
        hwmPath(cfg), batchId)
    } finally keyed.unpersist()
  }

  /** The seen relation with a non-null marker column (a left join against
    * it yields `seen_flag IS NOT NULL` for already-ingested keys). The
    * seen set for ONE batch's buckets is bounded by the index slice read,
    * not the corpus; it still flows through a hash join (not a broadcast)
    * because a hot bucket's key set is unbounded in principle. */
  private def broadcastSafe(seen: DataFrame): DataFrame =
    seen.withColumn("seen_flag", lit(1))

  private def indexExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }
}
