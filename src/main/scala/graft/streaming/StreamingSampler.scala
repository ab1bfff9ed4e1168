package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Continuous deterministic SYSTEMATIC sampling proportional to size —
  * the streaming face of q322: a document is picked exactly when its
  * char mass crosses a multiple of the stride, measured on the
  * per-source RUNNING cumulative across all batches so far. No RNG
  * anywhere: given the same arrival order, the streamed pick set is
  * bit-identical to the batch operator run over the concatenated
  * stream (the spec pins streamed ≡ batch), which is what makes a
  * continuously-fed training-mixture sample auditable.
  *
  * State is ONE tiny relation: the per-(source, batch) char-mass
  * deltas, partitioned by `batch_id` — the offset a batch starts from
  * is the sum of all OTHER batches' deltas below it, so state never
  * rewrites, only appends. Picks land partitioned by `batch_id` too.
  *
  * Replay semantics: EXACTLY-ONCE BY CONSTRUCTION (the
  * [[StreamingCuration]] scheme): both outputs are written with
  * batch-scoped dynamic partition overwrite, a sibling HWM file skips
  * fully-committed replays, and the offset read EXCLUDES the replaying
  * batch's own delta partition — a mid-crash rerun therefore starts
  * from the same offset as the first attempt and deterministically
  * overwrites its own partitions with identical rows.
  */
object StreamingSampler {

  final case class Config(
      picksPath: String,
      massPath: String,
      checkpointDir: String,
      strideChars: Long = 2000L)

  def start(docs: DataFrame, cfg: Config): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, cfg)
      }
      .start()

  private def hwmPath(cfg: Config) = new Path(cfg.massPath + "__hwm")

  private[streaming] def lastBatch(
      spark: org.apache.spark.sql.SparkSession, cfg: Config): Long =
    Hwm.read(hwmPath(cfg)
      .getFileSystem(spark.sparkContext.hadoopConfiguration),
      hwmPath(cfg))

  private def massExists(spark: org.apache.spark.sql.SparkSession,
      cfg: Config): Boolean =
    new Path(cfg.massPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new Path(cfg.massPath))

  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
                                      cfg: Config): Unit = {
    val spark = batch.sparkSession
    if (!Hwm.replayGuard(batchId, lastBatch(spark, cfg),
        "streaming sampler")) return // committed replay: skip
    import org.apache.spark.sql.expressions.Window
    val b = batch.select(col("source"), col("doc_id"), col("n_chars"))
    // offsets = everyone ELSE's deltas (self-exclusion: a mid-crash
    // rerun must start where its first attempt started)
    val offsets: DataFrame =
      if (massExists(spark, cfg))
        spark.read.parquet(cfg.massPath)
          .filter(col("batch_id").cast("long") =!= batchId)
          .groupBy(col("source"))
          .agg(sum(col("mass")).as("off"))
      else spark.emptyDataFrame
        .select(lit("").as("source"), lit(0L).as("off")).limit(0)
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stride = cfg.strideChars
    val picks = b
      .withColumn("cum_in", sum(col("n_chars")).over(w))
      .join(broadcast(offsets), Seq("source"), "left_outer")
      .withColumn("cum", col("cum_in") + coalesce(col("off"), lit(0L)))
      .filter(expr(s"cum div $stride > (cum - n_chars) div $stride"))
      .select(col("source"), col("doc_id"), col("n_chars"),
        lit(batchId).as("batch_id"))
    picks.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(cfg.picksPath)
    b.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("mass"))
      .select(col("source"), col("mass"), lit(batchId).as("batch_id"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(cfg.massPath)
    Hwm.write(hwmPath(cfg)
      .getFileSystem(spark.sparkContext.hadoopConfiguration),
      hwmPath(cfg), batchId)
  }

  /** Every pick so far (empty when nothing has arrived). */
  def picks(spark: org.apache.spark.sql.SparkSession,
            cfg: Config): DataFrame = {
    val fs = new Path(cfg.picksPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(cfg.picksPath)))
      spark.read.parquet(cfg.picksPath)
    else spark.emptyDataFrame
      .select(lit("").as("source"), lit(0L).as("doc_id"),
        lit(0L).as("n_chars"), lit(0L).as("batch_id"))
      .limit(0)
  }

  /** The per-source running char mass (the sampler's whole state). */
  def offsets(spark: org.apache.spark.sql.SparkSession,
              cfg: Config): DataFrame = {
    if (massExists(spark, cfg))
      spark.read.parquet(cfg.massPath)
        .groupBy(col("source")).agg(sum(col("mass")).as("mass"))
    else spark.emptyDataFrame
      .select(lit("").as("source"), lit(0L).as("mass")).limit(0)
  }
}
