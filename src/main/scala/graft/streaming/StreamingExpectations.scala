package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.verify.Expectations

/** Continuous data-quality monitoring: the [[Expectations]] rule suite
  * evaluated per micro-batch, with the per-batch report persisted
  * EXACTLY-ONCE (batch_id-scoped dynamic overwrite + [[Hwm]] sidecar —
  * the [[StreamingDedup]] scheme), so violation counts over time are
  * replay-proof: a crashed batch rewrites its own report partition, a
  * committed one skips.
  *
  * Each batch costs ONE aggregate pass over the batch (all rules fold
  * into conditional sums, the [[Expectations.evaluate]] contract);
  * the persisted relation is rule-scale per batch, so the store grows
  * with batches, not rows. [[totals]] serves the accumulated per-rule
  * counts; [[history]] the per-batch trend (the data-quality dashboard
  * relation).
  *
  * Rules must be single-table (the stream IS the table); referential
  * rules need a static parent and belong in the batch engine.
  */
object StreamingExpectations {

  final case class Config(
      storeDir: String,
      checkpointDir: String,
      rules: Seq[Expectations.Rule]) {
    require(rules.nonEmpty, "at least one rule")
    require(!rules.exists(_.isInstanceOf[Expectations.RefIntegrity]),
      "referential rules need a static parent; use the batch engine")
  }

  private def reportsDir(cfg: Config) = new Path(cfg.storeDir, "reports")
  private def hwmPath(cfg: Config) =
    new Path(cfg.storeDir, "reports__hwm")

  private[streaming] def lastBatch(spark: SparkSession,
                                   cfg: Config): Long =
    Hwm.read(hwmPath(cfg)
      .getFileSystem(spark.sparkContext.hadoopConfiguration),
      hwmPath(cfg))

  def start(rows: DataFrame, cfg: Config): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, cfg)
      }
      .start()

  /** One micro-batch: evaluate every rule over the batch, persist the
    * rule-scale report under its batch_id. Exactly-once. */
  def processBatch(batch: DataFrame, batchId: Long,
                   cfg: Config): Unit = {
    val spark = batch.sparkSession
    if (!Hwm.replayGuard(batchId, lastBatch(spark, cfg),
        "streaming expectations")) return // committed replay: skip
    val fs = reportsDir(cfg)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // evaluateRelation: ONE aggregate pass for the whole suite even if
    // rule table names differ (they are id-only here — the batch IS
    // the relation)
    val report = Expectations
      .evaluateRelation(spark, batch, cfg.rules)
      .withColumn("batch_id", lit(batchId))
    report.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(reportsDir(cfg).toString)
    Hwm.write(fs, hwmPath(cfg), batchId)
  }

  /** Per-batch trend, committed batches only:
    * `(batch_id, rule_id, n_rows, n_violations, passed)`. Reading needs
    * no rule set — the store is self-describing — so ops surfaces (the
    * listener's /api/quality) read with just the path. */
  def readHistory(spark: SparkSession, storeDir: String): DataFrame = {
    val reports = new Path(storeDir, "reports")
    val hwm = new Path(storeDir, "reports__hwm")
    val fs = reports
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(reports))
      return spark.emptyDataFrame
        .select(lit(0L).as("batch_id"), lit("").as("rule_id"),
          lit(0L).as("n_rows"), lit(0L).as("n_violations"),
          lit(false).as("passed")).limit(0)
    spark.read.parquet(reports.toString)
      .filter(col("batch_id").cast("long") <= Hwm.read(fs, hwm))
      .select(col("batch_id").cast("long").as("batch_id"),
        col("rule_id"), col("n_rows"), col("n_violations"),
        col("passed"))
  }

  def history(spark: SparkSession, cfg: Config): DataFrame =
    readHistory(spark, cfg.storeDir)

  /** Graded view over the committed history: per-rule warn_if /
    * error_if budgets applied AT READ TIME. The store persists raw
    * counts only, so budgets can be tuned (or added after the fact)
    * without reprocessing a single batch — the monitor's write path and
    * its exactly-once contract don't change. Rules absent from `graded`
    * keep the strict (0, 0) gate; the budget relation is
    * rule-cardinality, so the join broadcasts at any scale. */
  def gradedHistory(spark: SparkSession, storeDir: String,
      graded: Seq[Expectations.Graded]): DataFrame = {
    import spark.implicits._
    // same duplicate-id discipline as the batch evaluator's counts():
    // a budgets file with two lines for one rule would otherwise fan
    // every matching history row out through the join, once per budget
    require(graded.map(_.rule.id).distinct.size == graded.size,
      "duplicate rule ids in graded budgets")
    val thresholds = graded
      .map(g => (g.rule.id, g.warnAbove, g.errorAbove))
      .toDF("rule_id", "warn_above", "error_above")
    readHistory(spark, storeDir)
      .join(broadcast(thresholds), Seq("rule_id"), "left_outer")
      .withColumn("warn_above", coalesce(col("warn_above"), lit(0L)))
      .withColumn("error_above", coalesce(col("error_above"), lit(0L)))
      .withColumn("severity", Expectations.severityCol(
        col("n_violations"), col("warn_above"), col("error_above")))
      .withColumn("passed", col("severity") =!= "error")
  }

  /** Highest committed batch id (−1 before the first commit) — one
    * sidecar read, no store scan; lets read surfaces bound their
    * window cheaply. */
  def lastCommitted(spark: SparkSession, storeDir: String): Long = {
    val hwm = new Path(storeDir, "reports__hwm")
    Hwm.read(hwm
      .getFileSystem(spark.sparkContext.hadoopConfiguration), hwm)
  }

  /** Accumulated per-rule counts across all committed batches. */
  def readTotals(spark: SparkSession, storeDir: String): DataFrame =
    readHistory(spark, storeDir)
      .groupBy(col("rule_id"))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_violations")).as("n_violations"),
        count(lit(1)).as("n_batches"))
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy(col("rule_id"))

  def totals(spark: SparkSession, cfg: Config): DataFrame =
    readTotals(spark, cfg.storeDir)

  /** Retention: drop report partitions older than the trailing
    * `keepLastBatches` committed batches. Safe by construction — only
    * partitions at or below the HWM are candidates (the stream never
    * replays a committed batch, so a deleted one is never rewritten),
    * and each partition is one atomic directory delete. Totals and
    * history thereafter describe the RETAINED window; the store stays
    * bounded for a monitor that runs forever. Returns the number of
    * batch partitions dropped. */
  def prune(spark: SparkSession, storeDir: String,
            keepLastBatches: Long): Long = {
    require(keepLastBatches >= 1, "keep at least one batch")
    val reports = new Path(storeDir, "reports")
    val fs = reports
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(reports)) return 0L
    val floor = lastCommitted(spark, storeDir) - keepLastBatches
    val dropped = fs.listStatus(reports).filter { st =>
      CommittedFold.batchIdOf(st.getPath.getName)
        .exists(id => id <= floor)
    }
    dropped.foreach(st => fs.delete(st.getPath, true))
    dropped.length.toLong
  }
}
