package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface for the `events` stream.
  *
  * The reference is batch-only with incremental HWMs (SURVEY §2.7); the
  * streaming extension maps that incremental model onto Structured Streaming:
  * watermark = the HWM, tumbling/sliding/session windows = the synthetic
  * partition keys, `dropDuplicates` within the watermark = staged-load
  * idempotence.
  *
  * Every transform here takes a DataFrame and works identically on a batch
  * frame (tests + DuckDB oracle) and a `readStream` frame (true streaming) —
  * the Structured Streaming contract that batch and stream share one API.
  * Streaming-only bits (watermark, trigger, output mode) live in the
  * `stream*` wrappers.
  */
object Events {

  /** Tumbling-window aggregate. Batch + streaming. Exact money arithmetic via
    * decimal cast (cross-engine deterministic). */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Sliding-window event rate. */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Batch sessionization: 30-min-gap sessions per user via the classic
    * lag/flag/cumsum window program — the batch mirror of
    * `session_window` (which needs a streaming query). */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val newSession =
      when(col("ts").cast("long") -
             lag(col("ts"), 1).over(byUser).cast("long") >
             gapMinutes * 60L, 1L)
        .otherwise(lit(0L))
    events
      .withColumn("new_s", coalesce(newSession, lit(0L)))
      .withColumn("session_idx",
        sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
  }

  /** Exactly-once style dedup on event_id (batch mirror of
    * `dropDuplicates` within watermark). */
  def dedupEvents(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  // ------------------------------------------------------ streaming wrappers

  /** Streaming tumbling aggregate with watermark — append-mode capable. */
  def streamTumbling(stream: DataFrame, width: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    tumblingCounts(stream.withWatermark("ts", watermark), width)

  /** Streaming sessionization via native `session_window`. */
  def streamSessions(stream: DataFrame, gap: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
              col("w.end").as("session_end"), col("n_events"))

  /** Streaming dedup within the watermark. */
  def streamDedup(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
