package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series maintenance operators: the bounded day relation a
  * monitoring pass reads (daily totals in exact e2 integers) and the
  * trailing-median anomaly flags computed from it (q193's definition).
  *
  * Scale shape: the day relation is an aggregate — days, not rows — so
  * every downstream join/window here is metadata-scale; the only
  * O(input) work is the first groupBy. The relation is also sum-MERGEABLE
  * ((day, rev_e2, n_rows) merges by addition), which is what
  * [[graft.streaming.StreamingDayStats]] maintains incrementally.
  */
object TimeSeries {

  /** Daily totals in exact cents: (day, rev_e2, n_rows). */
  def dailyTotals(df: DataFrame, tsCol: String = "o_orderdate",
                  amountCol: String = "o_totalprice"): DataFrame =
    df.select(to_date(col(tsCol)).as("day"),
        (col(amountCol).cast("decimal(12,2)") * lit(100))
          .cast("long").as("cents"))
      .groupBy(col("day"))
      .agg(sum(col("cents")).as("rev_e2"), count(lit(1)).as("n_rows"))

  /** Merge two day relations by addition (the streaming combine). */
  def mergeDaily(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("day"))
      .agg(sum(col("rev_e2")).as("rev_e2"), sum(col("n_rows")).as("n_rows"))

  /** Anomaly flags vs the exact LOWER MEDIAN of the trailing 7 calendar
    * days, with integral fences (highX× above, 1/lowDiv below) — no
    * float division decides membership. Days with fewer than
    * `minTrailing` trailing observations are not judged. */
  def anomalyFlags(day: DataFrame, highX: Long = 3L, lowDiv: Long = 8L,
                   minTrailing: Int = 4): DataFrame = {
    val tr = day.select(col("day"), col("rev_e2")).join(
      day.select(col("day").as("d2"), col("rev_e2").as("r2")),
      col("d2") >= date_sub(col("day"), 7) && col("d2") < col("day"))
    val w = Window.partitionBy(col("day")).orderBy(col("r2"), col("d2"))
    val wc = Window.partitionBy(col("day"))
    tr.withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(wc))
      .filter(col("cnt") >= minTrailing &&
        col("rn") === expr("(cnt + 1) div 2"))
      .select(col("day"), col("rev_e2"), col("r2").as("med_e2"))
      .filter(col("rev_e2") > col("med_e2") * highX ||
        col("rev_e2") * lowDiv < col("med_e2"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        (col("rev_e2") / lit(100)).cast("double").as("revenue"),
        (col("med_e2") / lit(100)).cast("double").as("trailing_median"),
        when(col("rev_e2") > col("med_e2") * highX, lit("high"))
          .otherwise(lit("low")).as("direction"))
  }
}
