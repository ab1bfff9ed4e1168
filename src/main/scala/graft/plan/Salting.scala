package graft.plan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * When one group key carries a disproportionate share of rows (hot
  * customer, hot shingle), a single reducer becomes the stage's straggler.
  * Salting splits each key into `saltBuckets` sub-keys for a partial
  * aggregate, then combines the partials — two shuffles, but each is
  * balanced. AQE's skew-join handling covers joins; this covers
  * aggregations, where AQE cannot split a group.
  *
  * Only algebraic aggregates compose this way; the helpers cover the
  * engine's validation set (count/sum/min/max — SURVEY §2.4).
  */
object Salting {

  /** Salted two-phase aggregation: count/sum/min/max over `valueCols`,
    * grouped by `keyCols`. Results are identical to the direct
    * `groupBy().agg()` (sums ride exact types; min/max/count are
    * order-insensitive). */
  def saltedAgg(df: DataFrame, keyCols: Seq[String],
                sumCols: Seq[String] = Nil,
                minMaxCols: Seq[String] = Nil,
                saltBuckets: Int = 16): DataFrame = {
    require(keyCols.nonEmpty && saltBuckets > 1)
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(saltBuckets.toLong)))

    val phase1Aggs: Seq[Column] =
      count(lit(1)).as("__cnt") +:
      (sumCols.map(c => sum(col(c)).as(s"__sum_$c")) ++
       minMaxCols.flatMap(c => Seq(
         min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)

    val phase2Aggs: Seq[Column] =
      sum(col("__cnt")).as("n") +:
      (sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")) ++
       minMaxCols.flatMap(c => Seq(
         min(col(s"__min_$c")).as(s"min_$c"),
         max(col(s"__max_$c")).as(s"max_$c"))))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }
}
