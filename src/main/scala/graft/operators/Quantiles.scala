package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles WITHOUT a global sort — the
  * percentile-report primitive (data cards, SLO reports, outlier fences)
  * at corpus scale.
  *
  * `approx_percentile` trades accuracy for one pass; a global
  * `ROW_NUMBER` window sorts the corpus through a single task. This
  * operator gets exactness AND scale with the classic two-phase
  * selection:
  *
  *  1. histogram on `v div bucketWidth` — one partial-agg shuffle; the
  *     relation is bounded by value-range / bucketWidth, not by rows;
  *  2. running offsets over that BOUNDED bucket relation (the q81
  *     bucketed-prefix-sum scheme — `ExplainAudit.bounded` verifies the
  *     unpartitioned window's input is an aggregate);
  *  3. each target rank `ceil(p·n/100)` resolves to its owning bucket
  *     (bounded × tiny range join);
  *  4. only the owning buckets' rows are ranked, each within its own
  *     window partition — the only data-sized sort touches n/buckets
  *     rows, never the corpus.
  *
  * Residual hazard at 100 TB: a single value dominating the column puts
  * its whole bucket in one partition at step 4 — the remedy is a finer
  * `bucketWidth` (a bucket that is one value wide costs one
  * `count`-sized partition, since rank-within = any row of it).
  *
  * Quantile definition: value at ascending rank `ceil(p/100 · n)`
  * (1-based, "type 1" / discrete) — an element of the data, deterministic
  * under ties, and exactly what the DuckDB oracle's rank window pins.
  *
  * Reference surface: the reference's stats machinery samples or
  * delegates percentiles to the backend (`TableStats` mirrors its
  * approx profile, q71); the exact path is an LLM-pipeline extension
  * (SURVEY §2 north star).
  */
object Quantiles {

  private def targetRank(n: Column, pct: Column): Column =
    expr("(n * pct + 99) div 100")

  /** Exact values at the requested integer percentiles of `valueCol`
    * (long-valued). Output: one `(pct, value)` row per percentile. */
  def exactQuantiles(df: DataFrame, valueCol: String, pcts: Seq[Int],
                     bucketWidth: Long): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val v = df.select(col(valueCol).cast("long").as("v"))
      .withColumn("b", expr(s"v div ${bucketWidth}L"))
    // bounded: one row per occupied bucket
    val wOff = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = v.groupBy(col("b")).agg(count(lit(1)).as("bn"))
      .withColumn("cum", sum(col("bn")).over(wOff))
      .withColumn("cum_prev", col("cum") - col("bn"))
    val targets = v.agg(count(lit(1)).as("n"))
      .select(col("n"),
        explode(array(pcts.map(lit(_)): _*)).as("pct"))
      .withColumn("target", targetRank(col("n"), col("pct")))
    // bounded × |pcts| range join: which bucket owns each target rank
    val owner = targets.join(offs,
        col("target") > col("cum_prev") && col("target") <= col("cum"))
      .select(col("pct"), col("target"), col("b"), col("cum_prev"))
    // rank only WITHIN the owning buckets — n/buckets rows per partition
    val wIn = Window.partitionBy(col("pct")).orderBy(col("v"))
    v.join(broadcast(owner), Seq("b"))
      .withColumn("rn", row_number().over(wIn))
      .filter(col("rn") === col("target") - col("cum_prev"))
      .select(col("pct"), col("v").as("value"))
  }

  /** Exact WEIGHTED percentiles: the smallest value whose cumulative
    * weight reaches `ceil(p/100 · W)` (W = total weight) — e.g. the doc
    * length below which p% of the corpus's TOKENS lie, the number a
    * truncation/packing policy actually needs (doc-count percentiles
    * over-weight short docs).
    *
    * Same two-phase selection as [[exactQuantiles]] with weight sums in
    * place of counts, plus one strengthening: the within-bucket phase
    * first aggregates per VALUE, so the only window runs over ≤
    * `bucketWidth` rows per percentile — bounded by construction, and
    * tie-handling is definitionally exact (cumulative weight of all rows
    * with value ≤ v, no per-row order ambiguity). Weights must be ≥ 0;
    * zero-weight values are never selected (their weight span is empty).
    */
  def exactWeightedQuantiles(df: DataFrame, valueCol: String,
                             weightCol: String, pcts: Seq[Int],
                             bucketWidth: Long): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val v = df.select(col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w"))
      .withColumn("b", expr(s"v div ${bucketWidth}L"))
    val wOff = Window.orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = v.groupBy(col("b")).agg(sum(col("w")).as("bw"))
      .withColumn("cum", sum(col("bw")).over(wOff))
      .withColumn("cum_prev", col("cum") - col("bw"))
    val targets = v.agg(sum(col("w")).as("n"))
      .select(col("n"),
        explode(array(pcts.map(lit(_)): _*)).as("pct"))
      .withColumn("target", targetRank(col("n"), col("pct")))
    val owner = targets.join(offs,
        col("target") > col("cum_prev") && col("target") <= col("cum"))
      .select(col("pct"), col("target"), col("b"), col("cum_prev"))
    // per-value weight sums inside the owning bucket: ≤ bucketWidth rows
    // per percentile partition, the crossing value is the answer
    val byVal = v.join(broadcast(owner), Seq("b"))
      .groupBy(col("pct"), col("target"), col("cum_prev"), col("v"))
      .agg(sum(col("w")).as("vw"))
    val wIn = Window.partitionBy(col("pct")).orderBy(col("v"))
    byVal
      .withColumn("cw", col("cum_prev") + sum(col("vw")).over(wIn))
      .filter(col("cw") >= col("target") &&
        col("cw") - col("vw") < col("target"))
      .select(col("pct"), col("v").as("value"))
  }

  /** Exact percentiles of SEVERAL long columns of one relation in ONE
    * derivation (r18, for q309's R/F/M bounds): the naive form runs
    * [[exactQuantiles]] once per column — three histogram shuffles,
    * three count passes, three owning-bucket ranks over the SAME input
    * (guide §1.2: don't re-scan what one pass can carry). This melts
    * the columns to `(metric, v)` rows carrying a PER-METRIC bucket
    * width and runs the group machinery once — identical answers (the
    * width routes work, it never changes the rank-`ceil(p·n/100)`
    * selection; `QuantilesSpec` pins equality against the per-column
    * calls). Output: `(metric, pct, value)`. */
  def exactMetricQuantiles(df: DataFrame, metrics: Seq[(String, Long)],
                           pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    require(metrics.nonEmpty && metrics.forall(_._2 > 0),
      "bucket widths must be positive")
    val v = df.select(explode(array(metrics.map { case (c, w) =>
        struct(lit(c).as("g"), col(c).cast("long").as("v"),
          lit(w).as("bw"))
      }: _*)).as("x"))
      .select(col("x.g").as("g"), col("x.v").as("v"),
        expr("x.v div x.bw").as("b"))
    val wOff = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = v.groupBy(col("g"), col("b")).agg(count(lit(1)).as("bn"))
      .withColumn("cum", sum(col("bn")).over(wOff))
      .withColumn("cum_prev", col("cum") - col("bn"))
    val targets = v.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .select(col("g"),
        col("n"), explode(array(pcts.map(lit(_)): _*)).as("pct"))
      .withColumn("target", targetRank(col("n"), col("pct")))
    val owner = targets.join(offs.withColumnRenamed("g", "og"),
        col("g") === col("og") &&
          col("target") > col("cum_prev") && col("target") <= col("cum"))
      .select(col("g"), col("pct"), col("target"), col("b"),
        col("cum_prev"))
    val wIn = Window.partitionBy(col("g"), col("pct")).orderBy(col("v"))
    v.join(broadcast(owner), Seq("g", "b"))
      .withColumn("rn", row_number().over(wIn))
      .filter(col("rn") === col("target") - col("cum_prev"))
      .select(col("g").as("metric"), col("pct"), col("v").as("value"))
  }

  /** Per-group exact WEIGHTED percentiles — [[exactWeightedQuantiles]]
    * with the group key carried through every stage, same bounded-window
    * guarantees per (group, pct). Output: `(group, pct, value)`. */
  def exactGroupWeightedQuantiles(df: DataFrame, groupCol: String,
                                  valueCol: String, weightCol: String,
                                  pcts: Seq[Int],
                                  bucketWidth: Long): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val v = df.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"),
        col(weightCol).cast("long").as("w"))
      .withColumn("b", expr(s"v div ${bucketWidth}L"))
    val wOff = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = v.groupBy(col("g"), col("b")).agg(sum(col("w")).as("bw"))
      .withColumn("cum", sum(col("bw")).over(wOff))
      .withColumn("cum_prev", col("cum") - col("bw"))
    val targets = v.groupBy(col("g")).agg(sum(col("w")).as("n"))
      .select(col("g"), col("n"),
        explode(array(pcts.map(lit(_)): _*)).as("pct"))
      .withColumn("target", targetRank(col("n"), col("pct")))
    val owner = targets.join(offs.withColumnRenamed("g", "og"),
        col("g") === col("og") &&
          col("target") > col("cum_prev") && col("target") <= col("cum"))
      .select(col("g"), col("pct"), col("target"), col("b"),
        col("cum_prev"))
    val byVal = v.join(broadcast(owner), Seq("g", "b"))
      .groupBy(col("g"), col("pct"), col("target"), col("cum_prev"),
        col("v"))
      .agg(sum(col("w")).as("vw"))
    val wIn = Window.partitionBy(col("g"), col("pct")).orderBy(col("v"))
    byVal
      .withColumn("cw", col("cum_prev") + sum(col("vw")).over(wIn))
      .filter(col("cw") >= col("target") &&
        col("cw") - col("vw") < col("target"))
      .select(col("g").as(groupCol), col("pct"), col("v").as("value"))
  }

  /** Per-group exact percentiles — same two-phase selection with the
    * group key carried through every stage (histogram on (group, bucket),
    * offsets windowed per group over the bounded relation, final rank
    * partitioned by (group, pct)). Output: `(group, pct, value)`. */
  def exactGroupQuantiles(df: DataFrame, groupCol: String,
                          valueCol: String, pcts: Seq[Int],
                          bucketWidth: Long): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "percentiles must be in [1, 100]")
    require(bucketWidth > 0, "bucketWidth must be positive")
    val v = df.select(col(groupCol).as("g"),
        col(valueCol).cast("long").as("v"))
      .withColumn("b", expr(s"v div ${bucketWidth}L"))
    val wOff = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = v.groupBy(col("g"), col("b")).agg(count(lit(1)).as("bn"))
      .withColumn("cum", sum(col("bn")).over(wOff))
      .withColumn("cum_prev", col("cum") - col("bn"))
    val targets = v.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .select(col("g"),
        col("n"), explode(array(pcts.map(lit(_)): _*)).as("pct"))
      .withColumn("target", targetRank(col("n"), col("pct")))
    val owner = targets.join(offs.withColumnRenamed("g", "og"),
        col("g") === col("og") &&
          col("target") > col("cum_prev") && col("target") <= col("cum"))
      .select(col("g"), col("pct"), col("target"), col("b"),
        col("cum_prev"))
    val wIn = Window.partitionBy(col("g"), col("pct")).orderBy(col("v"))
    v.join(broadcast(owner), Seq("g", "b"))
      .withColumn("rn", row_number().over(wIn))
      .filter(col("rn") === col("target") - col("cum_prev"))
      .select(col("g").as(groupCol), col("pct"), col("v").as("value"))
  }
}
