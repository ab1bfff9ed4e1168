package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  /** Reference type-1 quantile: value at ascending rank ceil(p·n/100). */
  private def refQuantile(sorted: Seq[Long], p: Int): Long =
    sorted(((sorted.length.toLong * p + 99) / 100).toInt - 1)

  // deterministic values with duplicates and gaps across many buckets
  private val values: Seq[Long] =
    (1 to 500).map(i => ((i * i) % 997).toLong)

  test("exact quantiles match the sorted-rank definition") {
    val df = values.toDF("v")
    val pcts = Seq(1, 25, 50, 75, 90, 99, 100)
    val got = Quantiles.exactQuantiles(df, "v", pcts, bucketWidth = 64L)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sorted = values.sorted
    assert(got == pcts.map(p => p -> refQuantile(sorted, p)).toMap)
  }

  test("bucket width does not change the answer (1, huge, prime)") {
    val df = values.toDF("v")
    val pcts = Seq(25, 50, 75)
    def run(w: Long) =
      Quantiles.exactQuantiles(df, "v", pcts, bucketWidth = w)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // w=1: one bucket per value (rank-within is trivial); w=10^9: a
    // single bucket (degenerates to the full sort); w=37: uneven split
    assert(run(1L) == run(1000000000L) && run(37L) == run(1L))
  }

  test("per-group quantiles equal the global operator per group") {
    val df = values.zipWithIndex
      .map { case (v, i) => (s"g${i % 3}", v) }.toDF("src", "v")
    val pcts = Seq(25, 50, 75)
    val got = Quantiles
      .exactGroupQuantiles(df, "src", "v", pcts, bucketWidth = 50L)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val expected = (0 until 3).flatMap { g =>
      val sorted = values.zipWithIndex
        .collect { case (v, i) if i % 3 == g => v }.sorted
      pcts.map(p => (s"g$g", p) -> refQuantile(sorted, p))
    }.toMap
    assert(got == expected)
  }

  /** Reference weighted quantile: smallest v whose cumulative weight
    * (over values ≤ v) reaches ceil(p·W/100). */
  private def refWeighted(vw: Seq[(Long, Long)], p: Int): Long = {
    val total = vw.map(_._2).sum
    val target = (total * p + 99) / 100
    val byV = vw.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    var cum = 0L
    byV.collectFirst { case (v, w) if { cum += w; cum >= target } => v }.get
  }

  test("weighted quantiles match the cumulative-weight definition " +
       "and reduce to unweighted at w=1") {
    val vw = values.zipWithIndex.map { case (v, i) => (v, (i % 7 + 1).toLong) }
    val df = vw.toDF("v", "w")
    val pcts = Seq(10, 50, 90, 100)
    val got = Quantiles
      .exactWeightedQuantiles(df, "v", "w", pcts, bucketWidth = 64L)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == pcts.map(p => p -> refWeighted(vw, p)).toMap)
    // w ≡ 1 degenerates to the unweighted operator
    val ones = values.map((_, 1L)).toDF("v", "w")
    val unw = Quantiles.exactQuantiles(values.toDF("v"), "v", pcts, 64L)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val wgt = Quantiles.exactWeightedQuantiles(ones, "v", "w", pcts, 64L)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(wgt == unw)
    // bucket-width invariance holds for the weighted form too
    def run(width: Long) = Quantiles
      .exactWeightedQuantiles(df, "v", "w", Seq(50), width)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(run(1L) == run(1000000000L) && run(37L) == run(1L))
  }

  test("per-group weighted quantiles equal the global operator per group") {
    val vw = values.zipWithIndex
      .map { case (v, i) => (s"g${i % 3}", v, (i % 5 + 1).toLong) }
    val df = vw.toDF("src", "v", "w")
    val pcts = Seq(50, 90)
    val got = Quantiles
      .exactGroupWeightedQuantiles(df, "src", "v", "w", pcts, 64L)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val expected = (0 until 3).flatMap { g =>
      val part = vw.collect { case (s, v, w) if s == s"g$g" => (v, w) }
      pcts.map(p => (s"g$g", p) -> refWeighted(part, p))
    }.toMap
    assert(got == expected)
  }

  test("multi-metric quantiles equal the per-column operator (r18 q309)") {
    // three columns with different scales and widths, like q309's R/F/M
    val df = values.zipWithIndex.map { case (v, i) =>
      (v, (i % 37).toLong, v * 1000L + i)
    }.toDF("rec", "freq", "mon")
    val pcts = Seq(33, 66)
    val metrics = Seq(("rec", 1L), ("freq", 1L), ("mon", 100000L))
    val got = Quantiles.exactMetricQuantiles(df, metrics, pcts)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    metrics.foreach { case (c, w) =>
      val expected = Quantiles.exactQuantiles(df, c, pcts, w)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      pcts.foreach { p =>
        assert(got((c, p)) == expected(p), s"metric $c pct $p")
      }
    }
  }

  test("plans carry no scale-unsafe shapes (audit clean)") {
    val df = values.toDF("v")
    val grouped = values.zipWithIndex
      .map { case (v, i) => (s"g${i % 3}", v) }.toDF("src", "v")
    val findings =
      graft.tools.ExplainAudit.audit(
        Quantiles.exactQuantiles(df, "v", Seq(50), 64L), "quantiles") ++
      graft.tools.ExplainAudit.audit(
        Quantiles.exactGroupQuantiles(grouped, "src", "v", Seq(50), 64L),
        "group_quantiles") ++
      graft.tools.ExplainAudit.audit(
        Quantiles.exactWeightedQuantiles(
          values.map((_, 2L)).toDF("v", "w"), "v", "w", Seq(50), 64L),
        "weighted_quantiles")
    assert(findings.isEmpty, findings.mkString("; "))
  }
}
