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

  test("plans carry no scale-unsafe shapes (audit clean)") {
    val df = values.toDF("v")
    val grouped = values.zipWithIndex
      .map { case (v, i) => (s"g${i % 3}", v) }.toDF("src", "v")
    val findings =
      graft.tools.ExplainAudit.audit(
        Quantiles.exactQuantiles(df, "v", Seq(50), 64L), "quantiles") ++
      graft.tools.ExplainAudit.audit(
        Quantiles.exactGroupQuantiles(grouped, "src", "v", Seq(50), 64L),
        "group_quantiles")
    assert(findings.isEmpty, findings.mkString("; "))
  }
}
