package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based hardening of the quantile family: seeded scalacheck
  * samples (reproducible — no wall-clock randomness) with values spanning
  * NEGATIVE ranges and duplicate-heavy weights, checked against the
  * brute-force definitions. Negative values matter: the bucket map
  * `v div width` uses truncating division, which is monotone but places
  * mixed-sign values asymmetrically around zero — exactly the shape a
  * hand-written fixture under-tests. */
class QuantilePropertySpec extends SparkSpec {
  import spark.implicits._

  private val pcts = Seq(1, 37, 50, 83, 100)

  private def refQuantile(sorted: Seq[Long], p: Int): Long =
    sorted(((sorted.length.toLong * p + 99) / 100).toInt - 1)

  private def refWeighted(vw: Seq[(Long, Long)], p: Int): Long = {
    val total = vw.map(_._2).sum
    val target = (total * p + 99) / 100
    val byV = vw.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toSeq.sortBy(_._1)
    var cum = 0L
    byV.collectFirst { case (v, w) if { cum += w; cum >= target } => v }.get
  }

  private val vwGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(-1000L, 1000L),
      Gen.choose(1L, 9L)))

  test("unweighted quantiles match sorted-rank on seeded random inputs " +
       "(negative values, duplicates, prime bucket width)") {
    (1 to 6).foreach { seed =>
      val vs = vwGen.pureApply(Gen.Parameters.default.withSize(120),
        Seed(seed.toLong)).map(_._1)
      val got = Quantiles
        .exactQuantiles(vs.toDF("v"), "v", pcts, bucketWidth = 37L)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val sorted = vs.sorted
      assert(got == pcts.map(p => p -> refQuantile(sorted, p)).toMap,
        s"seed=$seed n=${vs.length}")
    }
  }

  test("weighted quantiles match cumulative-weight brute force on " +
       "seeded random inputs") {
    (1 to 6).foreach { seed =>
      val vw = vwGen.pureApply(Gen.Parameters.default.withSize(120),
        Seed(100L + seed))
      val got = Quantiles
        .exactWeightedQuantiles(vw.toDF("v", "w"), "v", "w", pcts,
          bucketWidth = 37L)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(got == pcts.map(p => p -> refWeighted(vw, p)).toMap,
        s"seed=$seed n=${vw.length}")
    }
  }
}
