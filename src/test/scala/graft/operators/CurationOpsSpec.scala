package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Identity / degeneration properties of the round-9 operators — the
  * cross-checks a hash-compare against one dataset cannot state. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("kmvPairSimilarity: identical content ⇒ Jaccard exactly 1e6") {
    val docs = (1 to 40).map(i => ("a", s"text body number $i"))
      .toDF("source", "text")
    val mirrored = docs.unionByName(
      docs.withColumn("source", lit("b")))
    val sk = Sketches.kmvSketch(mirrored, 16, "source", "text")
    val out = Sketches.kmvPairSimilarity(sk, 16).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("jaccard_ppm") === 1000000L)
    assert(r.getAs[Long]("inter_est") === r.getAs[Long]("union_est"))
  }

  test("kmvPairSimilarity: disjoint content ⇒ zero intersection") {
    val a = (1 to 30).map(i => ("a", s"alpha item $i")).toDF("source", "text")
    val b = (1 to 30).map(i => ("b", s"omega entry $i")).toDF("source", "text")
    val sk = Sketches.kmvSketch(a.unionByName(b), 16, "source", "text")
    val r = Sketches.kmvPairSimilarity(sk, 16).collect().head
    assert(r.getAs[Long]("inter_cnt") === 0L)
    assert(r.getAs[Long]("jaccard_ppm") === 0L)
  }

  test("hashSample: exact when a stratum is smaller than k") {
    val docs = Seq((1L, "tiny"), (2L, "tiny"), (3L, "big"), (4L, "big"),
      (5L, "big"), (6L, "big")).toDF("doc_id", "source")
    val out = DatasetOps.hashSample(docs, k = 3)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("tiny") === 2L) // whole stratum, not padded
    assert(bySrc("big") === 3L)  // capped at k
  }

  test("anomalyFlags: a flat series raises no flags") {
    val flat = (1 to 20).map(i =>
      (java.sql.Timestamp.valueOf(f"2001-05-$i%02d 00:00:00"), 50.0))
      .toDF("o_orderdate", "o_totalprice")
    assert(TimeSeries.anomalyFlags(TimeSeries.dailyTotals(flat))
      .count() === 0L)
  }

  test("phraseSearch: single-term phrase equals the term count") {
    val docs = Seq((1L, "x y x y x"), (2L, "y y"), (3L, "x"))
      .toDF("doc_id", "text")
    val one = TextAnalysis.phraseSearch(docs, Seq("x"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === Map(1L -> 3L, 3L -> 1L))
    // order matters: "x y" matches twice in doc 1, "y x" also twice —
    // but in doc 2 ("y y") neither matches
    val xy = TextAnalysis.phraseSearch(docs, Seq("x", "y"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(xy === Map(1L -> 2L))
  }

  test("phraseSearch: non-adjacent terms never match") {
    val docs = Seq((1L, "x gap y"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.phraseSearch(docs, Seq("x", "y"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(2L -> 1L))
  }

  test("BPE segmentation round-trips every token losslessly") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
      "documents")
    val merges = Bpe.train(docs, rounds = 6)
    val seg = Bpe.segmentation(docs, merges)
    // detokenization guarantee: concat(symbols) == token, for EVERY token
    assert(seg.filter(concat_ws("", col("symbols")) =!= col("tok"))
      .count() === 0L)
    // and the merges actually fused something (multi-char symbols exist)
    assert(seg.filter(exists(col("symbols"), s => length(s) > 1))
      .count() > 0L)
  }

  test("mergeDaily is associative-equivalent to one-shot totals") {
    def mk(rows: Seq[(String, Double)]) =
      rows.map { case (d, v) =>
        (java.sql.Timestamp.valueOf(d + " 00:00:00"), v) }
        .toDF("o_orderdate", "o_totalprice")
    val a = mk(Seq(("2001-06-01", 1.10), ("2001-06-02", 2.20)))
    val b = mk(Seq(("2001-06-02", 3.30), ("2001-06-03", 4.40)))
    val merged = TimeSeries.mergeDaily(
      TimeSeries.dailyTotals(a), TimeSeries.dailyTotals(b))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2))).toSet
    val oneShot = TimeSeries.dailyTotals(a.unionByName(b))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2))).toSet
    assert(merged === oneShot)
  }
}
