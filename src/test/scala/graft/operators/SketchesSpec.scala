package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("count-min estimates dominate truth; exact without collisions") {
    val docs = Seq((1L, "a a a b"), (2L, "a b c")).toDF("doc_id", "text")
    val cells = Sketches.countMin(docs, depth = 4, hexChars = 2)
    // total mass per row of the sketch equals total occurrences
    val mass = cells.groupBy("seed").agg(sum("cnt").as("m"))
      .collect().map(_.getLong(1))
    assert(mass.length == 4 && mass.forall(_ == 7L))
    val probes = Seq("a", "b", "c", "zzz").toDF("tok")
    val est = Sketches.cmsEstimate(cells, probes, depth = 4, hexChars = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3 distinct tokens in 256 cells: collision-free w.h.p. — and the CMS
    // guarantee (≥ truth) holds regardless
    assert(est("a") >= 4L && est("b") >= 2L && est("c") >= 1L)
    assert(est("zzz") >= 0L)
    // the min over 4 independent rows of a 3-token sketch is exact here
    assert(est == Map("a" -> 4L, "b" -> 2L, "c" -> 1L, "zzz" -> 0L))
  }

  test("batch-built sketches merge to the one-shot sketch (incremental path)") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .limit(60)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    def cellMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
        .toMap
    val merged = Sketches.mergeCms(
      Sketches.countMin(a), Sketches.countMin(b))
    assert(cellMap(merged) == cellMap(Sketches.countMin(docs)))
    def bitSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getString(1))).toSet
    val mergedBits = Sketches.mergeBloom(
      Sketches.bloomBits(a), Sketches.bloomBits(b))
    assert(bitSet(mergedBits) == bitSet(Sketches.bloomBits(docs)))
  }

  test("bloom probe: no false negatives; full containment flags all") {
    val bench = Seq((100L, "w x y z q")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "w x y z q"),                  // identical → all shingles maybe
      (2L, "completely different words here")) // disjoint
      .toDF("doc_id", "text")
    val bits = Sketches.bloomBits(bench)
    val out = Sketches.bloomProbe(corpus, bits)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // doc 1: every shingle is IN the benchmark — Bloom must flag all
    assert(out(1L)._1 == out(1L)._2)
    // doc 2: n_maybe bounded by its shingle count (may include FPs)
    assert(out(2L)._2 <= out(2L)._1)
  }

  test("kmv: exact below k, re-observation dedups, slots sorted") {
    // 5 distinct values observed with heavy repetition, k = 8 > 5:
    // the sketch IS the distinct hash set and the estimate is exact
    val df = (1 to 50).map(i => ("g", s"v${i % 5}")).toDF("source", "text")
    val sk = Sketches.kmvSketch(df, k = 8)
    val hs = sk.collect().head.getSeq[Long](1)
    assert(hs.length == 5 && hs == hs.sorted && hs.distinct == hs)
    val est = Sketches.kmvEstimate(sk, k = 8).collect().head
    assert(est.getLong(est.fieldIndex("n_hashes")) == 5L)
    assert(est.getLong(est.fieldIndex("kth_hash")) == 0L)
    assert(est.getLong(est.fieldIndex("distinct_est")) == 5L)
  }

  test("kmv estimate lands near truth at k slots (deterministic md5)") {
    val n = 1000
    val df = (1 to n).map(i => ("g", s"value-$i")).toDF("source", "text")
    val est = Sketches.kmvEstimate(Sketches.kmvSketch(df, k = 64), k = 64)
      .collect().head
    val e = est.getLong(est.fieldIndex("distinct_est"))
    // fixed hash family ⇒ this is a constant, pinned loosely: the
    // (k−1)/h_k estimator's σ ≈ n/√k ≈ 12.5% here
    assert(e > n / 2 && e < n * 2, s"estimate $e far from $n")
    assert(est.getLong(est.fieldIndex("n_hashes")) == 64L)
  }

  test("kmv batch-merge equals the one-shot sketch (incremental path)") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    def slots(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    val merged = Sketches.mergeKmv(16,
      Sketches.kmvSketch(a, 16), Sketches.kmvSketch(b, 16))
    assert(slots(merged) == slots(Sketches.kmvSketch(docs, 16)))
  }

  test("hll estimate lands near truth; rho bounds hold") {
    val n = 5000
    val df = (1 to n).map(i => ("g", s"value-$i")).toDF("grp", "v")
    val regs = Sketches.hllRegisters(df, "grp", "v")
    val rows = regs.collect()
    // at most m = 256 registers, rho in [1, 49]
    assert(rows.length <= 256)
    assert(rows.forall { r =>
      val rho = r.getInt(r.fieldIndex("rho_max")); rho >= 1 && rho <= 49
    })
    val est = Sketches.hllEstimate(regs).collect().head
    val e = est.getLong(est.fieldIndex("hll_estimate"))
    // fixed hash family ⇒ constant; raw estimator σ ≈ 1.04/√256 = 6.5%,
    // pinned loosely at ±20%
    assert(e > n * 8 / 10 && e < n * 12 / 10, s"estimate $e far from $n")
  }

  test("hll register merge (max per register) equals the one-shot sketch") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(lit("g").as("grp"), col("text"))
    val a = docs.filter(length(col("text")) % 2 === 0)
    val b = docs.filter(length(col("text")) % 2 =!= 0)
    val merged = Sketches.hllRegisters(a, "grp", "text")
      .unionByName(Sketches.hllRegisters(b, "grp", "text"))
      .groupBy(col("grp"), col("register"))
      .agg(max(col("rho_max")).as("rho_max"))
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getInt(r.fieldIndex("rho_max"))).toMap
    assert(m(merged) == m(Sketches.hllRegisters(docs, "grp", "text")))
  }
}
