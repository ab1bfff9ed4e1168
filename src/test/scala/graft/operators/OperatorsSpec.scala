package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exact dedup collapses normalised duplicates") {
    val docs = docsOf(
      1L -> "Hello  World",
      2L -> "hello world",
      3L -> "different text")
    val out = Dedup.exact(docs).collect()
    assert(out.length == 2)
    val dup = out.find(_.getAs[Long]("dup_count") == 2).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("jaccard pairs finds overlapping docs, not disjoint ones") {
    val docs = docsOf(
      1L -> "a b c d e f g h",
      2L -> "a b c d e f g x",      // shares most 3-grams with 1
      3L -> "p q r s t u v w")      // disjoint
    val out = Dedup.jaccardPairs(docs, 0.3).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    val j = out.head.getAs[Double]("jaccard")
    assert(j > 0.3 && j < 1.0)
  }

  test("candidateOverlap: exact inter/sizes, zero-overlap candidates kept") {
    val docs = docsOf(
      1L -> "a b c d",              // shingles: "a b c", "b c d"
      2L -> "a b c d e",            // + "c d e" → superset of 1's
      3L -> "x y z w")              // disjoint
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.candidateOverlap(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // (1,2): both shingles of doc 1 occur in doc 2 → containment subset
    assert(out((1L, 2L)) == ((2L, 2L, 3L)))
    // (1,3): an LSH collision with no shared shingle survives with inter=0
    assert(out((1L, 3L)) == ((0L, 2L, 2L)))
  }

  test("duplicateSpanCoverage counts corpus-shared n-gram spans per doc") {
    val docs = docsOf(
      1L -> "a b c d e",            // shingles: abc bcd cde
      2L -> "a b c x y",            // shares abc with 1
      3L -> "p q r s t")            // all spans unique
    val out = Dedup.duplicateSpanCoverage(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_dup"),
         r.getAs[Double]("dup_ratio"))).toMap
    assert(out(1L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(2L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(3L) == ((3L, 0L, 0.0)))
    // a doc duplicated wholesale is 100% covered
    val dup = Dedup.duplicateSpanCoverage(docsOf(
      1L -> "a b c d e", 2L -> "a b c d e")).collect()
    assert(dup.forall(_.getAs[Double]("dup_ratio") == 1.0))
    intercept[IllegalArgumentException] {
      Dedup.duplicateSpanCoverage(docs, minDocs = 1)
    }
  }

  test("duplicateSpans merges overlapping dup n-grams, keeps first owner") {
    val docs = docsOf(
      1L -> "a b c d e",        // owns abc bcd cde
      2L -> "a b c d x",        // abc@0 bcd@1 dup -> one span [0,3]
      3L -> "z a b c d e q")    // abc@1 bcd@2 cde@3 dup -> span [1,5]
    val out = Dedup.duplicateSpans(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"), r.getAs[Long]("span_tokens")))
      .sortBy(t => (t._1, t._2))
    // doc 1 is every shared shingle's first owner: no spans at all
    assert(out.sameElements(Seq((2L, 0L, 3L, 4L), (3L, 1L, 5L, 5L))))
    // non-adjacent duplicated regions stay separate spans
    val split = Dedup.duplicateSpans(docsOf(
      1L -> "a b c", 2L -> "x y z", 3L -> "a b c p q r x y z")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_end"))).sortBy(t => (t._1, t._2))
    assert(split.sameElements(Seq((3L, 0L, 2L), (3L, 6L, 8L))))
  }

  test("noveltyScores attribute each n-gram to its first corpus occurrence") {
    val docs = docsOf(
      1L -> "a b c d e",        // first: all 3 of its shingles novel
      2L -> "a b c d x",        // abc bcd seen in 1; cdx novel
      3L -> "p q r s t")        // disjoint: all novel
    val out = Dedup.noveltyScores(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_novel"),
         r.getAs[Double]("novelty_ratio"))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(3L) == ((3L, 3L, 1.0)))
  }

  test("duplicationRank: fixed-point PageRank matches hand computation") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.duplicationRank(pairs, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // path graph 1–2–3: hub 2 accumulates, leaves symmetric (hand-run of
    // rank' = 0.15·10¹² + Σ (85·(rank div deg)) div 100, 3 rounds)
    assert(got == Map(1L -> 629187500000L, 2L -> 1741625000000L,
      3L -> 629187500000L))
    // layout-invariant (integer sums commute)
    val again = Dedup.duplicationRank(pairs.repartition(5), rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("incremental LSH equals full LSH restricted to batch-touching pairs") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val cut = 400L
    val full = Dedup.lshCandidates(Dedup.minhashSignatures(docs, 16), 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = Dedup.lshCandidatesIncremental(
        Dedup.minhashSignatures(docs.filter(col("doc_id") < cut), 16),
        Dedup.minhashSignatures(docs.filter(col("doc_id") >= cut), 16),
        16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (a, b) => a >= cut || b >= cut }
    assert(inc == expected, s"inc ${inc.size} vs expected ${expected.size}")
    // and it never emits an existing×existing pair
    assert(inc.forall { case (a, b) => a >= cut || b >= cut })
  }

  test("contaminationCoverage scores corpus docs against a benchmark set") {
    val bench = docsOf(10L -> "a b c d e")
    val corpus = docsOf(
      1L -> "a b c d e",        // full copy: all 3 shingles tainted
      2L -> "a b c x y",        // shares abc only
      3L -> "p q r s t")        // clean
    val out = Dedup.contaminationCoverage(corpus, bench).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_tainted"),
         r.getAs[Double]("taint_ratio"))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(3L) == ((3L, 0L, 0.0)))
  }

  test("hot-shingle cut prunes the join without dropping near-dup pairs") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val full = Dedup.jaccardPairs(docs, 0.5).count()
    // cap at 5% of docs: stopword-like shingles leave the join; true
    // near-dups share many rare shingles so survive at this threshold
    val pruned = Dedup.jaccardPairs(docs, 0.5,
      maxShingleDocFreq = Some(docs.count() / 20)).count()
    assert(pruned <= full)
    assert(pruned > 0)
  }

  test("identical docs have identical minhash signatures; candidates found") {
    val docs = docsOf(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "completely unrelated words appear here in this one")
    val sigs = Dedup.minhashSignatures(docs, numHashes = 16)
    val rows = sigs.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(rows(1L) == rows(2L))
    assert(rows(1L) != rows(3L))
    val cands = Dedup.lshCandidates(sigs, 16, 4).collect()
    assert(cands.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("connectedComponents closes pair lists transitively") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), separate pair 10-11, star 20-{21,22}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (20L, 22L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(cc(_) == 1L))
    assert(cc(10L) == 10L && cc(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(cc(_) == 20L))
    assert(cc.size == 9)
    // a long path still converges (diameter rounds)
    val chain = (1L until 15L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val ccChain = Dedup.connectedComponents(chain).collect()
      .map(r => r.getLong(1)).distinct
    assert(ccChain.sameElements(Array(1L)))
  }

  test("simhash of identical text is equal; hamming to unrelated is large") {
    val df = docsOf(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta",
      3L -> "zeta eta theta iota kappa lambda")
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L))
    assert(java.lang.Long.bitCount(m(1L) ^ m(3L)) > 3)
  }

  test("curation pipeline accounts every document exactly once") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val (out, s) = Curation.run(docs)
    assert(s.total == docs.count())
    assert(s.total == s.droppedLowQuality + s.droppedRepetitive +
      s.droppedExactDup + s.droppedNearDup + s.kept)
    assert(s.kept == s.splits.values.sum && s.kept > 0)
    // first-failure attribution: an exact dup that also fails quality
    // counts as low_quality, so per-reason counts are >= 0, and the
    // pipeline must drop SOMETHING on this corpus (it contains dups)
    assert(s.droppedNearDup >= 0 && s.droppedExactDup >= 0)
    assert(s.kept < s.total)
    // output carries the original columns plus quality + split
    assert(out.columns.toSet ==
      (docs.columns.toSet ++ Set("quality", "split")))
    // deterministic: a second run is identical
    val (_, s2) = Curation.run(docs)
    assert(s == s2)
  }

  test("canonicalize keeps best-scored doc per cluster, singletons stay") {
    import spark.implicits._
    val docs = docsOf(
      1L -> "short",                      // cluster {1,2,3}
      2L -> "much longer text here",      // highest score -> canonical
      3L -> "middling text",
      10L -> "same len a", 11L -> "same len b", // tie -> min id wins
      20L -> "lone doc")                  // no pair -> own cluster
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val out = Dedup.canonicalize(docs, clusters,
        size(split(trim(col("text")), "\\s+")).cast("long")).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((1L, 2L, false)) && out(2L) == ((1L, 2L, true)))
    assert(out(3L) == ((1L, 2L, false)))
    assert(out(10L) == ((10L, 10L, true)) && out(11L) == ((10L, 10L, false)))
    assert(out(20L) == ((20L, 20L, true)))
  }

  test("small-corpus simhash variant still finds identical docs") {
    // demoted path: 32-bit sig, 256-key block — kept for tiny corpora only
    val df = docsOf(1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta",
      3L -> "zeta eta theta iota kappa lambda mu nu")
    val pairs = Dedup.simhashPairsSmallCorpus(df, maxDist = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("simhash64 pigeonhole pairs: exact recall at hamming <= 3") {
    // identical docs -> hamming 0; the pigeonhole union must find them no
    // matter which chunk they meet in, and must NOT emit distant pairs
    val df = docsOf(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "zeta eta theta iota kappa lambda mu nu xi omicron")
    val pairs = Dedup.simhashPairs64(df, maxDist = 3).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
    assert(pairs.head.getInt(4) == 0)
    // 64-bit signature really uses the high half (both halves nonzero for
    // a typical doc — the salted second family is independent)
    val sig = df.filter(col("doc_id") === 3L)
      .select(Dedup.simhash64(col("text"))).head().getLong(0)
    assert((sig >>> 32) != 0L && (sig & 0xFFFFFFFFL) != 0L)
  }

  test("pigeonhole recall equals brute force on the corpus sample") {
    // ground truth: all-pairs hamming <= 3 over a small doc sample must be
    // exactly what the 4-chunk union returns (the pigeonhole guarantee)
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents").limit(120)
      .cache()
    val sigs = docs.select(col("doc_id"),
      Dedup.simhash64(col("text")).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val blocked = Dedup.simhashPairs64(docs, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute)
    assert(brute.nonEmpty) // the sample genuinely contains near-dups
  }

  test("native minhash kernel matches the HOF formulation on the corpus") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val k = Dedup.minhashSignatures(docs, 8).orderBy("sid").collect()
    val h = Dedup.minhashSignaturesHof(docs, 8).orderBy("sid").collect()
    assert(k.length == h.length)
    k.zip(h).foreach { case (a, b) => assert(a == b) }
  }

  test("native simhash kernels match the HOF formulation on the corpus") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val cmp = docs.select(
      Dedup.simhash(col("text")).as("k32"),
      Dedup.simhashHof(col("text")).as("h32"),
      Dedup.simhash64(col("text")).as("k64"),
      Dedup.simhash64Hof(col("text")).as("h64"))
    assert(cmp.filter(col("k32") =!= col("h32") ||
      col("k64") =!= col("h64")).count() == 0)
    // and on edge shapes: empty-ish and single-token text
    val edge = docsOf(1L -> "x", 2L -> "  spaced   out  ")
      .select(Dedup.simhash64(col("text")).as("k"),
        Dedup.simhash64Hof(col("text")).as("h"))
    assert(edge.filter(col("k") =!= col("h")).count() == 0)
  }

  test("shingles produce n-grams and deduplicate") {
    val out = docsOf(1L -> "a b c d")
      .select(Dedup.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(out == Seq("a b c", "b c d"))
    val short = docsOf(1L -> "a b")
      .select(Dedup.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(short == Seq("a b")) // shorter than n: single truncated shingle
  }

  test("native shingle kernel matches the HOF formulation on the corpus") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val diff = docs.select(
        Dedup.shingles(col("text"), 3).as("native"),
        Dedup.shinglesHof(col("text"), 3).as("hof"))
      .filter(array_sort(col("native")) =!= array_sort(col("hof")))
      .count()
    assert(diff == 0)
    // exact-ngram boundary: n == token count
    val eq = docsOf(1L -> "x y z")
      .select(Dedup.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(eq == Seq("x y z"))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f))). // opposite
    toDF("vec_id", "embedding")

  test("cosine top-k ranks by true cosine similarity") {
    val out = Similarity.cosineTopK(vecs, queryId = 0, k = 3, dim = 4).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(math.abs(out.head.getAs[Double]("score") -
      (0.9 / math.sqrt(0.9 * 0.9 + 0.1 * 0.1))) < 1e-6) // float32 inputs
    assert(out(1).getAs[Double]("score") == 0.0)
    assert(out(2).getAs[Double]("score") == -1.0)
  }

  test("sign-LSH bucket groups same-sign vectors; top-k searches own bucket") {
    val out = Similarity.signLshTopK(vecs, queryId = 0, k = 3, dim = 4,
      bucketDims = Seq(0)).collect()
    // bucket(bit0 = sign of dim 0): ids 1,2 share the query's bucket; 3 not
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("autoBucketBits / autoCellCount: self-scaling knob formulas are " +
      "integer-exact and clamped (SQL-mirror parity values)") {
    // mirrors: length(bin((n + 255) // 256 - 1)) clamped [4, 24]
    assert(Similarity.autoBucketBits(0L) === 4)
    assert(Similarity.autoBucketBits(500L) === 4)    // sf0.01 — historical 4
    assert(Similarity.autoBucketBits(2000L) === 4)   // sf0.1 — historical 4
    assert(Similarity.autoBucketBits(4096L) === 4)   // boundary: 16 buckets
    assert(Similarity.autoBucketBits(4097L) === 5)
    assert(Similarity.autoBucketBits(16000L) === 6)  // probe x8
    assert(Similarity.autoBucketBits(64000L) === 8)  // probe x32
    assert(Similarity.autoBucketBits(Long.MaxValue) === 24) // cap
    // mirrors: least(greatest(n,1), greatest(4, least(4096, ceil(n/512))))
    assert(IvfIndex.autoCellCount(0L) === 1)
    assert(IvfIndex.autoCellCount(3L) === 3)         // never more cells than n
    assert(IvfIndex.autoCellCount(500L) === 4)       // sf0.01 — historical 4
    assert(IvfIndex.autoCellCount(2000L) === 4)      // sf0.1 — historical 4
    assert(IvfIndex.autoCellCount(2049L) === 5)
    assert(IvfIndex.autoCellCount(16000L) === 32)    // probe x8
    assert(IvfIndex.autoCellCount(64000L) === 125)   // probe x32
    assert(IvfIndex.autoCellCount(Long.MaxValue) === 4096) // cap
  }

  test("near-dup pairs with exact (single-bucket) verification") {
    val out = Similarity.nearDupPairs(vecs, 0.9, dim = 4, bucketDims = Nil)
      .collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
  }

  test("embeddingContamination: max cosine vs benchmark, threshold flag") {
    val bench = vecs.filter(col("vec_id").isin(0L, 2L))
    val corpus = vecs.filter(col("vec_id").isin(1L, 3L))
    val out = Similarity.embeddingContamination(corpus, bench,
        threshold = 0.9, dim = 4).collect()
      .map(r => r.getLong(0) -> (r.getAs[Double]("max_score"),
        r.getAs[Long]("nearest_bench_id"),
        r.getAs[Boolean]("contaminated"))).toMap
    // id 1 ≈ 0.9938 vs bench 0 (contaminated); id 3: −1 vs 0, 0 vs 2 →
    // max 0.0 at bench 2, clean
    assert(out(1L)._2 == 0L && out(1L)._3 &&
      math.abs(out(1L)._1 - 0.9 / math.sqrt(0.82)) < 1e-6)
    assert(out(3L) == ((0.0, 2L, false)))
    // plan: benchmark broadcasts, per-vector max is one partial agg
    val audited = graft.tools.ExplainAudit.audit(
      Similarity.embeddingContamination(corpus, bench, 0.9, 4),
      "embed_decontam")
    assert(audited.isEmpty, audited.mkString("\n"))
  }
}

class MatryoshkaRecallSpec extends SparkSpec {

  test("q378: matryoshka recall — 16 queries per level, ppm in range, " +
      "per-query min never exceeds the mean") {
    val out = graft.queries.PipelineQueries
      .defs("q378_matryoshka_recall")(spark, sf("sf0.001")).collect()
    assert(out.map(_.getAs[Long]("trunc_dim")).toSeq === Seq(32L, 16L))
    out.foreach { r =>
      assert(r.getAs[Long]("n_queries") === 16L)
      val mean = r.getAs[Long]("mean_recall_ppm")
      val min = r.getAs[Long]("min_recall_ppm")
      assert(mean >= 0L && mean <= 1000000L)
      assert(min >= 0L && min <= 1000000L)
      // min*1e5 vs floor(sum*1e6/160): floor slack of 1
      assert(min <= mean + 1L)
    }
  }
}

class EvalSweepSpec extends SparkSpec {

  test("q381: band-sweep recall is monotone in the band count (aligned " +
      "bands nest), bounded by the truth, and ties to q27's pair count") {
    val dir = sf("sf0.001")
    val out = graft.queries.PipelineQueries
      .defs("q381_lsh_band_sweep")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("bands")).toSeq === Seq(2L, 4L, 8L))
    val recalls = out.map(_.getAs[Long]("recall_ppm")).toSeq
    assert(recalls === recalls.sorted,
      s"recall must be nondecreasing in bands: $recalls")
    out.foreach { r =>
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth"))
      assert(r.getAs[Long]("recall_ppm") <= 1000000L)
    }
    val q27 = graft.operators.Dedup
      .jaccardPairs(graft.Tables.load(spark, dir, "documents"),
        graft.queries.PipelineQueries.JaccardThreshold).count()
    assert(out.head.getAs[Long]("n_truth") === q27)
  }

  test("q382: dominant direction replays in BigInt and pins the " +
      "normalization contract") {
    val dir = sf("sf0.001")
    val row = graft.queries.PipelineQueries
      .defs("q382_dominant_direction")(spark, dir).collect().head
    assert(math.abs(row.getAs[Long]("top_loading_e6")) === 1000000L)
    val share = row.getAs[Long]("share_ppm")
    assert(share > 0L && share <= 1000000L)
    assert(row.getAs[Long]("mean_lambda") <=
      row.getAs[Long]("mean_trace"))
    // full BigInt replay: moment matrix, 3 sign-split power rounds,
    // Rayleigh share — must agree exactly
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(_.getSeq[Float](1).map(v =>
        BigInt(math.floor(v.toDouble * 10000).toLong)).toArray)
    val d = 64
    val m = Array.tabulate(d, d)((i, j) =>
      vecs.map(v => v(i) * v(j)).sum)
    def step(x: Array[BigInt]): Array[BigInt] = {
      val y = Array.tabulate(d)(i =>
        (0 until d).map(j => m(i)(j) * x(j)).sum)
      val s = y.map(_.abs).max
      y.map(v => if (v < 0) -((-v) * 1000000 / s)
        else v * 1000000 / s)
    }
    val x3 = step(step(step(Array.fill(d)(BigInt(1000000)))))
    val num = (0 until d).map(i =>
      (0 until d).map(j => m(i)(j) * x3(j)).sum * x3(i)).sum
    val den = x3.map(v => v * v).sum
    val trace = (0 until d).map(i => m(i)(i)).sum
    assert(share === ((num / den) * 1000000 / trace).toLong)
    val topDim = (0 until d).maxBy(i => (x3(i).abs, -i))
    assert(row.getAs[Long]("top_dim") === topDim.toLong)
  }

  test("q384: chain depth — doc accounting ties to the CC relation and " +
      "q131's multi-doc clusters; every cluster has depth >= 1") {
    val dir = sf("sf0.001")
    val out = graft.queries.PipelineQueries
      .defs("q384_dedup_chain_depth")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("chain_depth") >= 1L)
      assert(r.getAs[Long]("n_clusters") <= r.getAs[Long]("n_docs"))
    }
    // within the 8-hop cap (always true at this SF) every CC member is
    // reached, so the histogram's doc total IS the CC relation's size —
    // and equals q131's docs living in multi-doc clusters
    val docs = graft.Tables.load(spark, dir, "documents")
    val cc = graft.operators.Dedup.connectedComponents(
      graft.operators.Dedup.lshCandidates(
        graft.operators.Dedup.minhashSignatures(docs,
          graft.queries.PipelineQueries.NumHashes),
        graft.queries.PipelineQueries.NumHashes,
        graft.queries.PipelineQueries.Bands))
    assert(out.map(_.getAs[Long]("n_docs")).sum === cc.count())
    val q131 = graft.queries.PipelineQueries
      .defs("q131_cluster_sizes")(spark, dir).collect()
      .filter(_.getAs[Long]("cluster_size") >= 2L)
      .map(_.getAs[Long]("n_docs")).sum
    assert(out.map(_.getAs[Long]("n_docs")).sum === q131)
  }

  test("q385: order backlog replays from a brute-force sweep; monthly " +
      "peak dominates month-end") {
    val dir = sf("sf0.001")
    val out = graft.queries.AnalyticsExtras
      .defs("q385_order_backlog")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("peak_backlog") >=
      r.getAs[Long]("end_backlog")))
    // brute force in local Scala
    val placed = graft.Tables.load(spark, dir, "orders")
      .select(to_date(col("o_orderdate")).as("day")).collect()
      .map(_.getDate(0).toLocalDate)
    val closed = graft.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("d")).collect()
      .map(_.getDate(1).toLocalDate.plusDays(1))
    val deltas = (placed.map(_ -> 1L) ++ closed.map(_ -> -1L))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.toEpochDay)
    var run = 0L
    val monthly = scala.collection.mutable.LinkedHashMap
      .empty[Long, (Long, Long)]
    deltas.foreach { case (day, d) =>
      run += d
      val ym = day.getYear.toLong * 100 + day.getMonthValue
      val (pk, _) = monthly.getOrElse(ym, (Long.MinValue, 0L))
      monthly(ym) = (math.max(pk, run), run)
    }
    assert(out.map(r => (r.getAs[Long]("ym"),
      (r.getAs[Long]("peak_backlog"), r.getAs[Long]("end_backlog"))))
      .toMap === monthly.toMap)
  }

  test("q386: shingle df tail — shingle and budget accounting conserve; " +
      "the budget dominates the realized pair space") {
    val dir = sf("sf0.001")
    val docs = graft.Tables.load(spark, dir, "documents")
    val out = graft.queries.PipelineQueries
      .defs("q386_shingle_df_tail")(spark, dir).collect()
    val nShingles = graft.operators.Dedup
      .shingleRelation(docs, "doc_id", "text", 3)
      .select(col("shingle")).distinct().count()
    assert(out.map(_.getAs[Long]("n_shingles")).sum === nShingles)
    assert(out.map(_.getAs[Long]("budget_share_ppm")).sum <= 1000000L)
    // every pair sharing >= 1 shingle is funded by some shingle's
    // C(df,2), so the budget dominates the distinct pair count
    val realized = graft.operators.Dedup.jaccardPairs(docs, 0.0).count()
    assert(out.map(_.getAs[Long]("pair_budget")).sum >= realized)
  }

  test("q387: dup-quality bands conserve the corpus; singleton band " +
      "matches the docs outside the CC relation") {
    val dir = sf("sf0.001")
    val out = graft.queries.PipelineQueries
      .defs("q387_dup_quality")(spark, dir).collect()
    val docs = graft.Tables.load(spark, dir, "documents")
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(out.forall(r => r.getAs[Long]("band") >= 1L &&
      r.getAs[Long]("band") <= 5L))
    assert(out.forall(r => r.getAs[Long]("mean_q_bucket_e3") >= 0L &&
      r.getAs[Long]("mean_q_bucket_e3") <= 1023000L))
    val inCc = graft.operators.Dedup.connectedComponents(
      graft.operators.Dedup.lshCandidates(
        graft.operators.Dedup.minhashSignatures(docs,
          graft.queries.PipelineQueries.NumHashes),
        graft.queries.PipelineQueries.NumHashes,
        graft.queries.PipelineQueries.Bands)).count()
    val band1 = out.find(_.getAs[Long]("band") === 1L)
      .map(_.getAs[Long]("n_docs")).getOrElse(0L)
    assert(band1 === docs.count() - inCc)
  }

  test("q388: budget sweep — kept sets nest exactly as the budget " +
      "grows; the 12k row reconciles with q94") {
    val dir = sf("sf0.001")
    val out = graft.queries.PipelineQueries
      .defs("q388_budget_sweep")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("budget")).toSeq ===
      Seq(6000L, 12000L, 24000L))
    val kept = out.map(_.getAs[Long]("n_kept")).toSeq
    assert(kept === kept.sorted, s"kept must grow with budget: $kept")
    assert(out.forall(_.getAs[Long]("token_share_ppm") <= 1000000L))
    // exact nesting: the per-doc selection statistic is budget-free
    val docs = graft.Tables.load(spark, dir, "documents")
    val k6 = graft.operators.DatasetOps
      .tokenBudgetSelect(docs, 6000L).select(col("doc_id"))
    val k24 = graft.operators.DatasetOps
      .tokenBudgetSelect(docs, 24000L).select(col("doc_id"))
    assert(k6.exceptAll(k24).count() === 0L)
    // cross-query law: q94 (per-lang at 12k) sums to the 12k row
    val q94 = graft.queries.PipelineQueries
      .defs("q94_token_budget")(spark, dir).collect()
    assert(out(1).getAs[Long]("n_kept") ===
      q94.map(_.getAs[Long]("n_kept")).sum)
  }

  test("q389: eigencentrality replays in BigInt; the hub reads exactly " +
      "1e6 after max-normalization") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q389_eigencentrality")(spark, dir).collect()
    assert(out.length === 20)
    assert(out.head.getAs[Long]("eigen_e6") === 1000000L)
    assert(out.forall(r => r.getAs[Long]("eigen_e6") > 0L &&
      r.getAs[Long]("eigen_e6") <= 1000000L))
    // brute replay: adjacency from the canonical pairs, 3 rounds
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val pairs = graft.operators.Graph
      .canonicalPairs(li, "l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2)).toMap
    var x = adj.keys.map(_ -> BigInt(1000000)).toMap
    for (_ <- 1 to 3) {
      val y = adj.map { case (n, ns) => n -> ns.map(x).sum }
      val mx = y.values.max
      x = y.map { case (n, v) => n -> v * 1000000 / mx }
    }
    val expected = x.toSeq
      .sortBy { case (n, v) => (-v, n) }.take(20)
      .map { case (n, v) => (n, v.toLong) }
    assert(out.map(r => (r.getAs[Long]("part_key"),
      r.getAs[Long]("eigen_e6"))).toSeq === expected)
  }

  test("q390: PQ subspace distortion replays exactly from the trained " +
      "model; shares conserve") {
    val dir = sf("sf0.001")
    val out = graft.queries.PipelineQueries
      .defs("q390_pq_subspace_distortion")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("subspace")).toSeq ===
      (0L until 16L).toSeq)
    assert(out.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
    assert(out.forall(_.getAs[Long]("mean_dist_e9") >= 0L))
    // exact replay: same codebooks, same assignment, same 1e-9 floor
    val model = graft.queries.PipelineQueries.PqModels
      .trained(spark, dir)
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val subDim = 64 / 16
    val sums = Array.fill(16)(0L)
    vecs.foreach { v =>
      for (j <- 0 until 16) {
        val cands = model.codebooks(j).zipWithIndex.map { case (cw, c) =>
          val d = (0 until subDim).map { i =>
            val x = v(j * subDim + i) - cw(i); x * x
          }.sum
          (d, c)
        }
        val best = cands.minBy(identity)
        sums(j) += math.floor(best._1 * 1e9).toLong
      }
    }
    val total = sums.sum
    out.foreach { r =>
      val j = r.getAs[Long]("subspace").toInt
      val n = vecs.length.toLong
      assert(r.getAs[Long]("mean_dist_e9") === sums(j) / n)
      assert(r.getAs[Long]("share_ppm") ===
        sums(j) * 1000000L / math.max(total, 1L))
    }
  }

  test("q391: backlog aging replays from a brute-force month-end walk") {
    val dir = sf("sf0.001")
    val out = graft.queries.AnalyticsExtras
      .defs("q391_backlog_aging")(spark, dir).collect()
      .map(r => (r.getAs[Long]("ym"), r.getAs[String]("band"))
        -> r.getAs[Long]("n_open")).toMap
    assert(out.nonEmpty)
    val life = graft.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"))
      .join(graft.Tables.load(spark, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(max(to_date(col("l_shipdate"))).as("cd")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("od"), col("cd")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate))
    val monthEnds = life.map(_._1)
      .map(d => d.withDayOfMonth(d.lengthOfMonth)).distinct
    val expected = (for {
      m <- monthEnds
      (od, cd) <- life
      if !od.isAfter(m) && cd.isAfter(m)
    } yield {
      val age = java.time.temporal.ChronoUnit.DAYS.between(od, m)
      val band = if (age <= 30) "a_0_30"
        else if (age <= 90) "b_31_90" else "c_90_plus"
      (m.getYear.toLong * 100 + m.getMonthValue, band)
    }).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(out === expected)
  }

  test("q392: vocab coverage is monotone in k and replays from the " +
      "ranked vocabulary") {
    val dir = sf("sf0.001")
    val out = graft.queries.CurationExtras
      .defs("q392_vocab_coverage")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("top_k")).toSeq ===
      Seq(100L, 1000L, 10000L))
    val cov = out.map(_.getAs[Long]("coverage_ppm")).toSeq
    assert(cov === cov.sorted)
    assert(cov.forall(_ <= 1000000L))
    val freqs = graft.Tables.load(spark, dir, "documents")
      .select(explode(graft.operators.TextAnalysis
        .tokens(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("f")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val ranked = freqs.sortBy { case (t, f) => (-f, t) }.map(_._2)
    val totalOcc = ranked.sum
    out.foreach { r =>
      val k = r.getAs[Long]("top_k").toInt
      val covered = ranked.take(k).sum
      assert(r.getAs[Long]("n_types") === ranked.length.toLong)
      assert(r.getAs[Long]("covered") === covered)
      assert(r.getAs[Long]("coverage_ppm") ===
        covered * 1000000L / totalOcc)
    }
  }

  test("q393: probe cost is monotone in nprobe, conserves at full " +
      "width, and the probed cells match IvfIndex.probe's choice") {
    val dir = sf("sf0.001")
    val out = graft.queries.PipelineQueries
      .defs("q393_ivf_cost_curve")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("nprobe")).toSeq === Seq(1L, 2L, 4L))
    val rows = out.map(_.getAs[Long]("rows_scanned")).toSeq
    assert(rows === rows.sorted)
    val nTotal = graft.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") =!= 0).count()
    // nprobe = nlist scans the whole corpus exactly once
    assert(rows.last === nTotal)
    assert(out.last.getAs[Long]("scan_share_ppm") === 1000000L)
    // cost × recall coherence: the nprobe=2 arm scans exactly the rows
    // the q49 probe scores (same cells, same corpus slice)
    val q49n = graft.queries.PipelineQueries
      .defs("q49_ivf_probe")(spark, dir).count()
    assert(q49n <= rows(1))
  }

  test("q383: session counts shrink as the gap grows; the mean-events " +
      "identity holds exactly at every gap") {
    val dir = sf("sf0.001")
    val out = graft.queries.AnalyticsExtras
      .defs("q383_gap_sensitivity")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("gap_min")).toSeq === Seq(10L, 30L, 60L))
    val ns = out.map(_.getAs[Long]("n_sessions")).toSeq
    assert(ns === ns.sorted.reverse, s"sessions must shrink: $ns")
    val nEvents = graft.Tables.load(spark, dir, "events").count()
    val nUsers = graft.Tables.load(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    out.foreach { r =>
      val n = r.getAs[Long]("n_sessions")
      assert(n >= nUsers && n <= nEvents)
      assert(r.getAs[Long]("mean_events_e3") === nEvents * 1000L / n)
      assert(r.getAs[Long]("bounce_ppm") <= 1000000L)
    }
  }
}

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(words: (String, Int)*) =
    words.zipWithIndex.map { case ((w, n), i) =>
      (i.toLong, (s"$w " * n).trim)
    }.toDF("doc_id", "text")

  test("BPE merges follow weighted pair counts; merged symbols re-merge") {
    // the classic subword example: hug×10 pug×5 pun×12 bun×4 hugs×5
    val docs = corpus("hug" -> 10, "pug" -> 5, "pun" -> 12,
      "bun" -> 4, "hugs" -> 5)
    val got = Bpe.train(docs, rounds = 3)
    assert(got == Seq(
      Bpe.Merge(1, "u", "g", "ug", 20),
      Bpe.Merge(2, "u", "n", "un", 16),
      Bpe.Merge(3, "h", "ug", "hug", 15)))   // 3-char symbol from a merge
  }

  test("BPE tie-break is the lexicographically smallest pair") {
    val got = Bpe.train(corpus("ab" -> 3, "cd" -> 3), rounds = 2)
    assert(got.map(m => (m.lhs, m.rhs, m.pair_count)) ==
      Seq(("a", "b", 3L), ("c", "d", 3L)))
  }

  test("BPE encode counts subwords per doc under the learned merges") {
    val docs = corpus("hug" -> 10, "pug" -> 5, "pun" -> 12,
      "bun" -> 4, "hugs" -> 5)
    val merges = Bpe.train(docs, rounds = 3)
    // post-merge reps: hug=[hug] pug=[p,ug] pun=[p,un] bun=[b,un]
    // hugs=[hug,s]
    val out = Bpe.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out == Map(0L -> ((10L, 10L)), 1L -> ((5L, 10L)),
      2L -> ((12L, 24L)), 3L -> ((4L, 8L)), 4L -> ((5L, 10L))))
  }

  test("BPE vocabulary: weighted symbol counts after the merges") {
    val docs = corpus("hug" -> 10, "pug" -> 5, "pun" -> 12,
      "bun" -> 4, "hugs" -> 5)
    val got = Bpe.vocabulary(docs, Bpe.train(docs, rounds = 3)).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hug" -> 15L, "p" -> 17L, "ug" -> 5L,
      "un" -> 16L, "b" -> 4L, "s" -> 5L))
  }

  test("BPE stops early when no pairs remain; layout-invariant") {
    // every word collapses to one symbol after 2 merges
    val docs = corpus("ab" -> 2, "cd" -> 1)
    assert(Bpe.train(docs, rounds = 5).size == 2)
    assert(Bpe.train(docs.repartition(7), rounds = 2) ==
      Bpe.train(docs, rounds = 2))
  }
}

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: known values, symmetric rounding, zero guard") {
    val vecs = Seq(
      (1L, Array(1.0f, -1.0f, 0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f, 0.0f))) // all-zero: no 0/0 NaN
      .toDF("vec_id", "embedding")
    val out = Quantize.int8(vecs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("max_abs"),
          r.getSeq[Int](r.fieldIndex("qvec")).toList)).toMap
    assert(out(1L)._1 == 1.0)
    // 0.5*127+0.5=64.0 → 64; 0.25*127+0.5=32.25 → 32; -1 → -127
    assert(out(1L)._2 == List(127, -127, 64, 32, 0))
    assert(out(2L)._1 == 0.0 && out(2L)._2 == List(0, 0, 0, 0, 0))
  }

  test("zero-norm vectors never rank in quantized top-k (no NaN-first)") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero vector: 0/0 = NaN score
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Quantize.quantizedTopK(vecs, queryId = 0, k = 4)
      .collect()
    // the zero vector is dropped, not ranked first on a NaN score
    assert(!out.map(_.getLong(0)).contains(2L))
    assert(out.head.getLong(0) == 1L)
    assert(out.forall(r => !r.getAs[Double]("score").isNaN))
  }

  test("quantized top-k recall vs the float baseline on the corpus") {
    val emb = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
    val exact = Similarity.cosineTopK(emb, queryId = 0, k = 10, dim = 64)
      .collect().map(_.getLong(0)).toSet
    val quant = Quantize.quantizedTopK(emb, queryId = 0, k = 10)
      .collect().map(_.getLong(0)).toSet
    // int8 max-abs quantization on 64-dim unit-ish vectors: ranks move a
    // little, the top set barely does
    assert((exact intersect quant).size >= 8,
      s"recall too low: exact=$exact quant=$quant")
  }

  test("IVF quantized probe tracks the float probe on the corpus") {
    val emb = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
    val model = IvfIndex.train(emb, nlist = 8, dim = 64)
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
      .map(_.toDouble).toArray
    val floatTop = IvfIndex.probe(
        IvfIndex.assign(emb, model, 64).filter(col("vec_id") =!= 0),
        model, query, k = 10, nprobe = 4, dim = 64)
      .collect().map(_.getLong(0)).toSet
    val quantTop = IvfIndex.probeQuantized(
        IvfIndex.assign(Quantize.int8(emb), model, 64)
          .filter(col("vec_id") =!= 0),
        model, query, k = 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    // same probed cells (pruning is float either way); int8 scoring may
    // swap a rank or two at the boundary
    assert((floatTop intersect quantTop).size >= 8,
      s"float=$floatTop quant=$quantTop")
  }

  test("PQ re-rank: full shortlist equals brute force, narrow beats pure ADC") {
    val emb = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
    val model = ProductQuantizer.trainKMeans(emb, k = 16, m = 8, dim = 64)
    val encoded = ProductQuantizer.encode(emb, model)
      .filter(col("vec_id") =!= 0).cache()
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
      .map(_.toDouble).toArray
    val brute = graft.operators.Similarity
      .cosineTopK(emb, queryId = 0, k = 10, dim = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // shortlist = whole corpus -> the exact pass IS brute force
    val n = emb.count().toInt
    val full = ProductQuantizer.adcRerankTopK(encoded, emb, model, query,
        kTop = 10, shortlist = n, dim = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(full == brute)
    // a narrow shortlist's recall must not drop below pure ADC's
    val bruteIds = brute.map(_._1).toSet
    val adcIds = ProductQuantizer.adcTopK(encoded, model, query, kTop = 10)
      .collect().map(_.getLong(0)).toSet
    val rrIds = ProductQuantizer.adcRerankTopK(encoded, emb, model, query,
        kTop = 10, shortlist = 50, dim = 64)
      .collect().map(_.getLong(0)).toSet
    assert((rrIds & bruteIds).size >= (adcIds & bruteIds).size)
    intercept[IllegalArgumentException] {
      ProductQuantizer.adcRerankTopK(encoded, emb, model, query,
        kTop = 10, shortlist = 5, dim = 64)
    }
  }

  test("PQ: encode matches a reference argmin, ADC matches reconstruction") {
    val emb = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
    val model = ProductQuantizer.train(emb, (1L to 8L), m = 8, dim = 64)
    assert(model.m == 8 && model.k == 8 && model.subDim == 8)
    val encoded = ProductQuantizer.encode(emb, model)
      .select(col("vec_id"), col("embedding"), col("pq_codes"))
      .collect()
    // every code in range; kernel assignment equals a driver-side argmin
    encoded.take(50).foreach { r =>
      val vec = r.getSeq[Float](1).map(_.toDouble).toArray
      val codes = r.getSeq[Int](2)
      assert(codes.length == 8 && codes.forall(c => c >= 0 && c < 8))
      val expect = (0 until 8).map { j =>
        (0 until 8).minBy { c =>
          var s = 0.0
          (0 until 8).foreach { d =>
            val diff = vec(j * 8 + d) - model.codebooks(j)(c)(d)
            s += diff * diff
          }
          s
        }
      }
      assert(codes == expect, s"vec ${r.getLong(0)}: $codes vs $expect")
    }
    // ADC score == dot(query, reconstructed codeword concat)
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
      .map(_.toDouble).toArray
    val top = ProductQuantizer.adcTopK(
      ProductQuantizer.encode(emb, model).filter(col("vec_id") =!= 0),
      model, query, kTop = 10).collect()
    assert(top.length == 10)
    top.foreach { r =>
      val codes = r.getSeq[Int](1)
      val recon = (0 until 8).flatMap(j => model.codebooks(j)(codes(j)))
      val ip = query.zip(recon).map { case (a, b) => a * b }.sum
      assert(math.abs(r.getDouble(2) - ip) < 1e-9)
    }
    // determinism across runs
    val again = ProductQuantizer.adcTopK(
      ProductQuantizer.encode(emb, model).filter(col("vec_id") =!= 0),
      model, query, kTop = 10).collect()
    assert(top.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
  }

  test("PQ kmeans trainer beats seed-pick on its own objective; model round-trips") {
    val emb = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
    val vecs = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val seedPick = ProductQuantizer.train(emb, (1L to 8L), m = 8, dim = 64)
    val trained = ProductQuantizer.trainKMeans(emb, k = 8, m = 8, dim = 64)
    assert(trained.m == 8 && trained.k == 8 && trained.subDim == 8)
    val eSeed = ProductQuantizer.quantizationError(seedPick, vecs)
    val eTrained = ProductQuantizer.quantizationError(trained, vecs)
    assert(eTrained <= eSeed,
      s"kmeans error $eTrained worse than seed-pick $eSeed")
    // persistence round-trip is exact
    val dir = java.nio.file.Files.createTempDirectory("pqmodel").toString
    ProductQuantizer.saveModel(spark, trained, s"$dir/model")
    val back = ProductQuantizer.loadModel(spark, s"$dir/model")
    assert(back.codebooks.map(_.map(_.toSeq).toSeq).toSeq ==
      trained.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("trained PQ ladder holds the q102 recall@10 floor (>= 0.6)") {
    // the deployability gate the verdict asked for: seed-picked codebooks
    // measured 0.2 here; the KMeans-trained ladder must stay above 0.6
    val row = graft.queries.PipelineQueries
      .defs("q102_ann_recall")(spark, sf("sf0.001"))
      .collect().head
    val recall = row.getAs[Double]("recall")
    assert(recall >= 0.6, s"trained-codebook recall@10 = $recall < 0.6")
  }

  test("literal codebook CTE pins codewords as exact DOUBLE literals") {
    val m = ProductQuantizer.Model(
      Array(Array(Array(0.1, -1.5e-7), Array(2.0, 3.25))))
    val cte = ProductQuantizer.Sql.literalCodebookCte(m.codebookSeq)
    // shortest-round-trip repr, exponent forced so DuckDB parses DOUBLE
    // (a bare decimal literal would bind as DECIMAL and shave ulps)
    assert(cte.contains("(0, 0, [0.1e0, -1.5E-7])"), cte)
    assert(cte.contains("(0, 1, [2.0e0, 3.25e0])"), cte)
    assert(cte.startsWith("cb AS (SELECT * FROM (VALUES "))
  }

  test("IVF-PQ: cell pruning composes with ADC without changing scores") {
    val emb = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
    val ivf = IvfIndex.train(emb, nlist = 8, dim = 64)
    val pq = ProductQuantizer.train(emb, (1L to 8L), m = 8, dim = 64)
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
      .map(_.toDouble).toArray
    val indexed = IvfIndex.assign(ProductQuantizer.encode(emb, pq), ivf, 64)
      .filter(col("vec_id") =!= 0)
    val cells = ivf.nearestCells(query, nprobe = 4)
    val out = ProductQuantizer.adcTopK(
      indexed.filter(col("ivf_cell").isInCollection(cells)),
      pq, query, kTop = 10).collect()
    assert(out.length == 10)
    // pruning only removes candidates — surviving scores are the full
    // PQ scores, bit-for-bit
    val full = ProductQuantizer.adcTopK(
        ProductQuantizer.encode(emb, pq).filter(col("vec_id") =!= 0),
        pq, query, kTop = 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.foreach(r => assert(full(r.getLong(0)) == r.getDouble(2)))
  }

  test("quantized scoring is pure integer arithmetic (exact, stable)") {
    val emb = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
    val a = Quantize.quantizedTopK(emb, queryId = 0, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Quantize.quantizedTopK(
        emb.repartition(7), queryId = 0, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b)) // layout-invariant: exact integer dots
  }
}

class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  test("lines in >=2 docs drop; order and empty docs survive") {
    val docs = Seq(
      (1L, "keep me\nshared banner\nunique tail"),
      (2L, "shared banner\nother text"),
      (3L, "shared banner")) // nothing left after dedup
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text_clean"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("n_kept"))).toMap
    assert(out(1L) == (("keep me\nunique tail", 3L, 2L)))
    assert(out(2L) == (("other text", 2L, 1L)))
    assert(out(3L) == (("", 1L, 0L)))
  }

  test("minDocFreq raises the bar; within-doc repetition alone survives") {
    val docs = Seq(
      (1L, "x\nx\nx"),      // repeated within ONE doc only
      (2L, "y\nz"),
      (3L, "y\nw"),
      (4L, "y\nv"))          // y in 3 docs
      .toDF("doc_id", "text")
    val out3 = Dedup.lineDedup(docs, minDocFreq = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text_clean"))
      .toMap
    // only y (3 docs) crosses minDocFreq=3; x repeats but in one doc
    assert(out3(1L) == "x\nx\nx")
    assert(out3(2L) == "z" && out3(3L) == "w" && out3(4L) == "v")
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token metrics on a known sentence") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val row = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.stopwordRatio(col("text")),
      TextAnalysis.meanTokenLength(col("text"))).head()
    assert(row.getInt(0) == 6)
    assert(row.getDouble(1) == 3.0 / 6.0) // the, on, the
    assert(row.getDouble(2) == 17.0 / 6.0)
  }

  test("langId picks the dominant marker language, und when none") {
    val df = Seq(
      (1L, "the house of the king is old and big"),
      (2L, "el rey de la casa que habla con todos"),
      (3L, "xyzzy plugh qwerty")).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.langId(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
  }

  test("compressionMetrics: repetitive text compresses far below prose; stable") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the " * 500),                                   // degenerate
      (2L, (1 to 500).map(i => s"w${i * 7919 % 977}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressionMetrics(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L)._3 < 0.05)              // "the the the..." ≈ free
    assert(out(2L)._3 > 5 * out(1L)._3)    // varied text costs real bits
    assert(out.values.forall(v => v._2 > 0 && v._2 <= v._1 + 64))
    // byte-exact stability across runs (fixed level, fixed JDK zlib)
    val again = TextAnalysis.compressionMetrics(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(again == out)
  }

  test("encodingAnomalies counts mojibake digraphs, U+FFFD, C1 controls") {
    val df = Seq(
      (1L, "clean ascii text"),
      (2L, "bad d�code �"),                  // 2 replacements
      (3L, "naÃ¯ve cafÃ©"),        // 2 Ã-digraphs
      (4L, "smart â€œquoteâ€"), // 2 â€ + 1 C1
      (5L, "nel hereandthere"))            // 2 C1 controls
      .toDF("doc_id", "text")
    val out = TextAnalysis.encodingAnomalies(df)
      .select("doc_id", "n_replacement", "n_mojibake", "n_ctrl",
        "encoding_flagged")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((0L, 0L, 0L, false)))
    assert(out(2L) == ((2L, 0L, 0L, true)))
    assert(out(3L) == ((0L, 2L, 0L, true)))
    // doc 4: the U+009D after "quote" is C1; both â€ digraphs count
    assert(out(4L) == ((0L, 2L, 1L, true)))
    assert(out(5L) == ((0L, 0L, 2L, true)))
  }

  test("NFC normalization composes marks, preserves compatibility forms") {
    import graft.functions.TextFunctions.nfcNormalize
    val df = Seq(
      (1L, "café"),          // e + combining acute -> é
      (2L, "café"),           // already composed
      (3L, "ﬁne"),            // fi ligature: NFC leaves it (NFKC wouldn't)
      (4L, "naïve")          // i + combining diaeresis -> ï
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), nfcNormalize(col("text")).as("n"),
        length(nfcNormalize(col("text"))).as("len"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L) == (("café", 4)))
    assert(out(2L) == (("café", 4)))
    assert(out(1L)._1 == out(2L)._1) // dedup keys now agree
    assert(out(3L) == (("ﬁne", 3)))
    assert(out(4L) == (("naïve", 5)))
  }

  test("lexicalSurprisal: exact bit-width means on a known corpus") {
    val docs = Seq(
      (1L, "a a a a"),     // "a" tf=5 -> bin "101" -> 3 bits each
      (2L, "a b"),         // "b" tf=1 -> 1 bit; "a" -> 3 bits
      (3L, "c")            // "c" tf=1 -> 1 bit
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lexicalSurprisal(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("total_bits"),
         r.getAs[Double]("mean_bits"))).toMap
    assert(out(1L) == ((4L, 12L, 3.0)))
    assert(out(2L) == ((2L, 4L, 2.0)))
    assert(out(3L) == ((1L, 1L, 1.0)))
  }

  test("tfIdfSearch: exact integer scores, rare terms dominate") {
    val docs = Seq(
      (1L, "rare common common"),
      (2L, "common common common"),
      (3L, "common"),
      (4L, "rare rare common"),
      (5L, "filler words here"),
      (6L, "common filler"),
      (7L, "filler"),
      (8L, "filler two")
    ).toDF("doc_id", "text")
    // N=8; df(rare)=2 -> 8 div 2 = 4 -> 3 idf bits; df(common)=5 -> 1 bit
    val top = TextAnalysis.tfIdfSearch(docs, Seq("rare", "common"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(top(0) == ((4L, 2 * 3 + 1 * 1, 2L))) // 2×rare + 1×common = 7
    assert(top(1) == ((1L, 1 * 3 + 2 * 1, 2L))) // 1×rare + 2×common = 5
    assert(top(2) == ((2L, 3L, 1L)))            // 3×common
    // case-insensitive on both sides
    val upper = TextAnalysis.tfIdfSearch(docs, Seq("RARE", "Common"), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(upper.toSeq == top.toSeq)
    intercept[IllegalArgumentException] {
      TextAnalysis.tfIdfSearch(docs, Seq.empty, k = 3)
    }
  }

  test("canonicalizeUrl collapses crawl variants, preserves path case") {
    val urls = Seq(
      "HTTPS://WWW.Site.Example.com:443/Docs/A/?utm_source=f&page=2#top",
      "https://site.example.com/Docs/A/?page=2&utm_campaign=x",
      "http://Host.com:80/",
      "http://host.com",
      "https://h.com/p/?utm_campaign=x",
      "https://h.com/p"
    ).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("doc_id", "url")
    val canon = urls.select(col("doc_id"),
        TextAnalysis.canonicalizeUrl(col("url")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // authority lowercased + www./:443 dropped, tracking params stripped
    // with separator repair, fragment off — path case preserved
    assert(canon(0L) == "https://site.example.com/Docs/A/?page=2")
    assert(canon(0L) == canon(1L))
    // default :80 and the bare trailing slash both normalise away
    assert(canon(2L) == "http://host.com")
    assert(canon(2L) == canon(3L))
    // stripping the only param leaves no dangling '?' and the trailing
    // slash then falls at end-of-string
    assert(canon(4L) == "https://h.com/p")
    assert(canon(4L) == canon(5L))
    // urlDedup groups on the canonical key, keeps the lowest id
    val out = TextAnalysis.urlDedup(urls, "url").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("http://host.com") == ((2L, 2L)))
    assert(out("https://h.com/p") == ((4L, 2L)))
  }

  test("bigramSurprisal: exact conditional bit-widths on a known corpus") {
    val docs = Seq(
      (1L, "a b a c"),  // "a b", "b a", "a c"
      (2L, "a b"),
      (3L, "a b")
    ).toDF("doc_id", "text")
    // starts(a)=4, starts(b)=1; cb("a b")=3, cb("b a")=1, cb("a c")=1
    // bits: "a b" -> 4 div 3 = 1 -> 1; "b a" -> 1; "a c" -> 4 -> 3
    val out = TextAnalysis.bigramSurprisal(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("total_bits"),
         r.getAs[Double]("mean_bits"))).toMap
    assert(out(1L) == ((3L, 5L, 5.0 / 3.0)))
    assert(out(2L) == ((1L, 1L, 1.0)))
    assert(out(3L) == ((1L, 1L, 1.0)))
    // the common continuation scores fewer bits than the rare one: doc 1
    // (with the rare "a c") reads higher than the pure "a b" docs
    assert(out(1L)._3 > out(2L)._3)
  }

  test("lmScore: exact reference-model surprisal with OOV floor") {
    val ref = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val lm = TextAnalysis.lmTrain(ref) // N=4, tf(a)=3, tf(b)=1
    val scored = Seq((10L, "a b c")).toDF("doc_id", "text")
    // bits: a -> 4 div 3 = 1 -> 1; b -> 4 -> 3; OOV c -> 4 div 1 -> 3
    val out = TextAnalysis.lmScore(scored, lm).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
         r.getAs[Long]("total_bits"), r.getAs[Double]("mean_bits"))).toMap
    assert(out(10L) == ((3L, 1L, 7L, 7.0 / 3.0)))
    // a doc made of reference-frequent tokens scores fewer bits than an
    // OOV-heavy one — the filter orientation
    val pair = TextAnalysis.lmScore(
        Seq((20L, "a a a"), (21L, "x y z")).toDF("doc_id", "text"), lm)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("mean_bits")).toMap
    assert(pair(20L) < pair(21L))
  }

  test("intraDocLineDedup keeps first occurrences in order, zero shuffle") {
    val docs = Seq(
      (1L, Seq("a b", "c d", "a b", "e")),
      (2L, Seq("x"))).toDF("doc_id", "lines")
    val out = TextAnalysis.intraDocLineDedup(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    def m(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L) == ((4L, 3L, m("a b\nc d\ne"))))
    assert(out(2L) == ((1L, 1L, m("x"))))
    // zero-shuffle plan: no Exchange anywhere
    val plan = TextAnalysis.intraDocLineDedup(docs)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("urlDomain + domainStats + blocklist: per-site policy keys") {
    val docs = Seq(
      (1L, "HTTPS://WWW.Foo.COM:443/Path", "one two"),
      (2L, "http://foo.com/x", "three"),
      (3L, "https://bar.org:8080/y?z=1", "four five six"),
      (4L, "https://www.baz.net", "seven")
    ).toDF("doc_id", "url", "text")
    val doms = docs.select(col("doc_id"),
        TextAnalysis.urlDomain(col("url")).as("d")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(doms == Map(1L -> "foo.com", 2L -> "foo.com",
      3L -> "bar.org", 4L -> "baz.net"))
    val blocked = Seq("bar.org").toDF("domain")
    val stats = TextAnalysis.domainStats(
        TextAnalysis.domainBlocklistFilter(docs, blocked, "url"), "url")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(stats == Map(
      "foo.com" -> ((2L, 3L, 1L, 2L)),
      "baz.net" -> ((1L, 1L, 4L, 4L))))
  }

  test("importanceWeights: exact bit-width log-ratio, target-oriented") {
    val corpus = Seq((1L, "a a b"), (2L, "c c c")).toDF("doc_id", "text")
    val target = corpus.filter(col("doc_id") === 1L)
    // proposal: N=6, tf a=2 b=1 c=3 -> bits a=2 b=3 c=2
    // target:   N=3, tf a=2 b=1; OOV c floors at 3 div 1
    //           -> bits a=1 b=2 c=2
    val out = TextAnalysis.importanceWeights(corpus, target).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("weight_bits"),
         r.getAs[Double]("mean_weight_bits"))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)))    // (2-1)+(2-1)+(3-2)
    assert(out(2L) == ((3L, 0L, 0.0)))    // (2-2)*3
    // orientation: the target-like doc outranks the off-target one
    assert(out(1L)._3 > out(2L)._3)
  }

  test("backoffSurprisal: trigram hit, bigram backoff, unigram floor") {
    val ref = Seq((1L, "a b c a b c")).toDF("doc_id", "text")
    // trigrams: abc bca cab abc -> c3(abc)=2 ctx counts: "a b"=2 "b c"=1 "c a"=1
    // bigrams: ab bc ca ab bc -> c2(ab)=2 c2(bc)=2 c2(ca)=1; starts a=2 b=2 c=1
    // unigrams: a=2 b=2 c=2, N1=6
    val scored = Seq(
      (10L, "a b c"),   // trigram hit: bin(2 div 2)=1 bit, lvl 3
      (11L, "b c b"),   // no tri "b c b", no bi "c b": 2+bin(6 div 2)=4, lvl 1
      (14L, "x a b")    // no tri, bi "a b": 1+bin(2 div 2)=2 bits, lvl 2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.backoffSurprisal(scored, ref).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_tri"),
         r.getAs[Long]("n_bi"), r.getAs[Long]("n_uni"),
         r.getAs[Long]("total_bits"))).toMap
    assert(out(10L) == ((1L, 1L, 0L, 0L, 1L)))
    assert(out(11L) == ((1L, 0L, 0L, 1L, 4L)))
    assert(out(14L) == ((1L, 0L, 1L, 0L, 2L)))
    // OOV floor: wholly unseen text pays the full width at every gram
    val oov = TextAnalysis.backoffSurprisal(
        Seq((20L, "p q r")).toDF("doc_id", "text"), ref).collect()
    assert(oov.head.getAs[Long]("total_bits") == 2L + 3L) // 2 + bin(6 div 1)
  }

  test("dataCard: exact integer summary per slice") {
    val docs = Seq(
      (1L, "alpha beta", "web", "en"),
      (2L, "alpha  BETA", "web", "en"),  // exact-dup of 1 after normalise
      (3L, "gamma", "web", "en"),
      (4L, "delta epsilon zeta", "books", "de")
    ).toDF("doc_id", "text", "source", "lang")
    val card = TextAnalysis.dataCard(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
         r.getLong(6), r.getLong(7))).toMap
    // web/en: 3 docs, 2+2+1 tokens, 10+11+5 chars, 2 unique texts, ids 1..3
    assert(card(("web", "en")) == ((3L, 5L, 26L, 2L, 1L, 3L)))
    assert(card(("books", "de")) == ((1L, 3L, 18L, 1L, 4L, 4L)))
  }

  test("qualityWeightedSample keeps better docs at higher rates, deterministically") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val kept = TextAnalysis.qualityWeightedSample(docs)
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = TextAnalysis.qualityWeightedSample(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2 && ids1.nonEmpty)
    // empirical monotonicity: keep-rate of the top quality quartile beats
    // the bottom quartile
    val scored = docs
      .withColumn("q", TextAnalysis.qualityScore(col("text")))
      .withColumn("quartile", ntile(4).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("q"))))
      .select(col("doc_id"), col("quartile")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    def rate(quartile: Int): Double = {
      val members = scored.filter(_._2 == quartile).keySet
      members.count(ids1).toDouble / members.size
    }
    assert(rate(4) > rate(1),
      s"top-quartile keep rate ${rate(4)} <= bottom ${rate(1)}")
    intercept[IllegalArgumentException] {
      TextAnalysis.qualityWeightedSample(docs, floorRate = 0.5, span = 0.6)
    }
  }

  test("cleanHtml strips script/style/tags, decodes entities, collapses ws") {
    val df = Seq(
      (1L, "<html><head><style>body { color: red; }</style>" +
        "<script src=\"a.js\">var x = '<p>';</script></head>" +
        "<body><h1>Title</h1><p class=\"x\">Hello &amp; welcome," +
        "&nbsp;&quot;friends&quot; &lt;here&gt;.</p>\n<div>Bye</div>" +
        "</body></html>"),
      (2L, "no markup at   all"),
      (3L, "broken <tag and <b>bold</b> &#39;quoted&#39;")
    ).toDF("doc_id", "html")
    val out = df.select(col("doc_id"),
        TextAnalysis.cleanHtml(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "Title Hello & welcome, \"friends\" <here>. Bye")
    assert(out(2L) == "no markup at all")
    // the unclosed "<tag and <b>" span is one tag per the tolerant grammar
    assert(out(3L) == "broken bold 'quoted'")
  }

  test("winnowing fingerprints: guarantee and exclusions") {
    import graft.operators.TextAnalysis
    val k = 8; val w = 8
    val common = "the quick brown fox jumps over the lazy dog near the river"
    val df = Seq(
      1L -> common,
      2L -> common,                           // identical
      3L -> (common + " and beyond the old mill"), // shares a long run
      4L -> "completely different words entirely unrelated to anything else",
      5L -> "short")                          // < k+w-1 chars: excluded
      .toDF("doc_id", "text")
    val out = TextAnalysis.winnowFingerprints(df, k, w).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(!out.contains(5L)) // below one full window: no sketch
    assert(out(1L) == out(2L)) // identical docs -> identical sketch
    // winnowing guarantee: docs sharing a substring of length >= w+k-1
    // share at least one fingerprint; unrelated docs share none here
    val sets = TextAnalysis.winnowFingerprintSet(df, k, w).collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(sets(1L) == sets(2L))
    assert((sets(1L) intersect sets(3L)).nonEmpty)
    assert((sets(1L) intersect sets(4L)).isEmpty)
    assert(out(1L)._1 == sets(1L).size.toLong)
  }

  test("contamination flags corpus docs covering a benchmark item") {
    val bench = Seq(100L -> "the quick brown fox jumps over the lazy dog")
      .toDF("doc_id", "text")
    val corpus = Seq(
      1L -> "prefix words the quick brown fox jumps over the lazy dog suffix",
      2L -> "the quick brown fox appears only partially here",
      3L -> "entirely unrelated content about other things entirely")
      .toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, bench, threshold = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getDouble(4))).toMap
    // doc 1 contains the whole benchmark text -> full coverage
    assert(out.contains(1L) && out(1L)._2 == 1.0)
    // doc 2 shares only a prefix (< 50% of the bench shingles), 3 nothing
    assert(!out.contains(2L) && !out.contains(3L))
  }

  test("curation verdicts: first failing rule wins, canonical copy survives") {
    import graft.operators.TextAnalysis
    // quality's length component wants >= 500 chars: 80 distinct words,
    // zero stopwords/punctuation -> quality 1.0, all bigrams unique
    val good = (1 to 80).map(i => f"word$i%03d").mkString(" ")
    val df = Seq(
      1L -> good,                       // keeps
      2L -> good,                       // exact dup of 1 -> "duplicate"
      3L -> "a b a b a b a b a b a b",  // repetitive (and low quality)
      4L -> "!!! ??? ... ,,, ;;; :::")  // punct-heavy -> low quality
      .toDF("doc_id", "text")
    val v = TextAnalysis.curate(df).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(4), Option(r.getString(5)))).toMap
    assert(v(1L) == ((true, None)))
    assert(v(2L) == ((false, Some("duplicate"))))
    // rule order: low_quality fires before repetitive for doc 3
    assert(v(3L)._1 == false &&
      Seq("low_quality", "repetitive").contains(v(3L)._2.get))
    assert(v(4L) == ((false, Some("low_quality"))))
  }

  test("repetition metrics flag degenerate bigram loops") {
    import graft.operators.TextAnalysis
    val df = Seq(
      1L -> "a b a b a b a b",   // "a b" x4, "b a" x3: heavy repetition
      2L -> "one two three four five six") // all bigrams unique
      .toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: 7 bigrams, 2 distinct, max count 4
    assert(m(1L).getAs[Long]("n_2grams") == 7)
    assert(m(1L).getAs[Long]("n_distinct") == 2)
    assert(m(1L).getAs[Long]("max_2gram_count") == 4)
    assert(m(1L).getAs[Double]("dup_frac") > 0.7)
    assert(m(2L).getAs[Double]("dup_frac") == 0.0)
    assert(m(2L).getAs[Double]("top_frac") == 1.0 / 5.0)
  }

  test("pii metrics count urls/emails and mask deterministically") {
    import graft.operators.TextAnalysis
    val df = Seq(
      1L -> "see https://a.io/x and http://b.co contact bob@corp.com",
      2L -> "plain text with no contact details at all")
      .toDF("doc_id", "text")
    val m = TextAnalysis.piiMetrics(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Int]("n_urls") == 2)
    assert(m(1L).getAs[Int]("n_emails") == 1)
    assert(m(2L).getAs[Int]("n_urls") == 0 && m(2L).getAs[Int]("n_emails") == 0)
    // masked key of doc 2 equals the hash of its unmodified text
    val plainHash = df.filter(col("doc_id") === 2L)
      .select(md5(col("text"))).head().getString(0)
    assert(m(2L).getAs[String]("masked_key") == plainHash)
    assert(m(1L).getAs[String]("masked_key") != plainHash)
  }

  test("winnowing kernel matches the relational formulation on the corpus") {
    import graft.operators.TextAnalysis
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val kern = TextAnalysis.winnowFingerprintSet(docs, 8, 8).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val rel = TextAnalysis.winnowFingerprintSetRelational(docs, 8, 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(kern == rel)
    assert(kern.nonEmpty)
  }

  test("fingerprint is invariant to word order and repetition") {
    val df = Seq(
      (1L, "b a c a b"), (2L, "a b c"), (3L, "a b d")).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"), TextAnalysis.fingerprint(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("quality score stays in [0,1]") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val bad = docs.select(TextAnalysis.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0.0 || col("q") > 1.0).count()
    assert(bad == 0)
  }
}

class MultimodalSpec extends SparkSpec {

  test("averageHashBits: decode-exact bits, same-seed collision, block downsample") {
    // decoded pattern pixels are a pure function of the seed: recompute
    // the expected bits arithmetically
    def expected(seed: Long): String = {
      val gray = for (y <- 0 until 8; x <- 0 until 8)
        yield (seed * 31 + x * 7 + y * 13) % 256
      val mean = gray.sum / 64
      gray.map(g => if (g > mean) '1' else '0').mkString
    }
    val h7 = Multimodal.averageHashBits(
      Multimodal.syntheticPatternPng(7L)).get
    assert(h7 == expected(7L))
    assert(h7.length == 64 && h7.exists(_ == '1') && h7.exists(_ == '0'))
    // identical seeds → identical hashes (the near-dup grouping key)
    assert(Multimodal.averageHashBits(
      Multimodal.syntheticPatternPng(7L)).get == h7)
    // a 16×16 render of the same pattern block-averages to exact cells
    val big = Multimodal.averageHashBits(
      Multimodal.syntheticPatternPng(7L, size = 16))
    assert(big.isDefined && big.get.length == 64)
    // non-image payloads and non-divisible shapes are rejected, not wrong
    assert(Multimodal.averageHashBits("not a png".getBytes).isEmpty)
  }

  test("feature extraction pipeline produces per-kind aggregates") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val out = Multimodal.pipeline(docs).collect()
    assert(out.map(_.getString(0)).toSet == Set("image", "audio", "video"))
    assert(out.map(_.getAs[Long]("n_media")).sum == docs.count())
  }

  test("thumbBox preserves aspect ratio within the box") {
    assert(Multimodal.thumbBox(640, 480) == (64, 48))
    assert(Multimodal.thumbBox(480, 640) == (48, 64))
    assert(Multimodal.thumbBox(0, 100) == (0, 0))
    assert(Multimodal.thumbBox(10000, 1) == (64, 1))
  }

  test("typed feature extraction yields one row per media row") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val media = Multimodal.fromDocuments(docs)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == docs.count())
    val f = feats.head()
    assert(f.n_bytes > 0 && f.byte_mean > 0)
    // synthetic text payloads are not decodable images — all stub-routed
    assert(feats.filter(_.decoded).count() == 0)
  }

  /** Golden 2×2 PNG: pixels (255,0,0),(0,255,0),(0,0,255),(255,255,255).
    * PNG is lossless, so decode must return EXACT dimensions and the exact
    * channel mean: (255*3 + 255*3) / (3*4) = 127.5... compute precisely. */
  private def goldenPng(): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    im.setRGB(0, 0, 0xff0000)
    im.setRGB(1, 0, 0x00ff00)
    im.setRGB(0, 1, 0x0000ff)
    im.setRGB(1, 1, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", bos)
    bos.toByteArray
  }

  test("real ImageIO decode: golden 2x2 PNG gives exact pixel stats") {
    val stats = Multimodal.decodeImage(goldenPng()).get
    assert(stats.width == 2 && stats.height == 2)
    // channel sum: 255 (red) + 255 (green) + 255 (blue) + 765 (white) = 1530
    assert(stats.pixelMean == 1530.0 / 12.0)
    // garbage payloads must route to the fallback, not throw
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
  }

  test("image rows with real payloads decode through the full pipeline") {
    import spark.implicits._
    val png = goldenPng()
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png, 9999, 9999, 0),
      Multimodal.MediaRow(2L, "image", "junk".getBytes, 320, 240, 0),
      Multimodal.MediaRow(3L, "audio", png, 0, 0, 16000)).toDS()
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    // decoded image: TRUE dims (2x2) win over envelope lies (9999x9999)
    assert(feats(1L).decoded && feats(1L).img_width == 2 &&
      feats(1L).img_height == 2 && feats(1L).thumb_width == 64)
    assert(feats(1L).pixel_mean == 1530.0 / 12.0)
    // undecodable image: envelope dims drive the thumbnail, stub stats
    assert(!feats(2L).decoded && feats(2L).img_width == -1 &&
      feats(2L).thumb_width == 64 && feats(2L).thumb_height == 48)
    // audio kind never routes through ImageIO even with a PNG payload
    assert(!feats(3L).decoded)
  }

  test("real javax.sound decode: synthetic WAV gives exact audio stats") {
    // seed 42: amplitude 142, frames 160 + (42%16)*10 = 260
    val stats = Multimodal.decodeAudio(Multimodal.syntheticWav(42L)).get
    assert(stats.sampleRate == 8000 && stats.channels == 1)
    assert(stats.frames == 260L)
    // alternating ±142 square wave: RMS is exactly the amplitude
    assert(stats.rms == 142.0)
    // garbage payloads must route to the fallback, not throw
    assert(Multimodal.decodeAudio("not audio".getBytes).isEmpty)
    assert(Multimodal.decodeAudio(Array.empty[Byte]).isEmpty)
    // a PNG is not audio either
    assert(Multimodal.decodeAudio(goldenPng()).isEmpty)
  }

  test("real MJPEG-AVI demux: container truth exact, first frame decoded") {
    // seed 42: 3 + 42%5 = 5 frames, 20000 + 2*1000 = 22000 us/frame,
    // 2+42%7 = 2 wide, 2+42%5 = 4 high, gray (42*11)%256 = 206
    val stats = Multimodal.decodeVideo(Multimodal.syntheticAvi(42L)).get
    assert(stats.width == 2 && stats.height == 4)
    assert(stats.nFrames == 5 && stats.usPerFrame == 22000)
    assert(stats.durationMs == 5L * 22000 / 1000)
    // JPEG is lossy: the decoded solid-gray mean lands near 206
    assert(math.abs(stats.firstFramePixelMean - 206.0) < 8.0,
      s"pixel mean ${stats.firstFramePixelMean}")
    // malformed payloads route to the fallback, never throw
    assert(Multimodal.decodeVideo("not a riff".getBytes).isEmpty)
    assert(Multimodal.decodeVideo(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeVideo(goldenPng()).isEmpty)
    // truncated AVI (sizes run past the buffer) aborts cleanly
    val avi = Multimodal.syntheticAvi(7L)
    assert(Multimodal.decodeVideo(
      java.util.Arrays.copyOfRange(avi, 0, 20)).isEmpty)
  }

  test("video rows with real AVI payloads decode through the full pipeline") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(7L, "video", Multimodal.syntheticAvi(7L), 0, 0, 0),
      Multimodal.MediaRow(8L, "video", "junk".getBytes, 9, 9, 0),
      // image kind never routes through the demuxer, even with AVI bytes
      Multimodal.MediaRow(9L, "image", Multimodal.syntheticAvi(9L), 1, 1, 0))
      .toDS()
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    // seed 7: 3+7%5=5 frames, 20000+7000 us, w=2+7%7=2... 7%7=0 -> w=2, h=2+7%5=4
    assert(feats(7L).decoded && feats(7L).vid_frames == 5 &&
      feats(7L).vid_us_per_frame == 27000 && feats(7L).vid_width == 2 &&
      feats(7L).vid_height == 4 &&
      feats(7L).vid_duration_ms == 5L * 27000 / 1000)
    // demuxed dimensions drive the thumbnail, not the envelope
    assert(feats(7L).thumb_width > 0)
    assert(!feats(8L).decoded && feats(8L).vid_frames == -1)
    assert(!feats(9L).decoded && feats(9L).vid_frames == -1)
  }

  test("audio rows with real WAV payloads decode through the full pipeline") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(7L, "audio", Multimodal.syntheticWav(7L), 0, 0, 0),
      Multimodal.MediaRow(8L, "audio", "junk".getBytes, 0, 0, 16000),
      // image kind never routes through the audio codec, even with WAV bytes
      Multimodal.MediaRow(9L, "image", Multimodal.syntheticWav(9L), 1, 1, 0))
      .toDS()
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    // seed 7: amplitude 107, frames 160 + 7*10 = 230
    assert(feats(7L).decoded && feats(7L).aud_sample_rate == 8000 &&
      feats(7L).aud_channels == 1 && feats(7L).aud_frames == 230L &&
      feats(7L).aud_rms == 107.0)
    assert(!feats(8L).decoded && feats(8L).aud_frames == -1L)
    assert(!feats(9L).decoded && feats(9L).aud_frames == -1L)
  }
}
