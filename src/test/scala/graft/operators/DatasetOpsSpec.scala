package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DatasetOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit is deterministic, exhaustive and roughly proportional") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val a = DatasetOps.hashSplit(docs).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = DatasetOps.hashSplit(docs).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b) // pure function of (salt, id)
    val n = docs.count()
    assert(a.values.sum == n) // every doc gets exactly one label
    assert(a("train").toDouble / n > 0.8 && a("train").toDouble / n < 0.97)
    // a different salt reshuffles membership but keeps determinism
    val c = DatasetOps.hashSplit(docs, salt = "other")
      .filter(col("split") === "train").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val aTrain = DatasetOps.hashSplit(docs)
      .filter(col("split") === "train").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(c != aTrain)
    intercept[IllegalArgumentException] {
      DatasetOps.hashSplit(docs, fractions = Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("stratifiedSplit holds exact per-stratum proportions") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val split = DatasetOps.stratifiedSplit(docs, "lang")
    assert(split.count() == docs.count()) // exhaustive, one label per doc
    val per = split.groupBy("lang", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val n = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    n.foreach { case (lang, cnt) =>
      val train = per.getOrElse((lang, "train"), 0L)
      val vali = per.getOrElse((lang, "val"), 0L)
      // exact ppm cuts: train = floor(0.8n), train+val = floor(0.9n)
      assert(train == cnt * 800000L / 1000000L, s"train cut off for $lang")
      assert(train + vali == cnt * 900000L / 1000000L, s"val cut off for $lang")
      // the property hashSplit cannot give: every stratum of >=10 docs
      // has a non-empty val AND test set
      if (cnt >= 10) {
        assert(vali >= 1 && per.getOrElse((lang, "test"), 0L) >= 1)
      }
    }
    // pure function of (salt, id): re-runs agree row-for-row
    val a = split.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = DatasetOps.stratifiedSplit(docs, "lang")
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    intercept[IllegalArgumentException] {
      DatasetOps.stratifiedSplit(docs, "lang",
        fractions = Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("mixtureSample hits per-group target rates, deterministically") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Map("en" -> 0.6, "de" -> 0.3)
    val kept = DatasetOps.mixtureSample(docs, "lang", rates, 0.15)
    val perLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, n) =>
      val rate = rates.getOrElse(lang, 0.15)
      assert(perLang.getOrElse(lang, 0L) == math.ceil(n * rate).toLong,
        s"$lang: ${perLang.get(lang)} of $n at rate $rate")
    }
    // deterministic: a second run keeps the same ids
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = DatasetOps.mixtureSample(docs, "lang", rates, 0.15)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    // rate monotonicity: a lower rate keeps a PREFIX of the same
    // permutation — recipes compose without reshuffling membership
    val half = DatasetOps.mixtureSample(docs, "lang",
        Map("en" -> 0.3, "de" -> 0.15), 0.075)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(ids1))
    intercept[IllegalArgumentException] {
      DatasetOps.mixtureSample(docs, "lang", Map("en" -> 1.5), 0.1)
    }
  }

  test("tokenBudgetSelect: budget respected, best buckets fill first") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val budget = 12000L
    val kept = DatasetOps.tokenBudgetSelect(docs, budget).collect()
    val total = kept.map(_.getAs[Long]("n_tokens")).sum
    assert(total <= budget && total > budget / 2, s"kept $total of $budget")
    // deterministic
    val again = DatasetOps.tokenBudgetSelect(docs, budget).collect()
    assert(kept.map(_.getAs[Long]("doc_id")).toSet ==
      again.map(_.getAs[Long]("doc_id")).toSet)
    // bucket structure: full buckets from the top, at most one partial,
    // none below it
    val keptByBucket = kept.groupBy(_.getAs[Int]("q_bucket"))
      .view.mapValues(_.length).toMap
    val allByBucket = DatasetOps
      .tokenBudgetSelect(docs, Long.MaxValue).collect()
      .groupBy(_.getAs[Int]("q_bucket")).view.mapValues(_.length).toMap
    val partials = allByBucket.keys.toSeq.sorted(Ordering.Int.reverse)
      .map(b => (b, keptByBucket.getOrElse(b, 0), allByBucket(b)))
    val firstNotFull = partials.indexWhere { case (_, k, n) => k < n }
    assert(firstNotFull >= 0)
    partials.take(firstNotFull).foreach { case (b, k, n) =>
      assert(k == n, s"bucket $b not fully kept above the cutoff")
    }
    partials.drop(firstNotFull + 1).foreach { case (b, k, _) =>
      assert(k == 0, s"bucket $b kept docs below the cutoff")
    }
  }

  test("chunkDocuments: exact boundaries, overlap, lossless coverage") {
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"), // 10 toks, chunk 8 ov 2
      (2L, "a b c"),                           // shorter than one chunk
      (3L, "x")                                // single token
    ).toDF("doc_id", "text")
    val out = DatasetOps.chunkDocuments(docs, chunkTokens = 8, overlap = 2)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("chunk_id"))
        .map(r => (r.getAs[String]("chunk_text"),
          r.getAs[Int]("n_chunk_tokens"))).toSeq).toMap
    assert(out(1L) == Seq(
      ("t1 t2 t3 t4 t5 t6 t7 t8", 8),
      ("t7 t8 t9 t10", 4)))         // starts at stride 6, overlaps t7 t8
    assert(out(2L) == Seq(("a b c", 3)))
    assert(out(3L) == Seq(("x", 1)))
    // coverage: dropping each chunk's first `overlap` tokens (except the
    // first chunk) and concatenating reconstructs the document
    val rebuilt = out(1L).zipWithIndex.map { case ((t, _), i) =>
      val toks = t.split(" ")
      if (i == 0) toks else toks.drop(2)
    }.flatten.mkString(" ")
    assert(rebuilt == "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")
    intercept[IllegalArgumentException] {
      DatasetOps.chunkDocuments(docs, chunkTokens = 8, overlap = 8)
    }
  }

  test("balancedSample caps each group deterministically") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val quota = 7L
    val kept = DatasetOps.balancedSample(docs, "lang", quota)
    val perLang = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, n) =>
      assert(n == math.min(quota, totals(lang)), lang)
    }
    // deterministic: same ids on a re-run; different salt -> different set
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = DatasetOps.balancedSample(docs, "lang", quota)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
    val other = DatasetOps.balancedSample(docs, "lang", quota, salt = "x")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(other != ids1)
  }

  test("deterministicShuffle equals the global rank on any partition layout") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    // the reference semantics: one global row_number over (draw, id) —
    // correct but single-task; the operator must reproduce it exactly
    val draw = md5(concat(lit("epoch0|"), col("doc_id").cast("string")))
    val naive = docs.select(col("doc_id"), draw.as("draw"))
      .withColumn("shuffle_rank",
        row_number().over(Window.orderBy(col("draw"), col("doc_id")))
          .cast("long"))
      .withColumn("epoch_batch",
        ((col("shuffle_rank") - 1) / 64).cast("long"))
      .select("doc_id", "shuffle_rank", "epoch_batch")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    def got(df: org.apache.spark.sql.DataFrame, buckets: Int) =
      DatasetOps.deterministicShuffle(df, 64L, shuffleBuckets = buckets)
        .select("doc_id", "shuffle_rank", "epoch_batch")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1)
    assert(got(docs, 256).sameElements(naive))
    // partition layout must not change the permutation
    assert(got(docs.repartition(7), 256).sameElements(naive))
    assert(got(docs.repartition(1), 256).sameElements(naive))
    // bucket count is an internal knob, not a semantic one
    assert(got(docs, 3).sameElements(naive))
    assert(got(docs, 100000).sameElements(naive))
    // scale shape: no unpartitioned window over a row-scale input — the
    // only global window allowed is the one over the bucket-count agg
    val audited = graft.tools.ExplainAudit.audit(
      DatasetOps.deterministicShuffle(docs, 64L), "deterministic_shuffle")
    assert(audited.isEmpty, audited.mkString("\n"))
  }

  test("shardManifest equals the global-order manifest; volumes conserved") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val shardTokens = 500L
    val got = DatasetOps.shardManifest(docs, shardTokens)
      .orderBy("shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    // reference semantics: one global cumsum over (draw, id) — correct
    // but single-task; the bucketed operator must reproduce it exactly
    val draw = md5(concat(lit("shard0|"), col("doc_id").cast("string")))
    val w = Window.orderBy(col("draw"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = docs.select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        draw.as("draw"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("shard_id", expr(s"(cum - n_tokens) div $shardTokens"))
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tok_sum"),
        min(col("cum") - col("n_tokens")).as("start_tokens"),
        max(col("cum")).as("end_tokens"),
        md5(concat_ws(",", transform(
          array_sort(collect_list(struct(col("cum"), col("doc_id")))),
          s => s.getField("doc_id").cast("string")))).as("id_checksum"))
      .orderBy("shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(got.sameElements(naive))
    // conservation: every doc and token lands in exactly one shard
    assert(got.map(_._2).sum == docs.count())
    val totalToks = docs.agg(sum(TextAnalysis.tokenCount(col("text"))))
      .head().getLong(0)
    assert(got.map(_._3).sum == totalToks)
    // shard ids are contiguous from 0 and each shard STARTS inside its
    // own token range (a straddling doc may push end_tokens past it)
    assert(got.map(_._1).sameElements(got.indices.map(_.toLong)))
    got.foreach { case (id, _, _, start, _, _) =>
      assert(start >= id * shardTokens && start < (id + 1) * shardTokens)
    }
    // partition layout must not change the manifest
    val reparted = DatasetOps.shardManifest(docs.repartition(7), shardTokens)
      .orderBy("shard_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))
    assert(reparted.sameElements(naive))
    // scale shape: only the bounded bucket-agg window is global
    val audited = graft.tools.ExplainAudit.audit(
      DatasetOps.shardManifest(docs, shardTokens), "shard_manifest")
    assert(audited.isEmpty, audited.mkString("\n"))
  }

  test("upsampleMixture: exact copy counts, 0-based epochs, volumes") {
    import spark.implicits._
    val docs = ((1L to 4L).map(i => (i, "a")) ++
      (5L to 9L).map(i => (i, "b")) ++
      (10L to 12L).map(i => (i, "c"))).toDF("doc_id", "grp")
    val out = DatasetOps.upsampleMixture(docs, "grp",
      ratesPpm = Map("a" -> 2500000L, "b" -> 400000L),
      defaultPpm = 1000000L)
    val byGrp = out.groupBy("grp")
      .agg(count(lit(1)).as("rows"),
        countDistinct(col("doc_id")).as("docs"),
        max(col("epoch")).as("maxe"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // a: 4·2 whole + floor(4·0.5) fractional = 10 rows over all 4 docs,
    // the 2 prefix docs at 3 copies (max epoch 2)
    assert(byGrp("a") == ((10L, 4L, 2L)))
    // b: floor(5·0.4) = 2 rows, 2 docs, epoch 0 only
    assert(byGrp("b") == ((2L, 2L, 0L)))
    // c: identity — every doc exactly once
    assert(byGrp("c") == ((3L, 3L, 0L)))
    // per-doc epochs are dense from 0
    val epochs = out.filter(col("grp") === "a")
      .groupBy("doc_id").agg(collect_list(col("epoch")).as("es"))
      .collect().map(_.getSeq[Long](1).sorted)
    assert(epochs.forall(es => es == (0L until es.size).toSeq))
  }

  test("allocateBudget: exact Hamilton apportionment, sums to budget") {
    import spark.implicits._
    val stats = Seq(("a", 5L), ("b", 3L), ("c", 2L))
      .toDF("source", "n_tokens")
    val out = DatasetOps.allocateBudget(stats, budget = 7L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // quotas 3/2/1 (sum 6), remainders 5/1/4 → the single leftover seat
    // goes to a (largest remainder)
    assert(out == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    assert(out.values.sum == 7L)
    // remainder ties break to the smaller group name
    val tied = DatasetOps.allocateBudget(
      Seq(("x", 1L), ("y", 1L)).toDF("source", "n_tokens"), budget = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(tied == Map("x" -> 2L, "y" -> 1L))
  }

  test("snapshotDiff classifies added/removed/changed/unchanged by hash") {
    import spark.implicits._
    val a = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val b = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = DatasetOps.snapshotDiff(a, b).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("temperatureSample keeps floor(sqrt(n_min·n_g)) per group") {
    import spark.implicits._
    // groups of 100 / 25 / 4 docs → n_min = 4 → keep 20 / 10 / 4
    val docs = ((1L to 100L).map(i => (i, "a")) ++
      (101L to 125L).map(i => (i, "b")) ++
      (126L to 129L).map(i => (i, "c"))).toDF("doc_id", "grp")
    val kept = DatasetOps.temperatureSample(docs, "grp")
    val counts = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 20L, "b" -> 10L, "c" -> 4L))
    // the kept set is the same rank-permutation prefix balancedSample
    // uses: quota = k_g with the same salt reproduces it exactly
    val ids = kept.select("doc_id").as[Long].collect().toSet
    val viaQuota =
      DatasetOps.balancedSample(docs.filter(col("grp") === "a"), "grp",
        perGroupQuota = 20L, salt = "temp")
        .unionByName(DatasetOps.balancedSample(
          docs.filter(col("grp") === "b"), "grp", 10L, salt = "temp"))
        .unionByName(DatasetOps.balancedSample(
          docs.filter(col("grp") === "c"), "grp", 4L, salt = "temp"))
        .select("doc_id").as[Long].collect().toSet
    assert(ids == viaQuota)
    // deterministic under physical layout changes
    val again = DatasetOps.temperatureSample(docs.repartition(7), "grp")
      .select("doc_id").as[Long].collect().toSet
    assert(again == ids)
    val audited = graft.tools.ExplainAudit.audit(
      DatasetOps.temperatureSample(docs, "grp"), "temperature_sample")
    assert(audited.isEmpty, audited.mkString("\n"))
  }

  test("packSequences: contiguous bins, budget respected, oversized isolated") {
    val docs = Seq(
      (1L, "en", "a b c"),            // 3 tokens
      (2L, "en", "d e f g"),          // 4 -> cum 7
      (3L, "en", (1 to 12).map(i => s"w$i").mkString(" ")), // 12 -> cum 19
      (4L, "en", "x y"),              // 2 -> cum 21
      (5L, "fr", "un deux trois"))    // separate pack key
      .toDF("doc_id", "lang", "text")
    val out = DatasetOps.packSequences(docs, tokenBudget = 10L,
        packKey = "lang")
      .collect().map(r => r.getLong(1) -> (r.getString(0), r.getLong(4)))
      .toMap
    // bins: doc1 starts at 0 -> bin 0; doc2 starts at 3 -> bin 0;
    // doc3 starts at 7 -> bin 0 (greedy first-fit: starts in the open bin);
    // doc4 starts at 19 -> bin 1; fr doc packs independently from 0
    assert(out(1L) == (("en", 0L)) && out(2L) == (("en", 0L)))
    assert(out(3L) == (("en", 0L)))
    assert(out(4L) == (("en", 1L)))
    assert(out(5L) == (("fr", 0L)))
    // bins are contiguous in id order per key
    val bins = DatasetOps.packSequences(docs, 10L, "lang")
      .filter(col("lang") === "en").orderBy("doc_id")
      .collect().map(_.getLong(4))
    assert(bins.sameElements(bins.sorted))
  }

  test("q376: shuffle dispersion — docs conserved, decile shares bounded, " +
      "hot >= uniform >= cold") {
    val dir = sf("sf0.001")
    val out = graft.queries.PipelineQueries
      .defs("q376_shuffle_dispersion")(spark, dir).collect()
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum === nDocs)
    out.foreach { r =>
      val hot = r.getAs[Long]("hot_decile_ppm")
      val cold = r.getAs[Long]("cold_decile_ppm")
      val mean = r.getAs[Long]("mean_pos_ppm")
      // the max decile holds at least a uniform share, the min at most
      // (both up to integer-floor slack on tiny sources)
      assert(hot >= 99000L && hot <= 1000000L, s"hot=$hot")
      assert(cold >= 0L && cold <= 100001L, s"cold=$cold")
      assert(hot >= cold)
      assert(mean > 0L && mean <= 1000000L)
    }
  }
}
