package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the TPC-H remainder shapes (q176–q187) and the
  * curation extras (q188–q190) — properties the DuckDB hash gate can't
  * state (cross-row conservation, determinism across runs, per-group
  * caps). Oracle equivalence itself is covered by the driver gate. */
class TpchShapesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q176: every returned part is at its type's minimum retail price") {
    val out = TpchShapes.defs("q176_min_price_supplier")(spark, dir)
    val mins = graft.Tables.load(spark, dir, "part")
      .groupBy(col("p_type").as("t")).agg(min(col("p_retailprice")).as("m"))
    val priced = out
      .join(graft.Tables.load(spark, dir, "part")
        .select(col("p_partkey").as("pk"), col("p_retailprice")),
        col("p_partkey") === col("pk"))
      .join(mins, col("p_type") === col("t"))
    assert(priced.filter(col("p_retailprice") =!= col("m")).count() === 0L)
  }

  test("q181: high + low line counts conserve the joined row count") {
    val out = TpchShapes.defs("q181_priority_class_matrix")(spark, dir)
      .agg(sum(col("high_line_count") + col("low_line_count"))).head.getLong(0)
    val lo = lit("1996-01-01").cast("timestamp")
    val hi = lit("1997-01-01").cast("timestamp")
    val joined = graft.Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
      .join(graft.Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(out === joined)
  }

  test("q182: custdist conserves the customer universe, zero bucket included") {
    val out = TpchShapes.defs("q182_order_count_distribution")(spark, dir)
    val total = out.agg(sum(col("custdist"))).head.getLong(0)
    assert(total === graft.Tables.load(spark, dir, "customer").count())
  }

  test("q183: the top supplier's revenue is the global max") {
    val out = TpchShapes.defs("q183_top_supplier")(spark, dir)
    assert(out.count() >= 1L)
    assert(out.select(countDistinct(col("total_revenue"))).head.getLong(0)
      === 1L)
  }

  test("q186: sole-returned suppliers carry positive waits") {
    val out = TpchShapes.defs("q186_sole_returned_supplier")(spark, dir)
    assert(out.filter(col("numwait") <= 0).count() === 0L)
  }

  test("q188: fuzzy pairs are ordered, blocked, and within distance") {
    val out = CurationExtras.defs("q188_fuzzy_name_match")(spark, dir)
    assert(out.filter(col("name_a") >= col("name_b")).count() === 0L)
    assert(out.filter(col("dist") > CurationExtras.FuzzyMaxDist).count()
      === 0L)
    // blocked on the noun: both names end in the same second token
    assert(out.filter(
      split(col("name_a"), " ").getItem(1) =!=
        split(col("name_b"), " ").getItem(1)).count() === 0L)
  }

  test("q189: hash sample is capped per source and run-deterministic") {
    val a = CurationExtras.defs("q189_hash_sample")(spark, dir)
    val perSource = a.groupBy(col("source")).agg(count(lit(1)).as("n"))
    assert(perSource.filter(
      col("n") > CurationExtras.SamplePerSource).count() === 0L)
    val b = CurationExtras.defs("q189_hash_sample")(spark, dir)
    assert(a.exceptAll(b).count() === 0L && b.exceptAll(a).count() === 0L)
  }

  test("q195: supplier counts never exceed the non-excluded universe") {
    val out = TpchShapes.defs("q195_part_supplier_counts")(spark, dir)
    val good = graft.Tables.load(spark, dir, "supplier")
      .filter(col("s_acctbal") >= 0).count()
    assert(out.filter(col("supplier_cnt") > good).count() === 0L)
  }

  test("q196: every dominant supplier sits in the AMERICA region") {
    val out = TpchShapes.defs("q196_dominant_suppliers")(spark, dir)
    val amer = graft.Tables.load(spark, dir, "nation")
      .join(graft.Tables.load(spark, dir, "region")
        .filter(col("r_name") === "AMERICA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"))
    assert(out.join(amer, Seq("n_name"), "left_anti").count() === 0L)
  }

  test("q191: overdispersion totals conserve the event count") {
    val out = CurationExtras.defs("q191_event_overdispersion")(spark, dir)
    assert(out.agg(sum(col("total"))).head.getLong(0) ===
      graft.Tables.load(spark, dir, "events").count())
    assert(out.filter(col("fano_ppm") < 0).count() === 0L)
  }

  test("q192: KMV pair estimates respect sketch-algebra bounds") {
    val out = CurationExtras.defs("q192_kmv_source_similarity")(spark, dir)
    val nSrc = graft.Tables.load(spark, dir, "documents")
      .select(col("source")).distinct().count()
    assert(out.count() === nSrc * (nSrc - 1) / 2)
    assert(out.filter(col("inter_cnt") > col("n_u")).count() === 0L)
    assert(out.filter(col("jaccard_ppm") > 1000000L).count() === 0L)
    assert(out.filter(col("inter_est") > col("union_est")).count() === 0L)
  }

  test("q193: every anomaly clears its integral fence") {
    val out = CurationExtras.defs("q193_daily_anomaly")(spark, dir)
    val bad = out.filter(
      (col("direction") === "high" &&
        !(col("revenue") > col("trailing_median") *
          CurationExtras.AnomalyHighX)) ||
      (col("direction") === "low" &&
        !(col("revenue") * CurationExtras.AnomalyLowDiv <
          col("trailing_median"))))
    assert(bad.count() === 0L)
  }

  test("q197: co-occurrence counts stay within their marginals") {
    val out = CurationExtras.defs("q197_session_cooccurrence")(spark, dir)
    assert(out.filter(col("n_ab") > col("n_a") ||
      col("n_ab") > col("n_b")).count() === 0L)
    assert(out.filter(col("support_ppm") > 1000000L).count() === 0L)
  }

  test("q198: every phrase hit contains the phrase verbatim") {
    val out = CurationExtras.defs("q198_phrase_search")(spark, dir)
    val phrase = CurationExtras.PhraseTerms.mkString(" ")
    val withText = out.join(
      graft.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text")), "doc_id")
    assert(withText.filter(!col("text").contains(phrase)).count() === 0L)
    assert(out.filter(col("n_occurrences") <= 0).count() === 0L)
  }

  test("q199: clustering coefficients stay in [0, 1e6] ppm") {
    val out = PipelineQueries.defs("q199_clustering_coefficient")(spark, dir)
    assert(out.filter(col("coeff_ppm") < 0 ||
      col("coeff_ppm") > 1000000L).count() === 0L)
    assert(out.filter(col("deg") < 2).count() === 0L)
  }

  test("q200: a customer's first order has an empty prior history") {
    val out = CurationExtras.defs("q200_pit_features")(spark, dir)
    // monotone within customer: prior_orders = 0 implies prior_spend = 0
    assert(out.filter(col("prior_orders") === 0 &&
      col("prior_spend") =!= 0.0).count() === 0L)
    assert(out.filter(col("prior_orders") < 0 ||
      col("prior_spend") < 0).count() === 0L)
  }

  test("q201: FD audit separates holding from violated dependencies") {
    val rows = CurationExtras.defs("q201_fd_audit")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(rows("p_partkey->p_brand") === true)      // PK determines
    assert(rows("n_nationkey->n_regionkey") === true)
    assert(rows("p_brand->p_type") === false)        // genuinely violated
  }

  test("q202: integrity audit reports zero orphans on the clean star") {
    val out = CurationExtras.defs("q202_integrity_audit")(spark, dir)
    assert(out.count() === 4L)
    assert(out.filter(col("n_orphans") =!= 0L).count() === 0L)
    assert(out.filter(col("parent_coverage_ppm") > 1000000L).count()
      === 0L)
  }

  test("q203: the rolling window never shrinks below the single day") {
    val out = CurationExtras.defs("q203_rolling_distinct")(spark, dir)
    val daily = graft.Tables.load(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("one_day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("one_day"))
    // 7-day distinct ⊇ that day's distinct, for every day
    assert(out.join(daily, "day")
      .filter(col("exact_distinct") < col("one_day")).count() === 0L)
  }

  test("q204: contingency margins conserve the corpus") {
    val out = CurationExtras.defs("q204_association_audit")(spark, dir)
    val n = graft.Tables.load(spark, dir, "documents").count()
    assert(out.filter(col("n_total") =!= n).count() === 0L)
    assert(out.filter(col("observed") > col("r") ||
      col("observed") > col("c")).count() === 0L)
  }

  test("q205: the quota holds — no customer appears more than twice") {
    val out = CurationExtras.defs("q205_diversified_topk")(spark, dir)
    assert(out.groupBy(col("o_custkey")).count()
      .filter(col("count") > 2).count() === 0L)
    assert(out.filter(col("cust_rank") > 2).count() === 0L)
  }

  test("q206: bounce rate stays within [0, 1e6] and conserves sessions") {
    val out = CurationExtras.defs("q206_bounce_rate")(spark, dir)
    assert(out.filter(col("n_bounces") > col("n_sessions")).count() === 0L)
    assert(out.filter(col("bounce_ppm") > 1000000L).count() === 0L)
  }

  test("q207: shares conserve — each region's nation shares sum to ~1e6") {
    val out = CurationExtras.defs("q207_revenue_shares")(spark, dir)
    val sums = out.groupBy(col("r_name"))
      .agg(sum(col("region_share_ppm")).as("s")).collect()
    // integral division truncates: sum ∈ (1e6 - nations, 1e6]
    assert(sums.forall { r =>
      val s = r.getLong(1); s <= 1000000L && s > 1000000L - 30L })
  }

  test("q208: MAD is bounded by the coarser max deviation") {
    val out = CurationExtras.defs("q208_mad_lengths")(spark, dir)
    assert(out.filter(col("mad") < 0).count() === 0L)
    assert(out.filter(col("median") <= 0).count() === 0L)
  }

  test("q209: streak lengths never exceed the user-type event count") {
    val out = CurationExtras.defs("q209_event_streaks")(spark, dir)
    val counts = graft.Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(out.join(counts, Seq("user_id", "event_type"))
      .filter(col("longest_streak") > col("n")).count() === 0L)
    assert(out.filter(col("longest_streak") < 1).count() === 0L)
  }

  test("q210: conversion latencies are positive and p50 <= p90") {
    val rows = CurationExtras.defs("q210_time_to_convert")(spark, dir)
      .orderBy(col("pct")).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getLong(1) > 0L))
    assert(rows(0).getLong(1) <= rows(1).getLong(1))
  }

  test("q211: attribution conserves in-session purchases") {
    val out = CurationExtras.defs("q211_first_touch")(spark, dir)
    val attributed = out.agg(sum(col("n_purchases"))).head.getLong(0)
    val total = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase").count()
    // every purchase sits in exactly one session with one entry event
    assert(attributed === total)
  }

  test("q212: weekday shares conserve orders and revenue") {
    val out = CurationExtras.defs("q212_weekday_profile")(spark, dir)
    assert(out.count() <= 7L)
    assert(out.agg(sum(col("n_orders"))).head.getLong(0) ===
      graft.Tables.load(spark, dir, "orders").count())
    val s = out.agg(sum(col("rev_share_ppm"))).head.getLong(0)
    assert(s <= 1000000L && s > 1000000L - 10L)
  }

  test("q213: deciles partition the orders; shares increase") {
    val out = CurationExtras.defs("q213_revenue_concentration")(spark, dir)
      .orderBy(col("decile")).collect()
    assert(out.map(_.getLong(1)).sum ===
      graft.Tables.load(spark, dir, "orders").count())
    // revenue share grows with the decile (by construction: higher
    // deciles hold higher-value orders)
    val shares = out.map(_.getLong(2))
    assert(shares.sliding(2).forall(p => p(0) <= p(1)))
  }

  test("q214: HHI stays within [1e6/n, 1e6]") {
    val out = CurationExtras.defs("q214_supplier_hhi")(spark, dir)
    assert(out.filter(col("hhi_ppm") > 1000000L).count() === 0L)
    // even split lower bound (with truncation slack of n ppm)
    assert(out.filter(col("hhi_ppm") * col("n_suppliers") <
      lit(1000000L) - col("n_suppliers") * 2).count() === 0L)
  }

  test("q215: the growth identity holds on every day") {
    val out = CurationExtras.defs("q215_growth_accounting")(spark, dir)
    // active = new + retained + resurrected, day by day
    assert(out.filter(col("n_active") =!= col("n_new") +
      col("n_retained") + col("n_resurrected")).count() === 0L)
    // total new across all days = user universe
    assert(out.agg(sum(col("n_new"))).head.getLong(0) ===
      graft.Tables.load(spark, dir, "events")
        .select(col("user_id")).distinct().count())
  }

  test("q216: burstiness is at least 1x — cf can never undershoot df") {
    val out = CurationExtras.defs("q216_token_burstiness")(spark, dir)
    assert(out.filter(col("cf") < col("df")).count() === 0L)
    assert(out.filter(col("burst_ppm") < 1000000L).count() === 0L)
  }

  test("q217: decay never inflates — decayed mass is bounded by raw") {
    val out = CurationExtras.defs("q217_decayed_popularity")(spark, dir)
    assert(out.filter(col("decayed_qty_e2") > col("raw_qty_e2")).count()
      === 0L)
    assert(out.filter(col("decayed_qty_e2") <= 0).count() === 0L)
  }

  test("q218: ordered support is bounded by unordered co-occurrence") {
    val ordered = CurationExtras
      .defs("q218_ordered_pair_support")(spark, dir)
      .select(least(col("type_a"), col("type_b")).as("lo"),
        greatest(col("type_a"), col("type_b")).as("hi"),
        col("n_support"))
    val unordered = CurationExtras
      .defs("q197_session_cooccurrence")(spark, dir)
      .select(col("type_a").as("lo"), col("type_b").as("hi"),
        col("n_ab"))
    // a-before-b requires both in the session: support(a,b) ≤ co(a,b)
    assert(ordered.join(unordered, Seq("lo", "hi"))
      .filter(col("n_support") > col("n_ab")).count() === 0L)
  }

  test("q194: zipf spread quartiles are ordered") {
    val rows = CurationExtras.defs("q194_zipf_spread")(spark, dir)
      .orderBy(col("pct")).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(1)).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("q363: anisotropy equals the brute-force pairwise mean over the " +
      "integer grid and stays in [-1e6, 1e6]") {
    val out = CurationExtras.defs("q363_embedding_anisotropy")(spark, dir)
      .collect()
    assert(out.length === 1)
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .orderBy(col("vec_id")).collect()
      .map(_.getSeq[Float](1).toArray)
      .filter(v => v.map(x => x.toDouble * x.toDouble).sum > 0)
    // same grid arithmetic as the query: sequential-order norm,
    // truncation toward zero
    val grid = vecs.map { v =>
      val nrm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
      v.map(x => (x.toDouble / nrm * 1e9).toLong)
    }
    val n = grid.length
    var num = BigInt(0)
    for (u <- grid.indices; w <- grid.indices if u != w)
      num += grid(u).indices.map(i =>
        BigInt(grid(u)(i)) * grid(w)(i)).sum
    val denom = BigInt(n) * (n - 1) * BigInt("1000000000000")
    val want = (num.abs / denom).toLong * (if (num < 0) -1L else 1L)
    assert(out.head.getLong(0) === n.toLong)
    val got = out.head.getLong(1)
    assert(got === want)
    assert(got >= -1000000L && got <= 1000000L)
  }

  test("q365: per-dimension mean/var match the brute-force grid moments " +
      "and variance is non-negative") {
    val out = CurationExtras.defs("q365_dim_variance_profile")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .collect().map(_.getSeq[Float](1).toArray)
    assert(out.size === vecs.head.length)
    assert(out.values.forall(_._2 >= 0L))
    for (d <- Seq(0, 7, 63)) {
      val ps = vecs.map(v => (v(d).toDouble * 1e6).toLong)
      val n = BigInt(ps.length)
      val sp = ps.map(BigInt(_)).sum
      val spp = ps.map(p => BigInt(p) * p).sum
      val mean = (sp.abs / n).toLong * (if (sp < 0) -1L else 1L)
      val varE12 = ((n * spp - sp * sp) / (n * n)).toLong
      assert(out(d.toLong) === (mean, varE12))
    }
  }

  test("q190: semdedup keep/drop conserves every cell's vector count") {
    val out = CurationExtras.defs("q190_semdedup")(spark, dir)
    assert(out.filter(col("n_kept") + col("n_dropped") =!=
      col("n_vectors")).count() === 0L)
    val total = out.agg(sum(col("n_vectors"))).head.getLong(0)
    assert(total ===
      graft.Tables.load(spark, dir, "embeddings").count())
  }

  test("q258: TV drift stays in [0, 1e6] ppm and token counts " +
      "conserve the corpus") {
    val out = CurationExtras.defs("q258_source_token_drift")(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val tv = r.getAs[Long]("tv_ppm"); tv >= 0L && tv <= 1000000L
    })
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val corpus = graft.Tables.load(spark, dir, "documents")
      .select(explode(graft.operators.TextAnalysis
        .tokens(lower(col("text")))).as("tok"))
      .count()
    assert(total === corpus)
    // distinct per source never exceeds total tokens of that source
    assert(rows.forall(r =>
      r.getAs[Long]("distinct_tokens") <= r.getAs[Long]("n_tokens")))
  }

  test("q254: every benchmark doc with an in-stratum control matches " +
      "exactly one, and no control beats the chosen one") {
    val out = CurationExtras.defs("q254_matched_controls")(spark, dir)
    val rows = out.collect()
    // one match per benchmark doc
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length ===
      rows.length)
    // matched controls are never benchmark members, gap is exact
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") % 100 === 0L)
      assert(r.getAs[Long]("control_id") % 100 !== 0L)
      assert(r.getAs[Long]("char_gap") ===
        math.abs(r.getAs[Long]("bench_chars") -
          r.getAs[Long]("control_chars")))
    }
    // 1-NN optimality within the stratum: no control in the same
    // stratum sits strictly closer than the chosen match
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("c_id"), col("n_chars"),
        expr("n_chars div 100").as("stratum"))
      .filter(pmod(col("c_id"), lit(100)) =!= 0)
    val better = out
      .withColumn("stratum", expr("bench_chars div 100"))
      .join(docs, "stratum")
      .filter(abs(col("bench_chars") - col("n_chars")) <
        col("char_gap"))
    assert(better.count() === 0L)
  }

  test("q281: coarsening laws — row conservation, classes shrink, " +
      "min class grows, at-risk rows never increase") {
    val rows = CurationExtras.defs("q281_k_anonymity")(spark, dir)
      .collect()
    assert(rows.map(_.getAs[String]("level")).toSeq === Seq(
      "L0_seg_nation_bal100", "L1_seg_nation_bal1000",
      "L2_seg_region_bal5000"))
    val Seq(l0, l1, l2) = rows.toSeq
    // every level partitions the SAME joined customer set
    val n = graft.Tables.load(spark, dir, "customer").count()
    assert(rows.forall(_.getAs[Long]("n_rows") === n))
    // L1 coarsens L0 (same keys, 10x bucket), L2 coarsens L1 (nation ->
    // region is functional, 500000 = 5 x 100000): merging classes can
    // only reduce their number, grow the smallest, and lift rows out of
    // the below-k risk set — never push rows into it
    assert(l0.getAs[Long]("n_classes") >= l1.getAs[Long]("n_classes"))
    assert(l1.getAs[Long]("n_classes") >= l2.getAs[Long]("n_classes"))
    assert(l0.getAs[Long]("min_class") <= l1.getAs[Long]("min_class"))
    assert(l1.getAs[Long]("min_class") <= l2.getAs[Long]("min_class"))
    assert(l0.getAs[Long]("rows_below_k") >=
      l1.getAs[Long]("rows_below_k"))
    assert(l1.getAs[Long]("rows_below_k") >=
      l2.getAs[Long]("rows_below_k"))
    // risk_ppm restates rows_below_k / n_rows exactly (truncated)
    rows.foreach { r =>
      assert(r.getAs[Long]("risk_ppm") ===
        r.getAs[Long]("rows_below_k") * 1000000L / n)
    }
  }

  test("q283: l-diversity coarsening laws — row conservation, classes " +
      "shrink, minimum diversity grows, at-risk rows never increase, " +
      "diversity bounded by the sensitive domain") {
    val rows = CurationExtras.defs("q283_l_diversity")(spark, dir)
      .collect()
    assert(rows.map(_.getAs[String]("level")).toSeq === Seq(
      "L0_nation_bal100", "L1_nation_bal1000", "L2_region_bal5000"))
    val Seq(l0, l1, l2) = rows.toSeq
    val n = graft.Tables.load(spark, dir, "customer").count()
    assert(rows.forall(_.getAs[Long]("n_rows") === n))
    // merging QI classes UNIONS their sensitive-value sets: class count
    // falls, the minimum distinct-count can only grow, and rows can only
    // leave the below-l risk set (L1 coarsens L0's bucket 10x on the
    // same keys; L2 coarsens L1 via nation -> region and a 5x bucket)
    assert(l0.getAs[Long]("n_classes") >= l1.getAs[Long]("n_classes"))
    assert(l1.getAs[Long]("n_classes") >= l2.getAs[Long]("n_classes"))
    assert(l0.getAs[Long]("min_diversity") <=
      l1.getAs[Long]("min_diversity"))
    assert(l1.getAs[Long]("min_diversity") <=
      l2.getAs[Long]("min_diversity"))
    assert(l0.getAs[Long]("rows_below_l") >=
      l1.getAs[Long]("rows_below_l"))
    assert(l1.getAs[Long]("rows_below_l") >=
      l2.getAs[Long]("rows_below_l"))
    // diversity can never exceed the sensitive attribute's domain size
    val nSeg = graft.Tables.load(spark, dir, "customer")
      .select("c_mktsegment").distinct().count()
    rows.foreach { r =>
      val d = r.getAs[Long]("min_diversity")
      assert(d >= 1L && d <= nSeg)
      assert(r.getAs[Long]("risk_ppm") ===
        r.getAs[Long]("rows_below_l") * 1000000L / n)
    }
  }

  test("q285: t-closeness equals a brute-force TVD recompute per class; " +
      "worst-class distance never grows under coarsening") {
    val rows = CurationExtras.defs("q285_t_closeness")(spark, dir)
      .collect()
    assert(rows.map(_.getAs[String]("level")).toSeq === Seq(
      "L0_nation_bal100", "L1_nation_bal1000", "L2_region_bal5000"))
    // the QI ladders are exactly q283's: class counts must agree
    val ldiv = CurationExtras.defs("q283_l_diversity")(spark, dir)
      .collect()
    assert(rows.map(_.getAs[Long]("n_classes")).toSeq ===
      ldiv.map(_.getAs[Long]("n_classes")).toSeq)
    // brute-force recompute from the raw rows (sf0.001: 150 customers)
    val cust = graft.Tables.load(spark, dir, "customer")
      .join(graft.Tables.load(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_mktsegment"), col("c_nationkey").cast("long"),
        col("n_regionkey").cast("long"),
        ((col("c_acctbal").cast("decimal(12,2)") * 100).cast("long") +
          100000L).as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val nAll = cust.length.toLong
    val globalSeg = cust.groupBy(_._1).map { case (s, xs) =>
      s -> xs.length.toLong }
    def brute(key: ((String, Long, Long, Long)) => (Long, Long))
        : (Long, Long, Long) = {
      val classes = cust.groupBy(key)
      // .values: mapping a Map would key by t_ppm and collapse classes
      // with identical distance
      val tppm = classes.values.map { xs =>
        val nC = xs.length.toLong
        val inClass = xs.groupBy(_._1).map { case (s, ys) =>
          s -> ys.length.toLong }
        // sum over the FULL segment domain (absent segs contribute n_v·n_c)
        val s1 = globalSeg.map { case (s, nV) =>
          math.abs(inClass.getOrElse(s, 0L) * nAll - nV * nC) }.sum
        (BigInt(s1) * 1000000 / (BigInt(2) * nC * nAll)).toLong -> nC
      }
      val above = tppm.collect { case (t, nC) if t > 300000L => nC }.sum
      (tppm.map(_._1).max, above, above * 1000000L / nAll)
    }
    val expect = Seq(
      brute(c => (c._2, c._4 / 10000)),
      brute(c => (c._2, c._4 / 100000)),
      brute(c => (c._3, c._4 / 500000)))
    rows.zip(expect).foreach { case (r, (maxT, above, risk)) =>
      assert(r.getAs[Long]("max_t_ppm") === maxT)
      assert(r.getAs[Long]("rows_above_t") === above)
      assert(r.getAs[Long]("risk_ppm") === risk)
    }
    // coarsening merges classes EXACTLY (same keys, multiple buckets;
    // nation -> region functional): a merged class's distribution is a
    // mixture of its parts, and TVD is convex — the worst class can
    // only improve or hold
    val Seq(l0, l1, l2) = rows.toSeq
    assert(l0.getAs[Long]("max_t_ppm") >= l1.getAs[Long]("max_t_ppm"))
    assert(l1.getAs[Long]("max_t_ppm") >= l2.getAs[Long]("max_t_ppm"))
    rows.foreach { r =>
      val t = r.getAs[Long]("max_t_ppm")
      assert(t >= 0L && t <= 1000000L)
    }
  }

  test("q309: segments partition the customer base; codes recompute " +
      "from brute-force type-1 tercile boundaries on each axis") {
    val dir = sf("sf0.001")
    val out = graft.queries.CurationExtras
      .defs("q309_rfm_segments")(spark, dir).collect()
    val orders = graft.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        to_date(col("o_orderdate")).as("d"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay,
        r.getAs[Long]("cents")))
    val mxd = orders.map(_._2).max
    val rfm = orders.groupBy(_._1).map { case (_, os) =>
      (mxd - os.map(_._2).max, os.length.toLong, os.map(_._3).sum)
    }.toSeq
    def tercile(xs: Seq[Long]): (Long, Long) = {
      val s = xs.sorted
      def at(p: Int) = s(((s.length * p + 99) / 100 - 1).toInt)
      (at(33), at(66))
    }
    val (r33, r66) = tercile(rfm.map(_._1))
    val (f33, f66) = tercile(rfm.map(_._2))
    val (m33, m66) = tercile(rfm.map(_._3))
    def code(v: Long, b33: Long, b66: Long): Long =
      1L + (if (v > b33) 1L else 0L) + (if (v > b66) 1L else 0L)
    val want = rfm.groupBy { case (r, f, m) =>
      (code(r, r33, r66), code(f, f33, f66), code(m, m33, m66))
    }.map { case (k, xs) => k -> (xs.size.toLong, xs.map(_._3).sum) }
    assert(out.length === want.size)
    out.foreach { r =>
      val k = (r.getAs[Long]("r_b"), r.getAs[Long]("f_b"),
        r.getAs[Long]("m_b"))
      assert(r.getAs[Long]("segment") ===
        k._1 * 100 + k._2 * 10 + k._3)
      assert(k._1 >= 1 && k._1 <= 3 && k._2 >= 1 && k._2 <= 3 &&
        k._3 >= 1 && k._3 <= 3)
      assert((r.getAs[Long]("n_customers"),
        r.getAs[Long]("monetary_e2")) === want(k))
    }
    // the grid partitions the customer base exactly once
    assert(out.map(_.getAs[Long]("n_customers")).sum ===
      rfm.size.toLong)
  }

  test("q319: transition matrix recomputes from brute-force type-1 " +
      "quartile boundaries per year and partitions the joined base") {
    val dir = sf("sf0.001")
    val out = graft.queries.CurationExtras
      .defs("q319_clv_transition")(spark, dir).collect()
    val sp = graft.Tables.load(spark, dir, "orders")
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"))
      .collect()
      .map(r => ((r.getLong(0), r.getAs[Int]("yr")),
        r.getAs[Long]("cents")))
      .groupBy(_._1)
      .map { case (k, xs) => k -> xs.map(_._2).sum }
    def cuts(yr: Int): (Long, Long, Long) = {
      val s = sp.collect { case ((_, y), v) if y == yr => v }
        .toSeq.sorted
      def at(p: Int) = s(((s.length * p + 99) / 100 - 1).toInt)
      (at(25), at(50), at(75))
    }
    def code(v: Long, b: (Long, Long, Long)): Long =
      1L + (if (v > b._1) 1L else 0L) + (if (v > b._2) 1L else 0L) +
        (if (v > b._3) 1L else 0L)
    val (b96, b97) = (cuts(1996), cuts(1997))
    val m = sp.toSeq.collect { case ((c, 1996), v) => c -> v }
      .flatMap { case (c, v96) => sp.get((c, 1997))
        .map(v97 => (code(v96, b96), code(v97, b97)))
      }
    val want = m.groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong }
    assert(out.length === want.size)
    out.foreach { r =>
      val k = (r.getAs[Long]("q96"), r.getAs[Long]("q97"))
      assert(k._1 >= 1 && k._1 <= 4 && k._2 >= 1 && k._2 <= 4)
      assert(r.getAs[Long]("n_customers") === want(k))
      assert(r.getAs[Long]("share_ppm") ===
        want(k) * 1000000L / m.length)
    }
    assert(out.map(_.getAs[Long]("n_customers")).sum ===
      m.length.toLong)
  }

  test("q325: chi-square cells recompute from brute-force marginals; " +
      "observed conserves the joined fact") {
    val dir = sf("sf0.001")
    val out = graft.queries.CurationExtras
      .defs("q325_brand_region_chisq")(spark, dir).collect()
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val rows = li
      .join(graft.Tables.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(graft.Tables.load(spark, dir, "nation")
          .select(col("n_nationkey"), col("n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(graft.Tables.load(spark, dir, "region")
          .select(col("r_regionkey"), col("r_name")),
        col("n_regionkey") === col("r_regionkey"))
      .join(graft.Tables.load(spark, dir, "part")
          .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("r_name"), col("p_brand"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val cells = rows.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val rm = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cm = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = BigInt(rows.length)
    assert(out.length === cells.size)
    out.foreach { r =>
      val k = (r.getAs[String]("region"), r.getAs[String]("p_brand"))
      val o = BigInt(cells(k))
      val (ri, cj) = (BigInt(rm(k._1)), BigInt(cm(k._2)))
      assert(r.getAs[Long]("observed") === cells(k))
      assert(r.getAs[Long]("expected_e2") === (ri * cj * 100 / n).toLong)
      val d = n * o - ri * cj
      assert(r.getAs[Long]("chisq_contrib_e6") ===
        (d * d * 1000000 / (n * ri * cj)).toLong)
    }
    assert(out.map(_.getAs[Long]("observed")).sum === rows.length.toLong)
  }

  test("q330: dormancy survival recomputes from brute-force gaps and " +
      "is monotone non-increasing in the horizon") {
    val dir = sf("sf0.001")
    val out = graft.queries.CurationExtras
      .defs("q330_dormancy_survival")(spark, dir).collect()
      .sortBy(_.getAs[Long]("threshold_days"))
    val last = graft.Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("d"))
      .collect()
      .map(_.getAs[java.sql.Date]("d").toLocalDate.toEpochDay)
    val mx = last.max
    val gaps = last.map(mx - _)
    val horizons = Seq(30L, 60L, 90L, 180L, 365L)
    assert(out.map(_.getAs[Long]("threshold_days")).toSeq === horizons)
    out.foreach { r =>
      val g = r.getAs[Long]("threshold_days")
      val dormant = gaps.count(_ >= g).toLong
      assert(r.getAs[Long]("n_customers") === gaps.length.toLong)
      assert(r.getAs[Long]("n_dormant") === dormant)
      assert(r.getAs[Long]("dormant_ppm") ===
        dormant * 1000000L / gaps.length)
    }
    val surv = out.map(_.getAs[Long]("n_dormant"))
    surv.zip(surv.tail).foreach { case (a, b) => assert(a >= b) }
  }

  test("q351: readability recomputes from a brute-force vowel-group " +
      "Flesch replay; min <= mean <= max per language") {
    val dir = sf("sf0.001")
    val out = graft.queries.CurationExtras
      .defs("q351_readability")(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("mean_flesch_e3"),
          r.getAs[Long]("min_flesch_e3"), r.getAs[Long]("max_flesch_e3")))
      .toMap
    assert(out.nonEmpty)
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def fE3(text: String): Long = {
      val w = math.max(
        text.trim.toLowerCase.split("\\s+").length.toLong, 1L)
      val sent = math.max(text.count("!?.".contains(_)).toLong, 1L)
      val syl = math.max(
        "[aeiou]+".r.findAllIn(text.toLowerCase).length.toLong, 1L)
      206835L - 1015L * w / sent - 84600L * syl / w
    }
    val expected = docs.groupBy(_._1).map { case (lang, xs) =>
      val fs = xs.map(d => fE3(d._2))
      val sf = fs.sum
      val mean = if (sf >= 0) sf / fs.length else -((-sf) / fs.length)
      lang -> (fs.length.toLong, mean, fs.min, fs.max)
    }
    assert(out === expected)
    out.values.foreach { case (_, mean, mn, mx) =>
      assert(mn <= mean + 1 && mean <= mx)
    }
  }

  test("q352: the rebalance plan conserves the corpus and weights " +
      "invert availability (upsample scarce, downsample abundant)") {
    val dir = sf("sf0.001")
    val out = graft.queries.CurationExtras
      .defs("q352_mix_rebalance")(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("target_docs"), r.getAs[Long]("weight_ppm")))
    assert(out.nonEmpty)
    // INDEPENDENT census from the source table — the counts must be
    // the corpus', not merely self-consistent with each other
    val census = graft.Tables.load(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
    assert(out.map(o => o._1 -> o._2).toMap === census)
    val total = out.map(_._2).sum
    val k = out.length.toLong
    out.foreach { case (_, n, target, w) =>
      assert(target === total / k)
      assert(w === target * 1000000L / n)
    }
    // weights order INVERSELY to availability: the scarcest language
    // gets the largest weight
    val byN = out.sortBy(_._2)
    byN.map(_._4).zip(byN.map(_._4).tail).foreach { case (a, b) =>
      assert(a >= b)
    }
    // sampling at these weights lands each language within one doc of
    // the target (truncation only)
    out.foreach { case (_, n, target, w) =>
      val resampled = w * n / 1000000L
      assert(resampled <= target && target - resampled <= 1L)
    }
  }

  test("q353: unigram surprisal recomputes from brute-force bitlength " +
      "scoring; the argmax doc is the per-language maximum with " +
      "lowest-id ties") {
    val dir = sf("sf0.001")
    val out = graft.queries.CurationExtras
      .defs("q353_unigram_surprisal")(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("mean_bpt_e3"),
          r.getAs[Long]("max_bpt_e3"), r.getAs[Long]("max_doc_id")))
      .toMap
    assert(out.nonEmpty)
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("term"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getString(1),
        r.getString(2)))
    val cf = toks.groupBy(_._3).map { case (t, xs) =>
      t -> xs.length.toLong }
    val nBits = java.lang.Long.toBinaryString(toks.length.toLong).length
    val perDoc = toks.groupBy(d => (d._1, d._2)).map { case ((id, lang), xs) =>
      val bits = xs.map(x => (nBits -
        java.lang.Long.toBinaryString(cf(x._3)).length).toLong).sum
      (id, lang, bits * 1000L / xs.length)
    }.toSeq
    val expected = perDoc.groupBy(_._2).map { case (lang, xs) =>
      val top = xs.minBy(d => (-d._3, d._1))
      lang -> (xs.size.toLong,
        xs.map(d => BigInt(d._3)).sum.toLong / xs.size,
        top._3, top._1)
    }
    assert(out === expected)
  }

  test("q355: label scatter recomputes from a brute-force quantized-" +
      "centroid replay; the nearest label is symmetric-distance " +
      "consistent") {
    val dir = sf("sf0.001")
    val out = graft.queries.PipelineQueries
      .defs("q355_label_scatter")(spark, dir).collect()
      .map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Long]("within_e8"),
          r.getAs[Long]("nearest_label"),
          r.getAs[Long]("nearest_dist_e8"),
          r.getAs[Long]("db_worst_ppm"))).toMap
    assert(out.nonEmpty)
    val vecs = graft.Tables.load(spark, dir, "embeddings").collect()
      .map(r => (r.getAs[Int]("label").toLong,
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(x => math.floor(x.toDouble * 10000).toLong).toArray))
    val byLabel = vecs.groupBy(_._1)
    def signDiv(a: Long, b: Long): Long =
      if (a >= 0) a / b else -((-a) / b)
    val cents = byLabel.map { case (l, xs) =>
      val dim = xs.head._2.length
      l -> (0 until dim).map(d =>
        signDiv(xs.map(_._2(d)).sum, xs.length.toLong)).toArray
    }
    val within = byLabel.map { case (l, xs) =>
      val c = cents(l)
      val d2 = xs.map(v => v._2.zip(c)
        .map { case (a, b) => (a - b) * (a - b) }.sum)
      l -> (xs.length.toLong, d2.map(BigInt(_)).sum.toLong / xs.length)
    }
    val labels = cents.keys.toSeq.sorted
    def m2(a: Long, b: Long): Long = cents(a).zip(cents(b))
      .map { case (x, y) => (x - y) * (x - y) }.sum
    labels.foreach { l =>
      val (n, w, nl, nd, db) = out(l)
      assert((n, w) === within(l))
      val others = labels.filterNot(_ == l)
      val expNear = others.minBy(o => (m2(l, o), o))
      assert(nl === expNear && nd === m2(l, expNear))
      // cross-row symmetry ON THE QUERY OUTPUT: my nearest label's own
      // reported nearest distance can be at most its distance to me
      // (I am one of its candidates)
      assert(out(nl)._4 <= nd)
      val expDb = others.map(o =>
        ((within(l)._2 + within(o)._2) * 1000000L /
          math.max(m2(l, o), 1L), o)).minBy(t => (-t._1, t._2))._1
      assert(db === expDb)
    }
  }

  test("q356: hapax spectrum recomputes from the brute-force frequency " +
      "spectrum; hapax tokens = hapax types by definition") {
    val dir = sf("sf0.001")
    val out = graft.queries.CurationExtras
      .defs("q356_hapax_spectrum")(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("hapax_types"), r.getAs[Long]("dis_types"),
          r.getAs[Long]("hapax_type_share_ppm"),
          r.getAs[Long]("hapax_token_share_ppm"))).toMap
    assert(out.nonEmpty)
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(col("lang"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = toks.groupBy(_._1).map { case (lang, xs) =>
      val freqs = xs.groupBy(_._2).values.map(_.length.toLong).toSeq
      val hap = freqs.count(_ == 1L).toLong
      val dis = freqs.count(_ == 2L).toLong
      lang -> (freqs.length.toLong, freqs.sum, hap, dis,
        hap * 1000000L / freqs.length,
        hap * 1000000L / math.max(freqs.sum, 1L))
    }
    assert(out === expected)
    out.values.foreach { case (types, tokens, hap, dis, _, _) =>
      assert(hap + dis <= types && types <= tokens)
    }
  }

  test("q356: a constructed corpus with known hapax/dis counts " +
      "exercises both share divisions with NONZERO numerators (the " +
      "synthetic corpus has no hapax at all, so the shares there are " +
      "only ever checked at 0)") {
    val tmp = java.nio.file.Files.createTempDirectory("q356docs")
      .toString
    try {
      import spark.implicits._
      // lang a: tokens = [x x y z] → types 3, hapax {y, z} = 2,
      //   dis {x} = 1, tokens 4 → type share 666666, token share 500000
      // lang b: [w w w] → types 1, hapax 0, dis 0
      Seq((1L, "x x y z", "a"), (2L, "w w w", "b"))
        .toDF("doc_id", "text", "lang")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val r = graft.queries.CurationExtras
        .defs("q356_hapax_spectrum")(spark, tmp).collect()
        .map(x => x.getAs[String]("lang") ->
          (x.getAs[Long]("n_types"), x.getAs[Long]("n_tokens"),
            x.getAs[Long]("hapax_types"), x.getAs[Long]("dis_types"),
            x.getAs[Long]("hapax_type_share_ppm"),
            x.getAs[Long]("hapax_token_share_ppm"))).toMap
      assert(r("a") === ((3L, 4L, 2L, 1L, 666666L, 500000L)))
      assert(r("b") === ((1L, 3L, 0L, 0L, 0L, 0L)))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
    }
  }

  test("q357: total-variation distance recomputes from brute-force " +
      "channel histograms and stays in [0, 1e6]") {
    val dir = sf("sf0.001")
    val r = graft.queries.DsShapes
      .defs2("q357_channel_tv_distance")(spark, dir).collect().head
    val cents = graft.Tables.load(spark, dir, "orders")
      .select(pmod(col("o_orderkey"), lit(3)).cast("long").as("chm"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("v"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
      .filter(x => x._1 == 0L || x._1 == 1L)
    val web = cents.filter(_._1 == 1L).map(_._2)
    val store = cents.filter(_._1 == 0L).map(_._2)
    val nW = web.length.toLong
    val nS = store.length.toLong
    val wc = web.groupBy(identity).map { case (v, xs) =>
      v -> xs.length.toLong }
    val sc = store.groupBy(identity).map { case (v, xs) =>
      v -> xs.length.toLong }
    val raw = (wc.keySet ++ sc.keySet).toSeq.map { v =>
      (BigInt(wc.getOrElse(v, 0L)) * nS -
        BigInt(sc.getOrElse(v, 0L)) * nW).abs
    }.sum
    assert(r.getAs[Long]("n_web") === nW)
    assert(r.getAs[Long]("n_store") === nS)
    assert(r.getAs[Long]("n_values") ===
      (wc.keySet ++ sc.keySet).size.toLong)
    assert(r.getAs[Long]("raw_l1") === raw.toLong)
    val tv = (raw * 1000000 / (BigInt(2) * nW * nS)).toLong
    assert(r.getAs[Long]("tv_ppm") === tv)
    assert(tv >= 0L && tv <= 1000000L)
  }

  test("q358: bigram collocations recompute from a brute-force " +
      "adjacency replay; PMI bits match the bitlength surrogate") {
    val dir = sf("sf0.001")
    val out = graft.queries.PipelineQueries
      .defs("q358_bigram_collocations")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getString(1).toLowerCase.trim.split("\\s+").toSeq)
    val toks = docs.flatten
    val n = toks.length.toLong
    val cx = toks.groupBy(identity).map { case (t, xs) =>
      t -> xs.length.toLong }
    val cxy = docs.flatMap(ts => ts.zip(ts.tail))
      .groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
      .filter(_._2 >= 5L)
    def bits(x: Long): Long =
      java.lang.Long.toBinaryString(x).length.toLong
    val want = cxy.toSeq.map { case ((x, y), c) =>
      (s"$x $y", c, cx(x), cx(y), bits(n * c) - bits(cx(x) * cx(y)))
    }.sortBy { case (bg, c, _, _, pmi) => (-pmi, -c, bg) }.take(20)
    val got = out.map(r => (r.getAs[String]("bigram"),
      r.getAs[Long]("c_xy"), r.getAs[Long]("c_x"),
      r.getAs[Long]("c_y"), r.getAs[Long]("pmi_bits"))).toSeq
    assert(got === want)
  }

  test("q359: the dedup yield curve recomputes from brute-force " +
      "jaccard deciles; the at-or-above curve telescopes to the " +
      "total pair count") {
    val dir = sf("sf0.001")
    val out = graft.queries.PipelineQueries
      .defs("q359_dedup_yield_curve")(spark, dir).collect()
      .map(r => r.getAs[Long]("band") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("pairs_at_or_above")))
      .toMap
    assert(out.nonEmpty)
    // independent pair derivation through the operator's public face
    val pairs = graft.operators.Dedup
      .jaccardPairs(graft.Tables.load(spark, dir, "documents"), 0.0)
      .select(col("inter"), col("size_a"), col("size_b")).collect()
      .map(r => (r.getAs[Long]("inter"), r.getAs[Long]("size_a"),
        r.getAs[Long]("size_b")))
    val expected = pairs
      .map { case (i, a, b) => i * 10 / (a + b - i) }
      .groupBy(identity).map { case (b, xs) => b -> xs.length.toLong }
    assert(out.view.mapValues(_._1).toMap === expected)
    // descending-cumulative law: at-or-above at the lowest band is the
    // total, and the curve is non-increasing in the band
    val sorted = out.toSeq.sortBy(_._1)
    assert(sorted.head._2._2 === pairs.length.toLong)
    sorted.map(_._2._2).zip(sorted.tail.map(_._2._2)).foreach {
      case (lo, hi) => assert(lo >= hi)
    }
  }

  test("q350: term burstiness recomputes from brute-force (token, doc) " +
      "counts; cf >= df and burst >= 1e6 by construction") {
    val dir = sf("sf0.001")
    val out = graft.queries.PipelineQueries
      .defs("q350_term_burstiness")(spark, dir).collect()
    assert(out.nonEmpty)
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getString(1)))
    val byTok = toks.groupBy(_._2).map { case (tok, xs) =>
      val perDoc = xs.groupBy(_._1).values.map(_.length.toLong)
      tok -> (perDoc.sum, perDoc.size.toLong, perDoc.max)
    }
    val want = byTok.toSeq
      .sortBy { case (tok, (cf, _, _)) => (-cf, tok) }.take(50)
    assert(out.length === math.min(50, byTok.size))
    out.zip(want).foreach { case (r, (tok, (cf, df, mx))) =>
      assert(r.getAs[String]("tok") === tok)
      assert(r.getAs[Long]("cf") === cf)
      assert(r.getAs[Long]("df") === df)
      assert(r.getAs[Long]("max_tf") === mx)
      assert(r.getAs[Long]("burst_ppm") === cf * 1000000L / df)
      // every containing doc contributes >= 1 occurrence
      assert(cf >= df && r.getAs[Long]("burst_ppm") >= 1000000L)
      assert(mx <= cf)
    }
  }

  test("q360: session focus recomputes from a brute-force session-HHI " +
      "replay; single-event sessions land in the top band") {
    val dir = sf("sf0.001")
    val out = graft.queries.CurationExtras
      .defs("q360_session_focus")(spark, dir).collect()
      .map(r => r.getAs[Long]("band") ->
        (r.getAs[Long]("n_sessions"), r.getAs[Long]("share_ppm")))
      .toMap
    assert(out.nonEmpty)
    // independent sessionization replay through the operator's face
    val se = graft.streaming.Events
      .assignSessions(graft.Tables.load(spark, dir, "events"))
      .select(col("user_id"), col("session_idx"), col("event_type"))
      .collect()
      .map(r => ((r.getAs[Long]("user_id"),
        r.getAs[Long]("session_idx")), r.getString(2)))
    val hhis = se.groupBy(_._1).map { case (_, xs) =>
      val cs = xs.groupBy(_._2).values.map(_.size.toLong)
      val n = cs.sum
      (cs.map(c => BigInt(c) * c).sum * 1000000 /
        (BigInt(n) * n)).toLong
    }.toSeq
    val expected = hhis.groupBy(_ / 100000L).map { case (b, xs) =>
      b -> (xs.length.toLong,
        xs.length.toLong * 1000000L / hhis.length)
    }
    assert(out === expected)
    // a pure session (one event type) scores exactly 1e6 → band 10;
    // the fixture has single-event sessions, so band 10 is non-empty
    assert(out.contains(10L) && out(10L)._1 > 0L)
    assert(out.values.map(_._1).sum === hhis.length.toLong)
  }

  test("q345: vocabulary Gini equals the brute-force sorted-frequency " +
      "formula per language and stays in [0, 1e6)") {
    val dir = sf("sf0.001")
    val out = graft.queries.CurationExtras
      .defs("q345_vocab_gini")(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("gini_ppm"))).toMap
    assert(out.nonEmpty)
    // brute force: full sort of every language's type frequencies
    val toks = graft.Tables.load(spark, dir, "documents")
      .select(col("lang"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = toks.groupBy(_._1).map { case (lang, xs) =>
      val freqs = xs.groupBy(_._2).values.map(_.length.toLong)
        .toSeq.sorted
      val n = freqs.length.toLong
      val s0 = freqs.sum
      val s1 = freqs.zipWithIndex
        .map { case (x, i) => (i + 1).toLong * x }.sum
      lang -> (n, s0, (2 * s1 - (n + 1) * s0) * 1000000L / (n * s0))
    }
    assert(out === expected)
    // degenerate law: every type equally frequent ⇒ Gini exactly 0
    // (the rearrangement-inequality floor the ppm encoding must hit)
    expected.foreach { case (_, (n, s0, g)) =>
      assert(g >= 0L && g < 1000000L)
      assert(n <= s0)
    }
  }

  test("q379: adoption triples match a brute-force session walk and are " +
      "bounded by q218's ordered pair support") {
    val dir = sf("sf0.001")
    val out = graft.queries.CurationExtras
      .defs("q379_adoption_triples")(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"),
        r.getAs[String]("type_c")) -> r.getAs[Long]("n_support")).toMap
    // brute force: first-occurrence ordering per session, all triples
    val firsts = graft.streaming.Events
      .assignSessions(graft.Tables.load(spark, dir, "events"))
      .select(col("user_id"), col("session_idx"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(2),
        r.getLong(3)))
      .groupBy(_._1)
      .map { case (_, es) =>
        es.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._3).min }
      }
    val expected = firsts.toSeq.flatMap { sess =>
      val ts = sess.toSeq
      for {
        (a, fa) <- ts; (b, fb) <- ts if fa < fb
        (c, fc) <- ts if fb < fc
      } yield (a, b, c)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(out === expected)
    // cross-query law: first(a)<first(b)<first(c) implies the (a, b)
    // some-before-some pair, so every triple is bounded by q218's row
    val pairs = graft.queries.CurationExtras
      .defs("q218_ordered_pair_support")(spark, dir).collect()
      .map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
        -> r.getAs[Long]("n_support")).toMap
    out.foreach { case ((a, b, _), n) =>
      assert(n <= pairs.getOrElse((a, b), 0L), s"($a,$b) triple > pair")
    }
  }

  test("q380: IVF rebalance plan — dense cell grid, population " +
      "conserved, actions re-derive from the counts") {
    val dir = sf("sf0.001")
    val out = graft.queries.PipelineQueries
      .defs("q380_ivf_rebalance")(spark, dir).collect()
    assert(out.map(_.getAs[Long]("cell")).toSeq === Seq(0L, 1L, 2L, 3L))
    val nTotal = graft.Tables.load(spark, dir, "embeddings").count()
    assert(out.map(_.getAs[Long]("n_vecs")).sum === nTotal)
    val target = nTotal / 4
    out.foreach { r =>
      val n = r.getAs[Long]("n_vecs")
      assert(r.getAs[Long]("target") === target)
      val want =
        if (n > target * 2) "split"
        else if (n * 2 < target) "merge"
        else "keep"
      assert(r.getAs[String]("action") === want)
      assert(r.getAs[Long]("share_ppm") === n * 1000000L / nTotal)
    }
  }
}
