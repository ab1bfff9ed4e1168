package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the analytics wave (q219–q226) — cross-row
  * conservation and ordering properties the DuckDB hash gate can't state.
  * Oracle equivalence itself is covered by the driver gate. */
class AnalyticsExtrasSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q219: composite pass count is bounded by every individual rule") {
    val out = AnalyticsExtras.defs("q219_gopher_rules")(spark, dir)
    val bad = out.filter(
      col("n_pass_all") > col("n_pass_len") ||
        col("n_pass_all") > col("n_pass_mwl") ||
        col("n_pass_all") > col("n_pass_alpha") ||
        col("n_pass_all") > col("n_pass_stop") ||
        col("pass_ppm") > 1000000L)
    assert(bad.count() === 0L)
  }

  test("q220: continuation counts never exceed the bigram-type universe") {
    val out = AnalyticsExtras.defs("q220_continuation_prob")(spark, dir)
    assert(out.filter(col("n_contexts") > col("n_bigram_types")).count()
      === 0L)
    assert(out.count() <= AnalyticsExtras.ContinuationTopN.toLong)
  }

  test("q221: stationary mass is conserved up to integer-floor drain") {
    val out = AnalyticsExtras.defs("q221_markov_stationary")(spark, dir)
    val mass = out.agg(sum(col("stationary_ppm"))).head.getLong(0)
    // Each div floors (≤ types·rounds ppm lost) and states without
    // outgoing edges drain; mass can only shrink, never grow.
    assert(mass <= 1000000L)
    assert(mass > 0L)
    val states = graft.Tables.load(spark, dir, "events")
      .select(col("event_type")).distinct().count()
    assert(out.count() === states)
  }

  test("q222: k hard negatives per anchor, none sharing the anchor label") {
    val out = AnalyticsExtras.defs("q222_hard_negatives")(spark, dir)
    val perQ = out.groupBy(col("q_id")).agg(count(lit(1)).as("n"))
    assert(perQ.filter(col("n") > AnalyticsExtras.HardNegK).count() === 0L)
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id").as("a_id"), col("label").as("a_label"))
    val shared = out.join(emb, col("q_id") === col("a_id"))
      .filter(col("label") === col("a_label"))
    assert(shared.count() === 0L)
    assert(out.filter(col("score") > 1.0000001 || col("score") < -1.0000001)
      .count() === 0L)
  }

  test("q223: per-lang char ratios stay inside [0, 1e6]") {
    val out = AnalyticsExtras.defs("q223_script_mix")(spark, dir)
    val bad = out.filter(
      col("nonascii_ppm") > 1000000L || col("digit_ppm") > 1000000L ||
        col("upper_ppm") > 1000000L || col("n_mixed_docs") > col("n_docs"))
    assert(bad.count() === 0L)
  }

  test("q224: SCD-2 ranges chain with no gaps and one open run per user") {
    val out = AnalyticsExtras.defs("q224_scd2_tiers")(spark, dir)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    val chained = out
      .withColumn("next_from", lead(col("eff_from_us"), 1).over(w))
    // eff_to of run i must equal eff_from of run i+1 (half-open chain).
    assert(chained.filter(col("next_from").isNotNull &&
      col("eff_to_us") =!= col("next_from")).count() === 0L)
    val open = out.filter(col("is_current") === 1L)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(open.filter(col("n") =!= 1L).count() === 0L)
    // Adjacent runs always change tier (maximal runs).
    val tierChain = out
      .withColumn("next_tier", lead(col("tier"), 1).over(w))
    assert(tierChain.filter(col("next_tier").isNotNull &&
      col("tier") === col("next_tier")).count() === 0L)
  }

  test("q225: vocabulary growth is monotone and bounded by token growth") {
    val out = AnalyticsExtras.defs("q225_heaps_law")(spark, dir).collect()
    val byBucket = out.sortBy(_.getAs[Long]("bucket"))
    byBucket.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("cum_tokens") <= b.getAs[Long]("cum_tokens"))
        assert(a.getAs[Long]("vocab") <= b.getAs[Long]("vocab"))
      case _ =>
    }
    assert(byBucket.forall(r =>
      r.getAs[Long]("vocab") <= r.getAs[Long]("cum_tokens")))
  }

  test("q227: winsorized mean sits inside the clamp bounds") {
    val out = AnalyticsExtras.defs("q227_winsorized_lengths")(spark, dir)
    val bad = out.filter(col("p10_chars") > col("p90_chars") ||
      col("winsor_mean_e2") < col("p10_chars") * 100 ||
      col("winsor_mean_e2") > col("p90_chars") * 100)
    assert(bad.count() === 0L)
  }

  test("q228: one calibration row per sampled vector, cosine-bounded") {
    val out = AnalyticsExtras.defs("q228_knn_calibration")(spark, dir)
    val nSample = graft.Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % AnalyticsExtras.KnnSampleMod === 0).count()
    assert(out.count() === nSample)
    val simCol = col(s"knn${AnalyticsExtras.KnnRank}_sim_e6")
    assert(out.filter(simCol > 1000000L || simCol < -1000000L)
      .count() === 0L)
  }

  test("q229: path shares are bounded and paths are well-formed") {
    val out = AnalyticsExtras.defs("q229_session_paths")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("share_ppm")).sum <= 1000000L)
    assert(out.forall(_.getAs[String]("path").nonEmpty))
    assert(out.forall(r =>
      r.getAs[String]("path").split(">").length <=
        AnalyticsExtras.PathLen))
  }

  test("q230: sentence shares bounded; sentences imply characters") {
    val out = AnalyticsExtras.defs("q230_sentence_stats")(spark, dir)
    val bad = out.filter(col("long_ppm") > 1000000L ||
      (col("n_sentences") > 0 && col("mean_sent_chars_e2") <= 0))
    assert(bad.count() === 0L)
  }

  test("q231: pair budget upper-bounds the realized LSH candidate count") {
    val out = AnalyticsExtras.defs("q231_lsh_pair_budget")(spark, dir)
      .agg(sum(col("n_pairs"))).head.getLong(0)
    val docs = graft.Tables.load(spark, dir, "documents")
    val realized = graft.operators.Dedup.lshCandidates(
      graft.operators.Dedup.minhashSignatures(docs,
        PipelineQueries.NumHashes),
      PipelineQueries.NumHashes, PipelineQueries.Bands).count()
    // Budget counts per-band multiplicity; the realized set is distinct
    // pairs — the budget must dominate it.
    assert(out >= realized)
    assert(realized > 0L)
  }

  test("q368: cross-source matrix conserves the q28 pair count and " +
      "bounds docs by pair endpoints") {
    val matrix = PipelineQueries.defs("q368_cross_source_dup_matrix")(
      spark, dir).collect()
    val pairTotal = PipelineQueries.defs("q28_dedup_minhash")(spark, dir)
      .count()
    assert(matrix.map(_.getAs[Long]("n_pairs")).sum === pairTotal)
    assert(matrix.forall { r =>
      val d = r.getAs[Long]("n_docs")
      d >= 2L && d <= 2L * r.getAs[Long]("n_pairs")
    })
    // canonical ordering of the unordered source pair
    assert(matrix.forall(r =>
      r.getAs[String]("source_a") <= r.getAs[String]("source_b")))
  }

  test("q369: peak concurrency matches a brute-force sweep per day and " +
      "is bounded by the day's session count") {
    val out = AnalyticsExtras.defs("q369_peak_concurrency")(spark, dir)
      .collect()
      .map(r => r.getAs[java.sql.Date]("day").toString ->
        (r.getAs[Long]("peak_concurrent"), r.getAs[Long]("n_sessions")))
      .toMap
    val sess = graft.streaming.Events
      .assignSessions(graft.Tables.load(spark, dir, "events"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("st"),
        r.getAs[java.sql.Timestamp]("en"),
        r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")))
    val byDay = sess.groupBy(s =>
      s._1.toLocalDateTime.toLocalDate.toString)
    assert(out.keySet === byDay.keySet)
    for ((day, ss) <- byDay) {
      // sweep: endpoints ordered (ts, +1 before -1)
      val pts = ss.flatMap { case (st, en, u, i) =>
        Seq((st.getTime, 1L, u, i), (en.getTime, -1L, u, i))
      }.sortBy(p => (p._1, -p._2, p._3, p._4))
      var run = 0L; var peak = Long.MinValue
      pts.foreach { p => run += p._2; peak = peak max run }
      assert(out(day) === ((peak, ss.length.toLong)))
      assert(peak >= 1L && peak <= ss.length.toLong)
    }
  }

  test("q370: churn hazard conserves the user universe; at-risk is a " +
      "reverse cumsum; terminal hazard is 1e6") {
    val rows = AnalyticsExtras.defs("q370_churn_hazard")(spark, dir)
      .collect()
    val users = graft.Tables.load(spark, dir, "events")
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_churned")).sum === users)
    // at-risk at week w = total churned at weeks >= w
    val byWeek = rows.map(r => r.getAs[Long]("week") ->
      (r.getAs[Long]("n_at_risk"), r.getAs[Long]("n_churned"))).toMap
    for ((w, (atRisk, _)) <- byWeek)
      assert(atRisk ===
        byWeek.filter(_._1 >= w).values.map(_._2).sum)
    assert(rows.last.getAs[Long]("hazard_ppm") === 1000000L)
    assert(rows.forall { r =>
      val h = r.getAs[Long]("hazard_ppm"); h >= 0L && h <= 1000000L
    })
  }

  test("q372: transition count conserves events minus sessions; " +
      "quantiles are ordered") {
    val rows = AnalyticsExtras.defs("q372_transition_dwell")(spark, dir)
      .collect()
    val sess = graft.streaming.Events
      .assignSessions(graft.Tables.load(spark, dir, "events"))
    val nEvents = sess.count()
    val nSessions = sess.select(col("user_id"), col("session_idx"))
      .distinct().count()
    // every session of k events contributes exactly k-1 transitions
    assert(rows.map(_.getAs[Long]("n_transitions")).sum ===
      nEvents - nSessions)
    assert(rows.forall { r =>
      val p50 = r.getAs[Long]("p50_s"); val p90 = r.getAs[Long]("p90_s")
      p50 >= 0L && p50 <= p90 && p90 <= 1800L
    })
  }

  test("q373: fan-out profile conserves child row counts; quantile " +
      "ladder is ordered; mean is the exact e3 ratio") {
    val rows = AnalyticsExtras.defs("q373_fanout_profile")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("rel") -> r).toMap
    assert(rows.keySet === Set("orders>lineitem", "customer>orders"))
    val li = graft.Tables.load(spark, dir, "lineitem").count()
    val ord = graft.Tables.load(spark, dir, "orders").count()
    assert(rows("orders>lineitem").getAs[Long]("n_rows") === li)
    assert(rows("customer>orders").getAs[Long]("n_rows") === ord)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("p50") <= r.getAs[Long]("p90"))
      assert(r.getAs[Long]("p90") <= r.getAs[Long]("max_fanout"))
      assert(r.getAs[Long]("mean_fanout_e3") ===
        r.getAs[Long]("n_rows") * 1000L / r.getAs[Long]("n_keys"))
    }
  }

  test("q232: cluster purity is a valid majority share") {
    val out = AnalyticsExtras.defs("q232_cluster_purity")(spark, dir)
    val bad = out.filter(col("n_docs") < 2 ||
      col("purity_ppm") > 1000000L ||
      // majority share can't be below an even split across sources
      // (floor slack: each of the k shares loses < 1 ppm to truncation)
      col("purity_ppm") * col("n_sources") <
        lit(1000000L) - col("n_sources") ||
      col("n_langs") < 1 || col("n_sources") < 1)
    assert(bad.count() === 0L)
  }

  test("q233: extracted-field accounting conserves the event count") {
    val out = AnalyticsExtras.defs("q233_props_extraction")(spark, dir)
    val bad = out.filter(col("n_missing_k") > col("n_events") ||
      col("min_k") > col("max_k") ||
      col("n_distinct_k") > col("n_events") - col("n_missing_k"))
    assert(bad.count() === 0L)
    val total = out.agg(sum(col("n_events"))).head.getLong(0)
    assert(total ===
      graft.Tables.load(spark, dir, "events").count())
  }

  test("q234: hourly error shares are bounded and conserve errors") {
    val out = AnalyticsExtras.defs("q234_error_rate_by_hour")(spark, dir)
    assert(out.filter(col("error_ppm") > 1000000L ||
      col("n_errors") > col("n_events")).count() === 0L)
    val errs = out.agg(sum(col("n_errors"))).head.getLong(0)
    assert(errs === graft.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "error").count())
  }

  test("q235: brand quartiles are ordered with non-negative IQR") {
    val out = AnalyticsExtras.defs("q235_brand_price_spread")(spark, dir)
    assert(out.filter(col("p25_e2") > col("p75_e2") ||
      col("iqr_e2") < 0).count() === 0L)
    assert(out.count() === graft.Tables.load(spark, dir, "part")
      .select(col("p_brand")).distinct().count())
  }

  test("q236: covariance numerator matches the two-pass definition") {
    val out = AnalyticsExtras.defs("q236_discount_quantity_cov")(spark, dir)
      .collect().map(r => r.getAs[String]("l_returnflag") ->
        r.getAs[Long]("cov_num_e6")).toMap
    // Independent two-pass check: n·Σ(x−x̄)(y−ȳ) over exact rationals
    // equals the one-pass numerator (×n to stay integral).
    val d = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        (col("l_discount").cast("decimal(12,4)") * 10000)
          .cast("long").as("x"),
        (col("l_quantity").cast("decimal(12,2)") * 100)
          .cast("long").as("y"))
      .collect()
      .groupBy(_.getString(0))
    d.foreach { case (flag, rows) =>
      val xs = rows.map(_.getAs[Long]("x").toDouble)
      val ys = rows.map(_.getAs[Long]("y").toDouble)
      val n = rows.length.toDouble
      val num = n * (xs, ys).zipped.map(_ * _).sum - xs.sum * ys.sum
      assert(math.abs(num - out(flag).toDouble) < math.abs(num) * 1e-9 + 1)
    }
  }

  test("q237: stickiness is a valid ratio and WAU dominates DAU") {
    val out = AnalyticsExtras.defs("q237_stickiness")(spark, dir)
    assert(out.filter(col("dau") > col("wau") ||
      col("stickiness_ppm") > 1000000L).count() === 0L)
    // WAU for a day is bounded by the 7-day union of DAUs.
    assert(out.count() > 0)
  }

  test("q238: null profile bounds hold on the synthetic corpus") {
    val out = AnalyticsExtras.defs("q238_null_profile")(spark, dir)
      .head()
    val n = out.getAs[Long]("n_rows")
    assert(n === graft.Tables.load(spark, dir, "documents").count())
    Seq("blank_text", "null_lang", "null_source", "bad_n_chars",
      "n_chars_mismatch").foreach { c =>
      val v = out.getAs[Long](c)
      assert(v >= 0L && v <= n, s"$c = $v outside [0, $n]")
    }
  }

  test("q226: histogram quantiles are ordered and inside the delay range") {
    val out = AnalyticsExtras.defs("q226_ship_delay_quantiles")(spark, dir)
    assert(out.filter(col("p50_days") > col("p90_days")).count() === 0L)
    val bounds = graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate")).cast("long")
        .as("d"))
      .agg(min(col("d")).as("lo"), max(col("d")).as("hi")).head
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    assert(out.filter(col("p50_days") < lo || col("p90_days") > hi)
      .count() === 0L)
  }

  test("q246: positives share the anchor's label, hard negatives don't, " +
      "and the margin is their stated difference") {
    val out = AnalyticsExtras.defs("q246_hard_negatives")(spark, dir)
    assert(out.count() > 0)
    assert(out.filter(col("margin_e6") =!=
      col("pos_sim_e6") - col("neg_sim_e6")).count() === 0L)
    val labels = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"))
    val checked = out
      .join(labels.select(col("vec_id").as("q_id"),
        col("label").as("q_label")), "q_id")
      .join(labels.select(col("vec_id").as("positive_id"),
        col("label").as("p_label")), Seq("positive_id"), "left")
      .join(labels.select(col("vec_id").as("negative_id"),
        col("label").as("n_label")), Seq("negative_id"), "left")
    assert(checked.filter(col("p_label").isNotNull &&
      col("p_label") =!= col("q_label")).count() === 0L)
    assert(checked.filter(col("n_label").isNotNull &&
      col("n_label") === col("q_label")).count() === 0L)
  }

  test("q262: the RANGE frame really is value-based — each trailing " +
      "sum equals a direct [day-6, day] recount") {
    val out = AnalyticsExtras
      .defs("q262_trailing_range_window")(spark, dir)
    assert(out.filter(col("n_days_7") > 7).count() === 0L)
    assert(out.filter(col("trailing7_e2") < col("d_e2")).count() === 0L)
    // exact recount via a bounded self-join on the daily aggregate
    val daily = out.select(col("channel").as("c2"), col("day").as("d2"),
      col("d_e2").as("v2"))
    val recount = out
      .join(daily,
        col("channel") === col("c2") &&
          col("d2").between(date_sub(col("day"), 6), col("day")))
      .groupBy(col("channel"), col("day"), col("trailing7_e2"),
        col("n_days_7"))
      .agg(sum(col("v2")).as("chk"), count(lit(1)).as("chk_n"))
    assert(recount.filter(col("trailing7_e2") =!= col("chk") ||
      col("n_days_7") =!= col("chk_n")).count() === 0L)
  }

  test("q265: rank-function laws hold — pct/cume in [0,1], dense " +
      "ranks gapless on distinct prices, nth_value(2) is the " +
      "second-cheapest everywhere in the brand") {
    val out = AnalyticsExtras.defs("q265_price_position")(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p, c) = (r.getAs[Double]("pct_rank"), r.getAs[Double]("cume"))
      assert(p >= 0.0 && p <= 1.0 && c > 0.0 && c <= 1.0)
      assert(r.getAs[Long]("price_e2") >= r.getAs[Long]("cheapest_e2"))
    }
    rows.groupBy(_.getAs[String]("p_brand")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(r =>
        (r.getAs[Long]("price_e2"), r.getAs[Long]("p_partkey")))
      // dense ranks cover 1..#distinct-prices with no gaps
      val dr = rs.map(_.getAs[Int]("price_dense_rank")).distinct.sorted
      assert(dr.sameElements(1 to dr.length))
      assert(dr.length ===
        rs.map(_.getAs[Long]("price_e2")).distinct.length)
      // the full-frame firsts agree with a direct sort
      assert(rs.forall(_.getAs[Long]("cheapest_e2") ===
        sorted.head.getAs[Long]("price_e2")))
      if (rs.length >= 2)
        assert(rs.forall(_.getAs[Long]("second_cheapest_e2") ===
          sorted(1).getAs[Long]("price_e2")))
      else
        // nth_value(2) over a 1-row partition is the documented NULL
        assert(rs.forall(r =>
          r.isNullAt(r.fieldIndex("second_cheapest_e2"))))
    }
  }

  test("q263: three keywords per sampled doc, scores recompute from " +
      "tf and the integer idf") {
    val out = AnalyticsExtras.defs("q263_doc_keywords")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("doc_id") % 50 === 0L))
    val nDocs = graft.Tables.load(spark, dir, "documents").count()
    out.foreach { r =>
      val idfBits = java.lang.Long
        .toBinaryString(nDocs / r.getAs[Long]("df")).length
      assert(r.getAs[Long]("score") ===
        r.getAs[Long]("tf") * idfBits)
    }
    out.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rk")).sorted.sameElements(
        1 to rs.length))
    }
  }

  test("q305: AR(1) slope equals a brute-force cross-moment recompute " +
      "over consecutive-day count pairs, sign-decomposed") {
    val out = AnalyticsExtras.defs("q305_daily_ar1")(spark, dir)
      .collect().head
    val counts = graft.Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("d").toLocalDate ->
        r.getAs[Long]("c")).toMap
    val prs = counts.toSeq.flatMap { case (d, x) =>
      counts.get(d.plusDays(1)).map(y => (BigInt(x), BigInt(y)))
    }
    val n = BigInt(prs.length)
    val sx = prs.map(_._1).sum; val sy = prs.map(_._2).sum
    val sxy = prs.map(p => p._1 * p._2).sum
    val sxx = prs.map(p => p._1 * p._1).sum
    val num = n * sxy - sx * sy
    val den = (n * sxx - sx * sx).max(BigInt(1))
    val want =
      if (num >= 0) (num * 1000000 / den).toLong
      else -((-num) * 1000000 / den).toLong
    assert(out.getAs[Long]("n_pairs") === prs.length.toLong)
    assert(out.getAs[Long]("ar1_slope_ppm") === want)
  }

  test("q308: skyline equals the brute-force O(n^2) non-dominated set " +
      "(ties kept, strict-in-one-dim dominance)") {
    val out = AnalyticsExtras.defs("q308_part_skyline")(spark, dir)
      .collect()
    val parts = graft.Tables.load(spark, dir, "part")
      .select(col("p_partkey"),
        (col("p_retailprice").cast("decimal(12,2)") * 100)
          .cast("long").as("price_e2"),
        col("p_size").cast("long").as("sz"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Long]("price_e2"),
        r.getAs[Long]("sz")))
    val frontier = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, pr2, sz2) =>
        pr2 <= pr && sz2 >= sz && (pr2 < pr || sz2 > sz)
      }
    }.map(_._1).toSet
    assert(out.map(_.getAs[Long]("part_key")).toSet === frontier)
    // sorted by price then key, and sizes strictly increase along the
    // frontier when prices strictly increase (the Pareto staircase)
    val rows = out.map(r => (r.getAs[Long]("price_e2"),
      r.getAs[Long]("p_size")))
    rows.zip(rows.tail).foreach { case ((p1, s1), (p2, s2)) =>
      assert(p1 <= p2)
      if (p2 > p1) assert(s2 > s1, "staircase must rise with price")
    }
  }

  test("q310: gap quantiles equal brute-force type-1 selection per " +
      "segment; p50 <= p90; gap multiset conserves order pairs") {
    val out = AnalyticsExtras.defs("q310_interorder_gap")(spark, dir)
      .collect()
    val orders = graft.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.sql.Date]("d").toLocalDate))
    val seg = graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val gaps = orders.groupBy(_._1).toSeq.flatMap { case (ck, os) =>
      val sorted = os.sortBy(o => (o._3.toEpochDay, o._2))
      sorted.zip(sorted.tail).map { case (a, b) =>
        seg(ck) -> (b._3.toEpochDay - a._3.toEpochDay)
      }
    }.groupBy(_._1).map { case (sg, xs) =>
      sg -> xs.map(_._2).sorted
    }
    assert(out.map(_.getAs[String]("segment")).toSet === gaps.keySet)
    out.foreach { r =>
      val xs = gaps(r.getAs[String]("segment"))
      def q(p: Int): Long = xs(((xs.length * p + 99) / 100 - 1).toInt)
      assert(r.getAs[Long]("n_gaps") === xs.length.toLong)
      assert(r.getAs[Long]("p50_gap_days") === q(50))
      assert(r.getAs[Long]("p90_gap_days") === q(90))
      assert(r.getAs[Long]("p50_gap_days") <=
        r.getAs[Long]("p90_gap_days"))
    }
  }

  test("q312: at-risk flags recompute from per-customer upper-median " +
      "gaps and the open gap against the corpus max date") {
    val out = AnalyticsExtras.defs("q312_churn_risk")(spark, dir)
      .collect()
    val orders = graft.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay))
    val seg = graft.Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val mxd = orders.map(_._3).max
    // toSeq first: collect over the Map would rebuild a Map keyed by
    // segment and keep ONE customer per segment
    val perCust = orders.groupBy(_._1).toSeq.collect {
      case (ck, os) if os.length >= 3 =>
        val sorted = os.sortBy(o => (o._3, o._2))
        val gaps = sorted.zip(sorted.tail)
          .map { case (a, b) => b._3 - a._3 }.sorted
        val med = gaps(gaps.length / 2) // upper median, 0-based
        (seg(ck), (mxd - sorted.last._3) > 2 * med)
    }.toSeq
    val want = perCust.groupBy(_._1).map { case (sg, xs) =>
      sg -> (xs.size.toLong, xs.count(_._2).toLong)
    }
    assert(out.map(_.getAs[String]("segment")).toSet === want.keySet)
    out.foreach { r =>
      val (n, risk) = want(r.getAs[String]("segment"))
      assert(r.getAs[Long]("n_eligible") === n)
      assert(r.getAs[Long]("n_at_risk") === risk)
      assert(r.getAs[Long]("at_risk_ppm") === risk * 1000000L / n)
    }
  }

  test("q314: per-supplier slopes recompute from brute-force quarterly " +
      "means and cross-moments, sign-decomposed at both divisions") {
    val out = AnalyticsExtras.defs("q314_supplier_delay_trend")(
      spark, dir).collect()
    assert(out.nonEmpty && out.length <= 25)
    val li = graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .select(col("l_suppkey"),
        ((year(col("o_orderdate")) - 1996) * 4 +
          quarter(col("o_orderdate"))).as("t"),
        datediff(to_date(col("l_shipdate")),
          to_date(col("o_orderdate"))).cast("long").as("delay"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Int]("t"),
        r.getAs[Long]("delay")))
    def sdiv(num: BigInt, den: BigInt): BigInt =
      if (num >= 0) num / den else -((-num) / den)
    val slopes = li.groupBy(_._1).collect {
      case (sk, xs) if xs.map(_._2).distinct.length >= 2 =>
        val ys = xs.groupBy(_._2).map { case (t, ds) =>
          (BigInt(t), sdiv(ds.map(d => BigInt(d._3)).sum * 1000000,
            BigInt(ds.length)))
        }.toSeq
        val n = BigInt(ys.length)
        val st = ys.map(_._1).sum; val sy = ys.map(_._2).sum
        val sty = ys.map(p => p._1 * p._2).sum
        val stt = ys.map(p => p._1 * p._1).sum
        val num = n * sty - st * sy
        val den = (n * stt - st * st).max(BigInt(1))
        sk -> sdiv(num, den).toLong
    }
    val want = slopes.toSeq.sortBy { case (sk, sl) => (-sl, sk) }
      .take(25)
    assert(out.map(r => (r.getAs[Long]("supp_key"),
      r.getAs[Long]("trend_e6_per_quarter"))).toSeq === want)
  }

  test("q315: the confusion matrix counts every sampled vector once " +
      "and matches the brute-force exact-NN labels") {
    val out = PipelineQueries.defs("q315_knn_label_agreement")(
      spark, dir).collect()
    val emb = graft.Tables.load(spark, dir, "embeddings")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray,
        r.getInt(2)))
    val sample = emb.filter(_._1 % 50 == 0)
    val want = sample.map { case (qid, qv, ql) =>
      val (_, _, nl) = emb.filter(_._1 != qid).maxBy { case (id, v, _) =>
        // exact double dot, matching the kernel; tie-break smallest id
        (v.zip(qv).map { case (a, b) => a.toDouble * b.toDouble }.sum,
          -id)
      }
      (ql.toLong, nl.toLong)
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    assert(out.map(r => (r.getAs[Long]("q_label"),
      r.getAs[Long]("nn_label")) -> r.getAs[Long]("n")).toMap === want)
    assert(out.map(_.getAs[Long]("n")).sum === sample.length.toLong)
  }

  test("q316: gini equals the brute-force sorted-rank formula per " +
      "segment and stays in [0, 1e6)") {
    val out = AnalyticsExtras.defs("q316_spend_gini")(spark, dir)
      .collect()
    val spends = graft.Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("decimal(38,0)")).cast("long").as("sp"))
      .join(graft.Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("sp"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Long]("sp"))
    val want = spends.groupBy(_._1).map { case (seg, xs) =>
      val s = xs.map(x => BigInt(x._2)).sorted
      val n = BigInt(s.length)
      val sx = s.sum
      val sixi = s.zipWithIndex
        .map { case (x, i) => x * BigInt(i + 1) }.sum
      seg -> (s.length.toLong, sx.toLong,
        ((2 * sixi - (n + 1) * sx) * 1000000 /
          (n * sx).max(BigInt(1))).toLong)
    }
    assert(out.length === want.size)
    out.foreach { r =>
      val (n, tot, g) = want(r.getAs[String]("segment"))
      assert(r.getAs[Long]("n_customers") === n)
      assert(r.getAs[Long]("spend_total_e2") === tot)
      assert(r.getAs[Long]("gini_ppm") === g)
      assert(g >= 0L && g < 1000000L)
    }
  }

  test("q318: changepoint equals the brute-force argmax of " +
      "|n*Sk - k*Sn| per nation, earliest-day ties") {
    val out = AnalyticsExtras
      .defs("q318_revenue_changepoint")(spark, dir).collect()
    val daily = graft.Tables.load(spark, dir, "orders")
      .join(graft.Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nk"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("decimal(38,0)")).cast("long").as("rev"))
      .collect()
      .map(r => (r.getAs[Long]("nk"),
        r.getAs[java.sql.Date]("d").toLocalDate,
        BigInt(r.getAs[Long]("rev"))))
    val want = daily.groupBy(_._1).map { case (nk, xs) =>
      val series = xs.sortBy(_._2.toEpochDay).map(x => (x._2, x._3))
      val n = BigInt(series.length)
      val sn = series.map(_._2).sum
      val devs = series.zipWithIndex.map { case ((d, _), i) =>
        val sk = series.take(i + 1).map(_._2).sum
        (d, (n * sk - BigInt(i + 1) * sn).abs)
      }
      val best = devs.minBy { case (d, dev) => (-dev, d.toEpochDay) }
      nk -> (series.length.toLong, best._1,
        (best._2 * 1000000 / (n * sn).max(BigInt(1))).toLong)
    }
    assert(out.length === want.size)
    out.foreach { r =>
      val (nd, day, ppm) = want(r.getAs[Long]("nation_key"))
      assert(r.getAs[Long]("n_days") === nd)
      assert(r.getAs[java.sql.Date]("change_day").toLocalDate === day)
      assert(r.getAs[Long]("dev_ppm") === ppm)
      // the KS-style deviation is a proper fraction of total mass
      assert(ppm >= 0L && ppm <= 1000000L)
    }
  }

  test("q322: systematic picks equal the brute-force stride walk; " +
      "all docs here are shorter than the stride so the count is " +
      "EXACTLY chars_total/stride") {
    val out = graft.queries.CurationExtras
      .defs("q322_systematic_sample")(spark, dir).collect()
    val docs = graft.Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"), col("n_chars"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("n_chars")))
    // the exact-proportionality regime's precondition, pinned so a
    // testdata regeneration that violates it fails loudly here
    assert(docs.forall(_._3 < 2000L))
    val want = docs.groupBy(_._1).map { case (src, xs) =>
      val sorted = xs.sortBy(_._2)
      var cum = 0L; var nPicked = 0L; var charsPicked = 0L
      sorted.foreach { case (_, _, c) =>
        val prev = cum; cum += c
        if (cum / 2000 > prev / 2000) { nPicked += 1; charsPicked += c }
      }
      src -> (xs.length.toLong, cum, nPicked, charsPicked)
    }
    assert(out.length === want.size)
    out.foreach { r =>
      val (n, tot, np, cp) = want(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === n)
      assert(r.getAs[Long]("chars_total") === tot)
      assert(r.getAs[Long]("n_picked") === np)
      assert(np > 0L, "stride never exercised — test is vacuous")
      assert(r.getAs[Long]("chars_picked") === cp)
      assert(r.getAs[Long]("pick_rate_ppm") === np * 1000000L / n)
      // every doc < stride ⇒ one pick per crossed multiple, exactly
      assert(np === tot / 2000L)
    }
  }

  test("q322: constructed corpus pins both stride regimes — boundary " +
      "straddles pick once, a doc spanning several strides is still " +
      "ONE pick") {
    val tmp = java.nio.file.Files
      .createTempDirectory("q322docs").toString
    try {
      import spark.implicits._
      // source a: 1500 + 600 (straddles 2000 → pick), + 5000 (spans
      // 2100..7100: crosses 4000 and 6000 → ONE pick), + 100 (no
      // crossing); source b: exact landing on 2000 picks
      Seq(("a", 1L, 1500L), ("a", 2L, 600L), ("a", 3L, 5000L),
        ("a", 4L, 100L), ("b", 10L, 2000L), ("b", 11L, 1999L))
        .toDF("source", "doc_id", "n_chars")
        .write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val out = graft.queries.CurationExtras
        .defs("q322_systematic_sample")(spark, tmp).collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_picked"), r.getAs[Long]("chars_picked")))
        .toMap
      // a: picks are doc 2 (600) and doc 3 (5000) — NOT three picks
      // despite doc 3 crossing two multiples; 7200/2000 = 3 > 2
      assert(out("a") === (2L, 5600L))
      // b: doc 10 lands exactly on 2000 (2000 div 2000 = 1 > 0) —
      // picked; doc 11 ends at 3999, no new multiple
      assert(out("b") === (1L, 2000L))
    } finally {
      val d = new java.io.File(tmp)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(d)
    }
  }

  test("q323: runs counts recompute from the brute-force sign walk " +
      "per nation; up/down moves partition the move set") {
    val out = AnalyticsExtras.defs("q323_runs_test")(spark, dir)
      .collect()
    val daily = graft.Tables.load(spark, dir, "orders")
      .join(graft.Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nk"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("decimal(38,0)")).cast("long").as("rev"))
      .collect()
      .map(r => (r.getAs[Long]("nk"),
        r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay,
        r.getAs[Long]("rev")))
    val want = daily.groupBy(_._1).flatMap { case (nk, xs) =>
      val revs = xs.sortBy(_._2).map(_._3)
      val sgns = revs.zip(revs.tail).collect {
        case (a, b) if a != b => if (b > a) 1L else -1L
      }
      if (sgns.isEmpty) None
      else {
        val runs = 1L + sgns.zip(sgns.tail).count {
          case (a, b) => a != b
        }
        val (up, down) = (sgns.count(_ == 1L).toLong,
          sgns.count(_ == -1L).toLong)
        val n = sgns.length.toLong
        Some(nk -> (n, up, down, runs,
          (BigInt(runs) * n * 1000000 /
            BigInt(n + 2 * up * down)).toLong))
      }
    }
    assert(out.length === want.size)
    out.foreach { r =>
      val (n, up, down, runs, ppm) = want(r.getAs[Long]("nation_key"))
      assert(r.getAs[Long]("n_moves") === n)
      assert(r.getAs[Long]("n_up") === up)
      assert(r.getAs[Long]("n_down") === down)
      assert(r.getAs[Long]("n_runs") === runs)
      assert(r.getAs[Long]("vs_random_ppm") === ppm)
      assert(up + down === n)
      assert(runs >= 1L && runs <= n)
    }
  }

  test("q327: centroid purity recomputes from brute-force integer " +
      "centroids and conserves the vector count") {
    val out = graft.queries.PipelineQueries
      .defs("q327_centroid_purity")(spark, dir).collect()
    val vecs = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long"),
        col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).toArray
          .map(v => math.floor(v.toDouble * 10000).toLong)))
    val cents = vecs.groupBy(_._2).view.mapValues { xs =>
      val dim = xs.head._3.length
      Array.tabulate(dim) { d =>
        val s = xs.map(x => BigInt(x._3(d))).sum
        val n = BigInt(xs.length)
        (if (s >= 0) s / n else -((-s) / n)).toLong
      }
    }.toMap
    val want = vecs.groupBy(_._2).map { case (label, xs) =>
      val pure = xs.count { case (_, _, q) =>
        val best = cents.toSeq.map { case (cl, cv) =>
          (q.zip(cv).map { case (a, b) => a * b }.sum, cl)
        }.minBy { case (dot, cl) => (-dot, cl) }._2
        best == label
      }
      label -> (xs.length.toLong, pure.toLong)
    }
    assert(out.length === want.size)
    out.foreach { r =>
      val (n, pure) = want(r.getAs[Long]("label"))
      assert(r.getAs[Long]("n_vecs") === n)
      assert(r.getAs[Long]("n_pure") === pure)
      assert(r.getAs[Long]("purity_ppm") === pure * 1000000L / n)
    }
    assert(out.map(_.getAs[Long]("n_vecs")).sum === vecs.length.toLong)
  }

  test("q329: gamma recomputes from brute-force concordance per " +
      "brand; ties count toward neither side") {
    val out = AnalyticsExtras.defs("q329_price_size_gamma")(spark, dir)
      .collect()
    val parts = graft.Tables.load(spark, dir, "part")
      .select(col("p_brand"), col("p_partkey").cast("long"),
        (col("p_retailprice").cast("decimal(12,2)") * 100)
          .cast("long").as("pr"),
        col("p_size").cast("long").as("sz"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("pr"),
        r.getAs[Long]("sz")))
    val want = parts.groupBy(_._1).map { case (brand, xs) =>
      val ps = xs.sortBy(_._2)
      var c = 0L; var d = 0L; var n = 0L
      for (i <- ps.indices; j <- (i + 1) until ps.length) {
        n += 1
        val (p1, s1, p2, s2) = (ps(i)._3, ps(i)._4, ps(j)._3, ps(j)._4)
        if ((p1 < p2 && s1 < s2) || (p1 > p2 && s1 > s2)) c += 1
        else if ((p1 < p2 && s1 > s2) || (p1 > p2 && s1 < s2)) d += 1
      }
      val g =
        if (c >= d) (c - d) * 1000000L / math.max(c + d, 1L)
        else -((d - c) * 1000000L / math.max(c + d, 1L))
      brand -> (n, c, d, g)
    }
    assert(out.length === want.size)
    out.foreach { r =>
      val (n, c, d, g) = want(r.getAs[String]("p_brand"))
      assert(r.getAs[Long]("n_pairs") === n)
      assert(r.getAs[Long]("concordant") === c)
      assert(r.getAs[Long]("discordant") === d)
      assert(r.getAs[Long]("gamma_ppm") === g)
      assert(c + d <= n, "ties must count toward neither side")
    }
  }

  test("q331: ladder gaps recompute from brute-force sorted distinct " +
      "prices; the telescoping mean law holds") {
    val out = AnalyticsExtras.defs("q331_price_ladder_gap")(spark, dir)
      .collect()
    val prices = graft.Tables.load(spark, dir, "part")
      .select(col("p_brand"),
        (col("p_retailprice").cast("decimal(12,2)") * 100)
          .cast("long").as("pr"))
      .collect().map(r => (r.getString(0), r.getAs[Long]("pr")))
    val want = prices.groupBy(_._1).toSeq.flatMap { case (brand, xs) =>
      val ladder = xs.map(_._2).distinct.sorted
      if (ladder.length < 2) None
      else {
        val gaps = ladder.zip(ladder.tail)
          .map { case (lo, hi) => (hi - lo, lo) }
        val (mg, mf) = gaps.minBy { case (g, f) => (-g, f) }
        Some(brand -> (ladder.length.toLong, mg, mf,
          (ladder.last - ladder.head) / (ladder.length - 1).toLong))
      }
    }.toMap
    assert(out.length === want.size)
    out.foreach { r =>
      val (n, mg, mf, mean) = want(r.getAs[String]("p_brand"))
      assert(r.getAs[Long]("n_prices") === n)
      assert(r.getAs[Long]("max_gap_e2") === mg)
      assert(r.getAs[Long]("max_gap_floor_e2") === mf)
      assert(r.getAs[Long]("mean_gap_e2") === mean)
      assert(mg >= mean, "the max gap is at least the mean gap")
    }
  }

  test("q333: per-lag slopes recompute from brute-force cross-moments " +
      "and the lag-1 row IS q305's slope") {
    val out = AnalyticsExtras
      .defs("q333_persistence_profile")(spark, dir).collect()
      .sortBy(_.getAs[Long]("lag"))
    val counts = graft.Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => r.getAs[java.sql.Date]("d").toLocalDate ->
        r.getAs[Long]("c")).toMap
    def slope(lag: Int): (Long, Long) = {
      val prs = counts.toSeq.flatMap { case (d, x) =>
        counts.get(d.plusDays(lag.toLong))
          .map(y => (BigInt(x), BigInt(y)))
      }
      val n = BigInt(prs.length)
      val sx = prs.map(_._1).sum; val sy = prs.map(_._2).sum
      val sxy = prs.map(p => p._1 * p._2).sum
      val sxx = prs.map(p => p._1 * p._1).sum
      val num = n * sxy - sx * sy
      val den = (n * sxx - sx * sx).max(BigInt(1))
      (prs.length.toLong,
        if (num >= 0) (num * 1000000 / den).toLong
        else -((-num) * 1000000 / den).toLong)
    }
    assert(out.map(_.getAs[Long]("lag")).toSeq === Seq(1L, 2L, 3L, 7L))
    out.foreach { r =>
      val (n, sl) = slope(r.getAs[Long]("lag").toInt)
      assert(r.getAs[Long]("n_pairs") === n)
      assert(r.getAs[Long]("slope_ppm") === sl)
    }
    // cross-query law: the profile's lag-1 row is exactly q305
    val q305 = AnalyticsExtras.defs("q305_daily_ar1")(spark, dir)
      .collect().head
    assert(out.head.getAs[Long]("n_pairs") ===
      q305.getAs[Long]("n_pairs"))
    assert(out.head.getAs[Long]("slope_ppm") ===
      q305.getAs[Long]("ar1_slope_ppm"))
  }

  test("q377: interval coverage — covered bounded by days, ppm in range, " +
      "scored days only ever have a FULL 28-day trailing window") {
    val out = AnalyticsExtras.defs("q377_interval_coverage")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_covered") <= r.getAs[Long]("n_days"))
      val c = r.getAs[Long]("coverage_ppm")
      assert(c >= 0L && c <= 1000000L)
      assert(r.getAs[Long]("mean_width_e3") >= 0L)
    }
    // the index-based window scores EVERY observed day except the
    // 28-day warm-up — exact accounting, sparse calendars included
    val nDays = graft.Tables.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n")).count()
    val scored = out.map(_.getAs[Long]("n_days")).sum
    assert(scored === nDays - 28L)
  }
}
