package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic invariants for the TPC-DS-style shapes (q240–q243) —
  * cross-slice conservation laws the DuckDB hash gate can't state.
  * Oracle equivalence itself is covered by the driver gate. */
class DsShapesSpec extends SparkSpec {

  private val dir = sf("sf0.001")

  test("q374: OTHERS rollup conserves the full region revenue; at most " +
      "top-3 named rows; shares sum to ~1e6 per region") {
    val rows = DsShapes.defs2("q374_topk_with_others")(spark, dir)
      .collect()
    val byRegion = rows.groupBy(_.getAs[String]("region"))
    // total across buckets equals the unfolded all-nation total
    val full = graft.Tables.load(spark, dir, "orders")
      .join(graft.Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("long"))).head.getLong(0)
    assert(rows.map(_.getAs[Long]("rev_cents")).sum === full)
    for ((_, rs) <- byRegion) {
      assert(rs.count(_.getAs[String]("bucket") != "OTHERS") <= 3)
      val shares = rs.map(_.getAs[Long]("share_ppm"))
      assert(shares.sum <= 1000000L &&
        shares.sum >= 1000000L - rs.length)
      val nNamed = rs.filter(_.getAs[String]("bucket") != "OTHERS")
        .map(_.getAs[Long]("n_nations"))
      assert(nNamed.forall(_ === 1L))
    }
  }

  test("q375: majority-class prediction — correct bounded by total, " +
      "transition mass equals events minus sessions") {
    val rows = DsShapes.defs2 ++ AnalyticsExtras.defs
    val out = rows("q375_markov_prediction")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val a = r.getAs[Long]("accuracy_ppm")
      r.getAs[Long]("n_correct") <= r.getAs[Long]("n_transitions") &&
        a >= 0L && a <= 1000000L
    })
    val sess = graft.streaming.Events
      .assignSessions(graft.Tables.load(spark, dir, "events"))
    val expected = sess.count() -
      sess.select(col("user_id"), col("session_idx")).distinct().count()
    assert(out.map(_.getAs[Long]("n_transitions")).sum === expected)
  }

  test("q240: rollup levels conserve — channel subtotals sum to the " +
      "grand total, which counts every joined line") {
    val out = DsShapes.defs("q240_channel_sales_rollup")(spark, dir)
    val grand = out.filter(col("channel") === "ALL" &&
      col("o_orderstatus") === "ALL")
    assert(grand.count() === 1L)
    val g = grand.head
    val joined = graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey")).count()
    assert(g.getAs[Long]("n_lines") === joined)
    // per-channel subtotal rows sum to the grand total, for every measure
    val chs = out.filter(col("channel") =!= "ALL" &&
        col("o_orderstatus") === "ALL")
      .agg(sum(col("n_lines")), sum(col("sales_e4")),
        sum(col("returns_e4"))).head
    assert(chs.getLong(0) === g.getAs[Long]("n_lines"))
    assert(chs.getLong(1) === g.getAs[Long]("sales_e4"))
    assert(chs.getLong(2) === g.getAs[Long]("returns_e4"))
    // returns never exceed sales at any level
    assert(out.filter(col("returns_e4") > col("sales_e4")).count() === 0L)
  }

  test("q241: every grouping-sets slice conserves the overall totals") {
    val out = DsShapes.defs("q241_brand_size_grouping_sets")(spark, dir)
    val overall = out.filter(col("p_brand") === "ALL" &&
      col("size_bucket") === -1L).head
    // the (brand) slice, the (bucket) slice, and the (brand × bucket)
    // cells each partition the same fact rows
    Seq(
      col("p_brand") =!= "ALL" && col("size_bucket") === -1L,
      col("p_brand") === "ALL" && col("size_bucket") =!= -1L,
      col("p_brand") =!= "ALL" && col("size_bucket") =!= -1L)
      .foreach { slice =>
        val s = out.filter(slice)
          .agg(sum(col("n_lines")), sum(col("qty_e2")),
            sum(col("rev_e4"))).head
        assert(s.getLong(0) === overall.getAs[Long]("n_lines"))
        assert(s.getLong(1) === overall.getAs[Long]("qty_e2"))
        assert(s.getLong(2) === overall.getAs[Long]("rev_e4"))
      }
  }

  test("q242: yoy ratio is exactly the adjacent-year revenue quotient") {
    val out = DsShapes.defs("q242_channel_yoy")(spark, dir)
    assert(out.count() > 0)
    assert(out.filter(
      col("yoy_ppm") =!= expr("rev_e4 * 1000000L div prev_rev_e4"))
      .count() === 0L)
    // the joined prev value really is that channel's previous year
    val self = out.select(col("channel"),
      (col("order_year") - 1).as("order_year"),
      col("prev_rev_e4").as("check_e4"))
    val mismatch = out
      .select(col("channel"), col("order_year"), col("rev_e4"))
      .join(self, Seq("channel", "order_year"))
      .filter(col("rev_e4") =!= col("check_e4"))
    assert(mismatch.count() === 0L)
  }

  test("q244: at most three cells per brand, rank 1 carries the brand " +
      "maximum revenue") {
    val out = DsShapes.defs("q244_brand_bucket_topk")(spark, dir)
    val perBrand = out.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), max(col("rk")).as("max_rk"),
        max(col("rev_e4")).as("max_rev"))
    assert(perBrand.filter(col("n") > 3 || col("max_rk") > 3)
      .count() === 0L)
    val rank1 = out.filter(col("rk") === 1)
      .select(col("p_brand"), col("rev_e4").as("r1"))
    assert(perBrand.join(rank1, "p_brand")
      .filter(col("r1") =!= col("max_rev")).count() === 0L)
  }

  test("q245: cumulative series are nondecreasing and web_leads states " +
      "the comparison") {
    import org.apache.spark.sql.expressions.Window
    val out = DsShapes.defs("q245_channel_crossover")(spark, dir)
    assert(out.count() > 0)
    assert(out.filter(col("web_leads") =!=
      (col("web_cum_e2") > col("store_cum_e2"))).count() === 0L)
    val w = Window.orderBy(col("day"))
    Seq("store_cum_e2", "web_cum_e2").foreach { c =>
      val dec = out.withColumn("prev", lag(col(c), 1).over(w))
        .filter(col("prev").isNotNull && col(c) < col("prev"))
      assert(dec.count() === 0L, s"$c decreased")
    }
  }

  test("q247 + q243 conserve the ordering-customer universe across " +
      "channel-count classes") {
    val exclusive = DsShapes.defs("q247_channel_exclusive")(spark, dir)
      .agg(sum(col("n_customers"))).head.getLong(0)
    val allThree = DsShapes.defs("q243_cross_channel_customers")(spark, dir)
      .agg(sum(col("n_customers"))).head.getLong(0)
    val byClass = graft.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        pmod(col("o_orderkey"), lit(3)).as("ch")).distinct()
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("ch")).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exclusive === byClass.getOrElse(1L, 0L))
    assert(allThree === byClass.getOrElse(3L, 0L))
    assert(exclusive + byClass.getOrElse(2L, 0L) + allThree ===
      byClass.values.sum)
  }

  test("q248: the sixteen band cells cover every timestamped event and " +
      "n_events is COUNT(*) — null-ts rows count but land in no band") {
    val out = DsShapes.defs("q248_hour_band_matrix")(spark, dir)
    assert(out.count() === 1L)
    val r = out.head
    val ev = graft.Tables.load(spark, dir, "events")
    val cells = (0 until 8).flatMap(b =>
      Seq(r.getAs[Long](s"buy_h$b"), r.getAs[Long](s"other_h$b")))
    assert(cells.sum === ev.filter(col("ts").isNotNull).count())
    assert(r.getAs[Long]("n_events") === ev.count())
  }

  test("q249: each rollup level ranks its own rows — contiguous ranks, " +
      "at most three per level, and the grand-total row carries the " +
      "full revenue") {
    val out = DsShapes.defs2("q249_rollup_level_topk")(spark, dir)
    val rows = out.collect()
    val levels = rows.map(_.getAs[Int]("lvl")).toSet
    assert(levels.subsetOf(Set(0, 1, 3)), s"unexpected levels $levels")
    rows.groupBy(_.getAs[Int]("lvl")).foreach { case (lvl, rs) =>
      val rks = rs.map(_.getAs[Int]("rk")).sorted
      assert(rks.length <= 3 && rks.sameElements(1 to rks.length),
        s"level $lvl ranks: ${rks.toSeq}")
      // ranked descending by revenue within the level
      val byRk = rs.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("rev_e4"))
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a >= b })
    }
    // the grand-total row (level 3, necessarily rank 1) is the exact
    // full-fact revenue
    val grand = rows.find(_.getAs[Int]("lvl") == 3).get
    val full = graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .agg(sum((col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(12,2)") - col("l_discount").cast("decimal(12,2)")) *
        lit(10000)).cast("decimal(38,0)")).cast("long")).head.getLong(0)
    assert(grand.getAs[Long]("rev_e4") === full)
    assert(grand.getAs[Int]("rk") === 1)
  }

  test("q250: reported brands aggregate exactly the parts present on " +
      "all three channels") {
    val out = DsShapes.defs2("q250_cross_channel_parts")(spark, dir)
    val counted = out.agg(sum(col("n_parts"))).head.getLong(0)
    val crossParts = graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_partkey"), pmod(col("o_orderkey"), lit(3)).as("ch"))
      .distinct()
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("ch")).as("n"))
      .filter(col("n") === 3)
    assert(counted === crossParts.count())
    assert(counted > 0)
  }

  test("q243: counted customers each order through all three channels") {
    val out = DsShapes.defs("q243_cross_channel_customers")(spark, dir)
    val counted = out.agg(sum(col("n_customers"))).head.getLong(0)
    val loyal = graft.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        pmod(col("o_orderkey"), lit(3)).as("ch"))
      .distinct()
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("ch")).as("n"))
      .filter(col("n") === 3)
    assert(counted === loyal.count())
    assert(counted > 0)
  }

  test("q252: every row has web growth strictly above store growth and " +
      "the gap column is exact") {
    val out = DsShapes.defs2("q252_channel_growth")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    out.foreach { r =>
      val (w, st, gap) = (r.getAs[Long]("web_growth_ppm"),
        r.getAs[Long]("store_growth_ppm"),
        r.getAs[Long]("growth_gap_ppm"))
      assert(w > st)
      assert(gap === w - st)
    }
    // descending by gap, custkey tie-break
    val gaps = out.map(_.getAs[Long]("growth_gap_ppm"))
    assert(gaps.sameElements(gaps.sortBy(-_)))
  }

  test("q253: weekday matrix cells conserve the two-year channel " +
      "revenue and dow stays in range") {
    val out = DsShapes.defs2("q253_weekday_shift")(spark, dir)
    assert(out.filter(col("dow") < 0 || col("dow") > 6).count() === 0L)
    assert(out.filter(col("yoy_ppm") =!=
      expr("rev95_e4 * 1000000 div rev94_e4")).count() === 0L)
    // cells sum to the direct two-year totals per channel (cells with
    // rev94=0 are filtered, so compare the matrix's own 94 total > 0)
    val t94 = out.agg(sum(col("rev94_e4"))).head.getLong(0)
    val t95 = out.agg(sum(col("rev95_e4"))).head.getLong(0)
    assert(t94 > 0 && t95 > 0)
  }

  test("q260: return share never exceeds 1e6 ppm, ranks are 1..5 per " +
      "channel and descend by ratio") {
    val out = DsShapes.defs2("q260_return_ratio_rank")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall { r =>
      val ppm = r.getAs[Long]("return_ppm")
      ppm > 0 && ppm <= 1000000L &&
        r.getAs[Long]("returns_e4") <= r.getAs[Long]("sales_e4")
    })
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getAs[Int]("rk"))
      assert(byRank.map(_.getAs[Int]("rk")).toSeq ===
        (1 to byRank.length))
      val ppms = byRank.map(_.getAs[Long]("return_ppm"))
      assert(ppms.sameElements(ppms.sortBy(-(_: Long))))
    }
  }

  test("q261: the top supplier's hot-part count matches a direct " +
      "recount of the threshold set") {
    val out = DsShapes.defs2("q261_hot_part_suppliers")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    val counts = out.map(_.getAs[Long]("n_hot_parts"))
    assert(counts.sameElements(counts.sortBy(-(_: Long))))
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("yr"),
        (col("l_quantity").cast("decimal(12,2)") * 100)
          .cast("decimal(38,0)").as("q"))
    val hot = li.groupBy(col("l_partkey"))
      .agg(sum(col("q")).cast("long").as("qa"),
        sum(when(col("yr") === 1997, col("q"))
          .otherwise(lit(0).cast("decimal(38,0)")))
          .cast("long").as("q97"))
      .filter(col("q97") * 4 > col("qa"))
    val top = out.head
    val recount = li
      .filter(col("l_suppkey") === top.getAs[Long]("l_suppkey"))
      .join(hot.select(col("l_partkey")), "l_partkey")
      .select(col("l_partkey")).distinct().count()
    assert(recount === top.getAs[Long]("n_hot_parts"))
  }

  test("q269: silent store buyers are exactly store buyers minus " +
      "purchase-eventers; min/max bracket the group") {
    val out = DsShapes.defs2("q269_silent_store_buyers")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("n_customers") >= 1L))
    assert(out.forall(r => r.getAs[Long]("min_acctbal_e2") <=
      r.getAs[Long]("max_acctbal_e2")))
    // cross-check the total against direct set arithmetic
    val storeBuyers = graft.Tables.load(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(3)) === 0)
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val purchasers = graft.Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_.getAs[Long]("n_customers")).sum ===
      (storeBuyers -- purchasers).size.toLong)
  }

  test("q270: purchaser sub-population never exceeds the group and " +
      "every grouped customer both buys and fires events") {
    val out = DsShapes.defs2("q270_demographic_activity")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getAs[Long]("n_purchasers") <=
      r.getAs[Long]("n_customers")))
    val buyers = graft.Tables.load(spark, dir, "orders")
      .select(col("o_custkey")).distinct()
      .collect().map(_.getLong(0)).toSet
    val eventers = graft.Tables.load(spark, dir, "events")
      .select(col("user_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_.getAs[Long]("n_customers")).sum ===
      (buyers & eventers).size.toLong)
  }

  test("q279: every reported month really deviates >10% from its year " +
      "avg, and the deviation ppm recomputes from the row") {
    val out = DsShapes.defs2("q279_brand_monthly_deviation")(spark, dir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("yr") === 1997)
      val m = r.getAs[Long]("month_rev_e4")
      val avg = r.getAs[Long]("avg_month_e4")
      // the filter cleared denominators; the truncated-avg check is the
      // row-level restatement (tolerance 1 on avg's own truncation)
      assert(math.abs(m - avg) * 10L >= avg - 10L,
        s"non-deviant row survived: m=$m avg=$avg")
      assert(r.getAs[Long]("dev_ppm") > 0L)
    }
  }

  test("q280: ranked by deviation descending, rank dense from 1, " +
      "bounded at 25") {
    val out = DsShapes.defs2("q280_nation_monthly_deviation")(spark, dir)
      .collect()
    assert(out.nonEmpty && out.length <= 25)
    assert(out.map(_.getAs[Int]("rk")).toSeq ===
      (1 to out.length))
    val devs = out.map(_.getAs[Long]("dev_ppm")).toSeq
    assert(devs === devs.sorted.reverse)
  }

  test("q292: the band grid equals independently-counted bands and " +
      "never exceeds the profile total (one-scan conditional " +
      "aggregation law)") {
    val out = DsShapes.defs2("q292_time_band_grid")(spark, dir)
      .collect().head
    val ev = graft.Tables.load(spark, dir, "events")
    val hit = (col("event_type") === "purchase" &&
        col("value").between(50.0, 150.0)) ||
      (col("event_type") === "click" &&
        col("value").between(0.0, 100.0)) ||
      (col("event_type") === "view" &&
        col("value").between(100.0, 300.0))
    val cols = Seq("h08_10", "h10_12", "h12_14", "h14_16", "h16_18",
      "h18_20", "h20_22", "h22_24")
    cols.zipWithIndex.foreach { case (c, i) =>
      val lo = 8 + 2 * i
      val want = ev.filter(hit &&
        hour(col("ts")).between(lo, lo + 1)).count()
      assert(out.getAs[Long](c) === want, c)
    }
    // the eight bands tile 08:00-24:00 disjointly: their sum is the
    // profile's total in that half-day, never more
    val total = ev.filter(hit && hour(col("ts")) >= 8).count()
    assert(cols.map(out.getAs[Long](_)).sum === total)
  }

  test("q297: am/pm counts match independent filters and the ppm " +
      "quotient is the exact integral division of the two") {
    val out = DsShapes.defs2("q297_ampm_ratio")(spark, dir)
      .collect().head
    val ev = graft.Tables.load(spark, dir, "events")
    val hit = (col("event_type") === "purchase" ||
      col("event_type") === "click") && col("value") <= 200.0
    val am = ev.filter(hit && hour(col("ts")).between(8, 9)).count()
    val pm = ev.filter(hit && hour(col("ts")).between(20, 21)).count()
    assert(out.getAs[Long]("am_events") === am)
    assert(out.getAs[Long]("pm_events") === pm)
    assert(out.getAs[Long]("am_pm_ppm") ===
      am * 1000000L / math.max(pm, 1L))
  }

  test("q298: every reported outlier really exceeds 1.2x its nation's " +
      "average customer return — brute-force recompute agrees") {
    val out = DsShapes.defs2("q298_return_outliers")(spark, dir)
      .collect()
    // brute-force per-customer returned revenue in exact e4 cents
    val perCust = graft.Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(graft.Tables.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_nationkey").cast("long"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") -
            col("l_discount").cast("decimal(12,2)")) *
          lit(10000)).cast("decimal(38,0)").as("e4"))
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(sum(col("e4")).as("ret"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigInt(r.getDecimal(2).toBigInteger)))
    val byNation = perCust.groupBy(_._2)
    val expected = perCust.flatMap { case (c, n, ret) =>
      val natSum = byNation(n).map(_._3).sum
      val natN = BigInt(byNation(n).length)
      if (ret * natN * 10 > natSum * 12)
        Some((c, n, ret.toLong,
          (ret * natN * 1000000 / natSum.max(BigInt(1))).toLong))
      else None
    }.sortBy { case (c, _, _, ppm) => (-ppm, c) }.take(25).toSeq
    assert(out.map(r => (r.getAs[Long]("cust_key"),
      r.getAs[Long]("nation_key"), r.getAs[Long]("returns_e4"),
      r.getAs[Long]("vs_avg_ppm"))).toSeq === expected)
    // the predicate clears 1.2x; the reported ppm is truncated so the
    // bound is >= (an exact 1.2000004 ratio reports 1200000)
    assert(out.forall(_.getAs[Long]("vs_avg_ppm") >= 1200000L))
  }

  test("q284: the bands PARTITION the purchasers — customer and order " +
      "totals conserve, every band row respects its own bounds") {
    val out = DsShapes.defs2("q284_frequent_buyer_bands")(spark, dir)
      .collect()
    val orders = graft.Tables.load(spark, dir, "orders")
    // every purchaser lands in exactly one band: the histogram's
    // customer counts sum to the distinct purchaser count, its order
    // totals to the full order count
    assert(out.map(_.getAs[Long]("n_customers")).sum ===
      orders.select("o_custkey").distinct().count())
    assert(out.map(_.getAs[Long]("total_orders")).sum === orders.count())
    val bounds = Map("B1_1_5" -> (1L, 5L), "B2_6_10" -> (6L, 10L),
      "B3_11_20" -> (11L, 20L), "B4_21_plus" -> (21L, Long.MaxValue))
    out.foreach { r =>
      val (lo, hi) = bounds(r.getAs[String]("band"))
      val nc = r.getAs[Long]("n_customers")
      val tot = r.getAs[Long]("total_orders")
      assert(nc > 0L)
      // total orders of a band row must fit inside nc x [lo, hi]
      assert(tot >= nc * lo)
      assert(hi == Long.MaxValue || tot <= nc * hi)
    }
    // the demographic axis is complete: every mktsegment with at least
    // one purchaser appears
    val segs = graft.Tables.load(spark, dir, "customer")
      .join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_mktsegment").distinct().count()
    assert(out.map(_.getAs[String]("segment")).distinct.length.toLong
      === segs)
  }

  test("q290: Theil-Sen slope equals the brute-force pairwise-median " +
      "replay, sign decomposition included") {
    val out = DsShapes.defs2("q290_theil_sen_trend")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Long]("n_pairs"),
          r.getAs[Long]("trend_e4_per_month"))).toMap
    assert(out.nonEmpty)
    val m = graft.Tables.load(spark, dir, "lineitem")
      .filter(year(col("l_shipdate")).isin(1996, 1997))
      .join(graft.Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        ((year(col("l_shipdate")) - 1996) * 12 +
          month(col("l_shipdate"))).as("t"))
      .agg(sum((col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(12,2)") -
          col("l_discount").cast("decimal(12,2)")) *
        lit(10000)).cast("decimal(38,0)")).cast("long").as("rev"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val expected = m.groupBy(_._1).flatMap { case (brand, cells) =>
      val pts = cells.map(c => c._2 -> c._3).sortBy(_._1)
      val slopes = for {
        i <- pts.indices; j <- (i + 1) until pts.length
      } yield {
        val ((t1, r1), (t2, r2)) = (pts(i), pts(j))
        val s = if (r2 >= r1) (r2 - r1) / (t2 - t1)
                else -((r1 - r2) / (t2 - t1))
        (s, t1, t2)
      }
      if (slopes.isEmpty) None
      else {
        val sorted = slopes.sortBy { case (s, t1, t2) => (s, t1, t2) }
        Some(brand -> (slopes.length.toLong,
          sorted(slopes.length / 2)._1))
      }
    }
    assert(out === expected)
  }

  test("q286: crossover equals a brute-force cumulative replay — first " +
      "month web's filled cumulative exceeds store's, never earlier") {
    val out = DsShapes.defs2("q286_web_store_crossover")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Int]("crossover_month"), r.getAs[Long]("web_cume_e4"),
          r.getAs[Long]("store_cume_e4"))).toMap
    // independent month-grain aggregation, then a driver-side replay
    // (sf0.001: a handful of brand-month cells)
    val m = graft.Tables.load(spark, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1997)
      .join(graft.Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        pmod(col("l_orderkey"), lit(3)).cast("long").as("chm"),
        month(col("l_shipdate")).as("mo"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") -
            col("l_discount").cast("decimal(12,2)")) *
          lit(10000)).cast("decimal(38,0)").as("rev"))
      .filter(col("chm") === 0L || col("chm") === 1L) // store=0, web=1
      .groupBy(col("p_brand"), col("chm"), col("mo"))
      .agg(sum(col("rev")).cast("long").as("m_e4"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(3)))
    val expected = m.groupBy(_._1).flatMap { case (brand, cells) =>
      val web = cells.filter(_._2 == 1L).map(c => c._3 -> c._4)
        .sortBy(_._1)
      val store = cells.filter(_._2 == 0L).map(c => c._3 -> c._4)
        .sortBy(_._1)
      def cume(xs: Seq[(Int, Long)]): Map[Int, Long] =
        xs.scanLeft((0, 0L)) { case ((_, acc), (mo, v)) =>
          (mo, acc + v) }.tail.toMap
      val (wc, sc) = (cume(web), cume(store))
      val months = (wc.keySet ++ sc.keySet).toSeq.sorted
      def filled(c: Map[Int, Long]): Map[Int, Option[Long]] = {
        var last: Option[Long] = None
        months.map { mo =>
          last = c.get(mo).orElse(last); mo -> last }.toMap
      }
      val (wf, sf2) = (filled(wc), filled(sc))
      months.collectFirst {
        case mo if (for { w <- wf(mo); s <- sf2(mo) } yield w > s)
            .getOrElse(false) =>
          brand -> (mo, wf(mo).get, sf2(mo).get)
      }
    }
    assert(out === expected)
  }

  test("q304: both ends match the brute-force avg-quantity ranking " +
      "and the ends never overlap on real data") {
    val out = DsShapes.defs2("q304_best_worst_parts")(spark, dir)
      .collect()
    assert(out.length === 5)
    val avgs = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        (col("l_quantity").cast("decimal(12,2)") * 100)
          .cast("long").as("q_e2"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("q_e2"))
      .groupBy(_._1)
      .map { case (k, xs) =>
        k -> (xs.map(x => BigInt(x._2)).sum * 10000 /
          xs.length).toLong }
      .toSeq
    val best = avgs.sortBy { case (k, a) => (-a, k) }.take(5)
    val worst = avgs.sortBy { case (k, a) => (a, k) }.take(5)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rk") === (i + 1).toLong)
      assert((r.getAs[Long]("best_part"),
        r.getAs[Long]("best_avg_e6")) === best(i))
      assert((r.getAs[Long]("worst_part"),
        r.getAs[Long]("worst_avg_e6")) === worst(i))
      assert(r.getAs[Long]("best_avg_e6") >=
        r.getAs[Long]("worst_avg_e6"))
    }
    assert(out.map(_.getAs[Long]("best_part")).toSet
      .intersect(out.map(_.getAs[Long]("worst_part")).toSet).isEmpty,
      "best and worst ends coincide — degenerate ranking")
  }

  private def yearSpends(dir: String): Map[Long, (Long, Long)] =
    graft.Tables.load(spark, dir, "orders")
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Int]("yr"),
        r.getAs[Long]("cents")))
      .groupBy(_._1)
      .collect(Function.unlift { case (c, xs) =>
        val s96 = xs.filter(_._2 == 1996).map(_._3)
        val s97 = xs.filter(_._2 == 1997).map(_._3)
        if (s96.nonEmpty && s97.nonEmpty)
          Some(c -> (s96.sum, s97.sum))
        else None
      })

  test("q320: growth leaders equal the brute-force both-years ratio " +
      "ranking, ties to the smaller key") {
    val out = DsShapes.defs("q320_yoy_growth_leaders")(spark, dir)
      .collect()
    val want = yearSpends(dir).toSeq.map { case (c, (s96, s97)) =>
      (c, s96, s97,
        (BigInt(s97) * 1000000 / BigInt(s96).max(BigInt(1))).toLong)
    }.sortBy { case (c, _, _, g) => (-g, c) }.take(20)
    assert(out.length === want.length)
    out.zip(want).foreach { case (r, (c, s96, s97, g)) =>
      assert(r.getAs[Long]("cust_key") === c)
      assert(r.getAs[Long]("spend96_e2") === s96)
      assert(r.getAs[Long]("spend97_e2") === s97)
      assert(r.getAs[Long]("growth_ppm") === g)
    }
  }

  test("q321: weekly extremes recompute from the brute-force " +
      "(nation, iso-week) pivot, weeks 2-51 only") {
    val out = DsShapes.defs("q321_weekly_ratio")(spark, dir).collect()
    val cells = graft.Tables.load(spark, dir, "orders")
      .join(graft.Tables.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .filter(year(col("o_orderdate")).isin(1996, 1997) &&
        weekofyear(col("o_orderdate")).between(2, 51))
      .select(col("c_nationkey").cast("long").as("nk"),
        weekofyear(col("o_orderdate")).cast("long").as("wk"),
        year(col("o_orderdate")).as("yr"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("cents"))
      .collect()
      .map(r => ((r.getAs[Long]("nk"), r.getAs[Long]("wk")),
        r.getAs[Int]("yr"), r.getAs[Long]("cents")))
    val want = cells.groupBy(_._1).toSeq
      .flatMap { case ((nk, wk), xs) =>
        val r96 = xs.filter(_._2 == 1996).map(_._3)
        val r97 = xs.filter(_._2 == 1997).map(_._3)
        if (r96.nonEmpty && r97.nonEmpty)
          Some((nk, wk, (BigInt(r97.sum) * 1000000 /
            BigInt(r96.sum).max(BigInt(1))).toLong))
        else None
      }
      .groupBy(_._1).map { case (nk, ws) =>
        val best = ws.minBy { case (_, wk, p) => (-p, wk) }
        val worst = ws.minBy { case (_, wk, p) => (p, wk) }
        nk -> (ws.length.toLong, best._2, best._3, worst._2, worst._3)
      }
    assert(out.length === want.size)
    out.foreach { r =>
      val (n, bw, bp, ww, wp) = want(r.getAs[Long]("nation_key"))
      assert(r.getAs[Long]("n_weeks") === n)
      assert(r.getAs[Long]("best_week") === bw)
      assert(r.getAs[Long]("best_ratio_ppm") === bp)
      assert(r.getAs[Long]("worst_week") === ww)
      assert(r.getAs[Long]("worst_ratio_ppm") === wp)
      assert(bp >= wp)
    }
  }

  test("q328: KS distance equals the brute-force ECDF max over the " +
      "merged value axis, argmax to the smallest value") {
    val out = DsShapes.defs("q328_ks_channel_values")(spark, dir)
      .collect()
    assert(out.length === 1)
    val orders = graft.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").cast("long"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("v")))
    def chan(k: Long): String = (k % 3) match {
      case 0 => "store"; case 1 => "web"; case _ => "catalog"
    }
    val web = orders.collect { case (k, v) if chan(k) == "web" => v }
    val store = orders.collect {
      case (k, v) if chan(k) == "store" => v
    }
    val axis = (web ++ store).distinct.sorted
    val (nw, ns) = (BigInt(web.length), BigInt(store.length))
    val best = axis.map { v =>
      val dev = (BigInt(web.count(_ <= v)) * ns -
        BigInt(store.count(_ <= v)) * nw).abs
      (v, dev)
    }.minBy { case (v, dev) => (-dev, v) }
    val r = out.head
    assert(r.getAs[Long]("n_web") === web.length.toLong)
    assert(r.getAs[Long]("n_store") === store.length.toLong)
    assert(r.getAs[Long]("ks_at_cents") === best._1)
    assert(r.getAs[Long]("ks_ppm") ===
      (best._2 * 1000000 / (nw * ns).max(BigInt(1))).toLong)
    assert(r.getAs[Long]("ks_ppm") >= 0L &&
      r.getAs[Long]("ks_ppm") <= 1000000L)
  }

  test("q332: supplier breadth recomputes from the brute-force " +
      "excluded-set grid; n_suppliers bounds the cell's parts ratio") {
    val out = DsShapes.defs("q332_supplier_breadth")(spark, dir)
      .collect()
    val excluded = graft.Tables.load(spark, dir, "supplier")
      .filter(col("s_acctbal") < 1000.0)
      .select(col("s_suppkey").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(excluded.nonEmpty, "exclusion set empty — anti-join vacuous")
    val parts = graft.Tables.load(spark, dir, "part")
      .select(col("p_partkey").cast("long"), col("p_brand"),
        col("p_size").cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        r.getLong(2) / 10))
      .toMap
    val ps = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey").cast("long"),
        col("l_suppkey").cast("long"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filterNot(x => excluded.contains(x._2))
    val want = ps.groupBy(x => parts(x._1)).map { case (cell, xs) =>
      cell -> (xs.map(_._2).distinct.length.toLong,
        xs.map(_._1).distinct.length.toLong)
    }
    assert(out.length === want.size)
    out.foreach { r =>
      val cell = (r.getAs[String]("p_brand"),
        r.getAs[Long]("size_band"))
      assert((r.getAs[Long]("n_suppliers"),
        r.getAs[Long]("n_parts")) === want(cell))
    }
  }

  test("q334: brand affinity recomputes from the brute-force basket " +
      "matrix; co-occurrence bounded by both marginals") {
    val out = DsShapes.defs("q334_brand_affinity")(spark, dir)
      .collect()
    val ob = graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").cast("long"), col("p_brand"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val marg = ob.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nOrders = ob.map(_._1).distinct.length.toLong
    val want = ob.groupBy(_._1).values.toSeq
      .flatMap { xs =>
        val bs = xs.map(_._2).sorted
        for (i <- bs.indices; j <- (i + 1) until bs.length)
          yield (bs(i), bs(j))
      }
      .groupBy(identity).map { case ((a, b), xs) =>
        (a, b) -> xs.length.toLong
      }
    assert(out.length === want.size)
    out.foreach { r =>
      val k = (r.getAs[String]("brand_a"), r.getAs[String]("brand_b"))
      val nab = want(k)
      assert(r.getAs[Long]("n_ab") === nab)
      assert(r.getAs[Long]("n_a") === marg(k._1))
      assert(r.getAs[Long]("n_b") === marg(k._2))
      assert(nab <= math.min(marg(k._1), marg(k._2)))
      assert(r.getAs[Long]("lift_e6") ===
        (BigInt(nab) * nOrders * 1000000 /
          (BigInt(marg(k._1)) * marg(k._2))).toLong)
    }
  }

  test("q335: weekday cells recompute from the brute-force Monday-0 " +
      "grid and conserve each channel's orders") {
    val out = DsShapes.defs("q335_weekday_uniformity")(spark, dir)
      .collect()
    val cells = graft.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").cast("long"),
        to_date(col("o_orderdate")).as("d"))
      .collect()
      .map { r =>
        val ch = (r.getLong(0) % 3) match {
          case 0 => "store"; case 1 => "web"; case _ => "catalog"
        }
        // Monday-0, matching Spark weekday() and DuckDB isodow()-1
        val dow =
          r.getAs[java.sql.Date]("d").toLocalDate.getDayOfWeek
            .getValue - 1L
        (ch, dow)
      }
    val want = cells.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val chTotals = cells.groupBy(_._1).view
      .mapValues(_.length.toLong).toMap
    assert(out.length === want.size)
    out.foreach { r =>
      val k = (r.getAs[String]("channel"), r.getAs[Long]("dow"))
      assert(k._2 >= 0L && k._2 <= 6L)
      val (o, n) = (BigInt(want(k)), BigInt(chTotals(k._1)))
      assert(r.getAs[Long]("n_orders") === want(k))
      assert(r.getAs[Long]("expected_e2") === (n * 100 / 7).toLong)
      val d = 7 * o - n
      assert(r.getAs[Long]("chisq_contrib_e6") ===
        (d * d * 1000000 / (7 * n)).toLong)
    }
    out.groupBy(_.getAs[String]("channel")).foreach { case (ch, rs) =>
      assert(rs.map(_.getAs[Long]("n_orders")).sum === chTotals(ch))
    }
  }

  test("q336: whale share recomputes from the brute-force type-1 p99 " +
      "cut; whales are at most ~1% and carry a super-proportional " +
      "share") {
    val out = DsShapes.defs("q336_whale_share")(spark, dir).collect()
    assert(out.length === 1)
    val spends = graft.Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("decimal(38,0)")).cast("long").as("sp"))
      .collect().map(_.getAs[Long]("sp"))
    val sorted = spends.sorted
    val p99 = sorted((sorted.length * 99 + 99) / 100 - 1)
    val whales = spends.filter(_ > p99)
    val r = out.head
    assert(r.getAs[Long]("n_customers") === spends.length.toLong)
    assert(r.getAs[Long]("p99_spend_e2") === p99)
    assert(r.getAs[Long]("n_whales") === whales.length.toLong)
    assert(r.getAs[Long]("whale_spend_e2") ===
      whales.map(BigInt(_)).sum.toLong)
    assert(r.getAs[Long]("whale_share_ppm") ===
      (whales.map(BigInt(_)).sum * 1000000 /
        spends.map(BigInt(_)).sum.max(BigInt(1))).toLong)
    // strictly-above-p99 is at most 1% of customers, and their spend
    // share exceeds their headcount share (they are the top tail)
    assert(whales.length.toLong * 100 <= spends.length.toLong)
    assert(r.getAs[Long]("whale_share_ppm") >=
      whales.length.toLong * 1000000L / spends.length)
  }

  test("q337: AUC equals the brute-force pair count (ties at half " +
      "weight) and the two directions partition the pair space") {
    val out = DsShapes.defs("q337_channel_auc")(spark, dir).collect()
    assert(out.length === 1)
    val orders = graft.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").cast("long"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("v")))
    val web = orders.collect { case (k, v) if k % 3 == 1 => v }
    val store = orders.collect { case (k, v) if k % 3 == 0 => v }
    var gt = 0L; var eq = 0L; var lt = 0L
    for (w <- web; s <- store) {
      if (w > s) gt += 1 else if (w == s) eq += 1 else lt += 1
    }
    val u2 = 2 * gt + eq
    val r = out.head
    assert(r.getAs[Long]("n_web") === web.length.toLong)
    assert(r.getAs[Long]("n_store") === store.length.toLong)
    assert(r.getAs[Long]("u2") === u2)
    val denom = BigInt(2) * web.length * store.length
    assert(r.getAs[Long]("auc_ppm") ===
      (BigInt(u2) * 1000000 / denom.max(BigInt(1))).toLong)
    // both directions + ties partition every (web, store) pair
    assert(gt + eq + lt === web.length.toLong * store.length)
    // U2(w>s) + U2(s>w) covers the doubled pair space exactly
    assert(u2 + (2 * lt + eq) === denom.toLong)
    assert(r.getAs[Long]("auc_ppm") >= 0L &&
      r.getAs[Long]("auc_ppm") <= 1000000L)
  }

  test("q337: a constructed cross-channel TIE carries exactly half " +
      "weight (the corpus has no ties, so this pins the +c_web term)") {
    val tmp = java.nio.file.Files
      .createTempDirectory("q337orders").toString
    try {
      import spark.implicits._
      // keys mod 3: 1, 4 → web; 3, 6, 9 → store.
      // web values {100, 200}, store values {100, 150, 300}:
      // gt = 2 (200>100, 200>150), eq = 1 (100=100), lt = 3
      // ⇒ U2 = 2·2 + 1 = 5, denom = 2·2·3 = 12, auc = 416666 ppm
      Seq((1L, 100.0), (4L, 200.0), (3L, 100.0), (6L, 150.0),
        (9L, 300.0))
        .toDF("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
      val r = DsShapes.defs("q337_channel_auc")(spark, tmp)
        .collect().head
      assert(r.getAs[Long]("n_web") === 2L)
      assert(r.getAs[Long]("n_store") === 3L)
      assert(r.getAs[Long]("u2") === 5L)
      assert(r.getAs[Long]("auc_ppm") === 416666L)
    } finally {
      val d = new java.io.File(tmp)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(d)
    }
  }

  /** The raw (part, yr, channel-mod, distinct orders, rev e4) cells,
    * recomputed independently for the q339/q340 brute-force replays. */
  private def partYearCells: Seq[(Long, Long, Long, String, Long, Long)] =
    graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), year(col("o_orderdate")).as("yr"),
        pmod(col("o_orderkey"), lit(3)).cast("long").as("chm"),
        col("p_type"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"),
        sum((col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") -
            col("l_discount").cast("decimal(12,2)")) *
          lit(10000)).cast("decimal(38,0)")).cast("long").as("rev"))
      .collect()
      .map(r => (r.getAs[Long]("l_partkey"), r.getInt(1).toLong,
        r.getAs[Long]("chm"), r.getAs[String]("p_type"),
        r.getAs[Long]("n_orders"), r.getAs[Long]("rev")))
      .toSeq

  test("q339: the frequent-item set equals the brute-force >4 store-" +
      "order filter and its web revenue share recomputes exactly") {
    val out = DsShapes.defs("q339_frequent_item_set")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("yr") ->
        (r.getAs[Long]("n_parts"), r.getAs[Long]("n_freq_parts"),
          r.getAs[Long]("freq_web_rev_e4"), r.getAs[Long]("web_rev_e4"),
          r.getAs[Long]("freq_web_share_ppm"))).toMap
    assert(out.nonEmpty)
    // channel mod: 0 = store, 1 = web (the channelCol contract)
    val py = partYearCells.groupBy(c => (c._1, c._2)).map {
      case ((_, yr), cells) =>
        val storeOrders = cells.filter(_._3 == 0L).map(_._5).sum
        val webRev = cells.filter(_._3 == 1L).map(_._6).sum
        (yr, storeOrders, webRev)
    }.toSeq
    val expected = py.groupBy(_._1).map { case (yr, xs) =>
      val fw = xs.filter(_._2 > 4).map(_._3).sum
      val tw = xs.map(_._3).sum
      yr -> (xs.size.toLong, xs.count(_._2 > 4).toLong, fw, tw,
        fw * 1000000L / math.max(tw, 1L))
    }
    assert(out === expected)
    // the filter is NON-VACUOUS both ways at test scale: some parts
    // qualify, some don't — otherwise the >4 cut proves nothing
    assert(out.values.map(_._2).sum > 0L)
    assert(out.values.exists { case (n, f, _, _, _) => f < n })
  }

  test("q340: promo share per (year, channel) recomputes from the " +
      "brute-force conditional sums; channels partition the revenue") {
    val out = DsShapes.defs("q340_promo_channel_share")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("yr"), r.getAs[String]("channel")) ->
        (r.getAs[Long]("n_promo_parts"), r.getAs[Long]("promo_rev_e4"),
          r.getAs[Long]("total_rev_e4"),
          r.getAs[Long]("promo_share_ppm"))).toMap
    assert(out.nonEmpty)
    val chName = Map(0L -> "store", 1L -> "web", 2L -> "catalog")
    val expected = partYearCells.groupBy(c => (c._2, chName(c._3)))
      .map { case (k, cells) =>
        val promo = cells.filter(_._4 == "PROMO")
        val pr = promo.map(_._6).sum
        val tr = cells.map(_._6).sum
        k -> (promo.map(_._1).distinct.size.toLong, pr, tr,
          pr * 1000000L / math.max(tr, 1L))
      }
    assert(out === expected)
    // every (year, channel) cell present in the fact appears
    assert(out.keySet === expected.keySet)
  }

  test("q342: Benford digits recompute from brute-force first-char " +
      "counts; shares sum to ~1e6 per channel; literals are the log law") {
    val out = DsShapes.defs2("q342_benford_digits")(spark, dir).collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[Long]("digit")) ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("obs_ppm"),
          r.getAs[Long]("benford_ppm"), r.getAs[Long]("dev_ppm"))).toMap
    assert(out.nonEmpty)
    val cents = graft.Tables.load(spark, dir, "orders")
      .select(pmod(col("o_orderkey"), lit(3)).cast("long").as("chm"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val chName = Map(0L -> "store", 1L -> "web", 2L -> "catalog")
    val expected = cents
      .map { case (m, c) => (chName(m), c.toString.head.asDigit.toLong) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    assert(out.keySet === expected.keySet)
    val perChannel = expected.groupBy(_._1._1)
      .map { case (ch, m) => ch -> m.values.sum }
    out.foreach { case ((ch, d), (n, obs, ben, dev)) =>
      assert(n === expected((ch, d)))
      assert(obs === n * 1000000L / perChannel(ch))
      assert(ben === math.floor(math.log10(1.0 + 1.0 / d) * 1e6).toLong)
      assert(dev === math.abs(obs - ben))
    }
    // per-channel observed shares telescope to 1e6 (minus ≤9 ulps of
    // truncation)
    perChannel.keys.foreach { ch =>
      val tot = out.collect { case ((c, _), (_, o, _, _)) if c == ch => o }
        .sum
      assert(tot <= 1000000L && tot > 1000000L - 9L)
    }
  }

  test("q343: basket bands recompute from brute-force per-order line " +
      "counts; bands partition every LINEITEM-BACKED order exactly " +
      "once (line-less order headers have no basket and are out of " +
      "scope by design)") {
    val out = DsShapes.defs2("q343_basket_size_bands")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("channel"), r.getAs[String]("band")) ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("n_lines"),
          r.getAs[Long]("share_ppm"))).toMap
    val per = graft.Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"))
      .select(pmod(col("l_orderkey"), lit(3)).cast("long").as("chm"),
        col("n"))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n")))
    val chName = Map(0L -> "store", 1L -> "web", 2L -> "catalog")
    def band(n: Long) = if (n <= 3) "1-3" else if (n <= 7) "4-7" else "8+"
    val expected = per.groupBy { case (m, n) => (chName(m), band(n)) }
      .map { case (k, xs) =>
        k -> (xs.length.toLong, xs.map(_._2).sum)
      }
    assert(out.keySet === expected.keySet)
    val chTot = per.groupBy(p => chName(p._1))
      .map { case (ch, xs) => ch -> xs.length.toLong }
    out.foreach { case ((ch, b), (n, lines, share)) =>
      assert((n, lines) === expected((ch, b)))
      assert(share === n * 1000000L / chTot(ch))
    }
    // bands PARTITION the orders: per-channel band counts sum to the
    // channel's order count
    chTot.foreach { case (ch, t) =>
      assert(out.collect {
        case ((c, _), (n, _, _)) if c == ch => n }.sum === t)
    }
  }

  test("q344: cohort retention recomputes from a brute-force first-" +
      "month replay; k=0 is the cohort census and retention never " +
      "exceeds it") {
    val out = DsShapes.defs2("q344_cohort_retention")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("k")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("n_cohort"),
          r.getAs[Long]("retention_ppm"))).toMap
    assert(out.nonEmpty)
    val om = graft.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"),
        ((year(col("o_orderdate")) - 1995) * 12 +
          (month(col("o_orderdate")) - 1)).cast("long").as("mi"))
      .collect().map(r => (r.getAs[Long]("o_custkey"), r.getLong(1)))
    val byCust = om.groupBy(_._1)
    val cells = byCust.toSeq.flatMap { case (_, xs) =>
      val cohort = xs.map(_._2).min
      xs.map(_._2).distinct.map(mi => (cohort, mi - cohort))
    }
    val expected = cells.groupBy(identity)
      .map { case (k, xs) => k -> xs.length.toLong }
    assert(out.keySet === expected.keySet)
    val census = expected.collect { case ((c, 0L), n) => c -> n }
    out.foreach { case ((c, k), (n, nc, ppm)) =>
      assert(n === expected((c, k)))
      assert(nc === census(c))
      assert(n <= nc, "retention can never exceed the cohort census")
      assert(ppm === n * 1000000L / nc)
    }
    // every customer contributes a k=0 cell: census totals = customers
    assert(census.values.sum === byCust.size.toLong)
  }

  test("q354: discount lift recomputes from brute-force band sums; " +
      "the full-price row's lift is exactly 1e6") {
    val out = DsShapes.defs2("q354_discount_lift")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("disc_pct") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("qty_e2"),
          r.getAs[Long]("mean_qty_e2"), r.getAs[Long]("rev_e4"),
          r.getAs[Long]("lift_vs_full_price_ppm"))).toMap
    assert(out.nonEmpty)
    val lines = graft.Tables.load(spark, dir, "lineitem")
      .select((col("l_discount").cast("decimal(12,2)") * 100)
          .cast("long").as("dp"),
        (col("l_quantity").cast("decimal(12,2)") * 100)
          .cast("long").as("q"),
        (col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(12,2)") -
            col("l_discount").cast("decimal(12,2)")) *
          lit(10000)).cast("decimal(38,0)").cast("long").as("r"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val bands = lines.groupBy(_._1).map { case (dp, xs) =>
      dp -> (xs.length.toLong, xs.map(_._2).sum, xs.map(_._3).sum)
    }
    assert(out.keySet === bands.keySet)
    val base = bands(0L)._2 / bands(0L)._1
    out.foreach { case (dp, (n, q, mean, r, lift)) =>
      val (en, eq, er) = bands(dp)
      assert((n, q, r) === ((en, eq, er)))
      assert(mean === eq / en)
      assert(lift === mean * 1000000L / base)
    }
    assert(out(0L)._5 === 1000000L)
  }

  test("q361: brand share stability recomputes from a brute-force " +
      "year-share replay; per-year shares telescope to ~1e6") {
    val out = DsShapes.defs2("q361_brand_share_stability")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Long]("n_years"), r.getAs[Long]("min_share_ppm"),
          r.getAs[Long]("max_share_ppm"), r.getAs[Long]("range_ppm")))
      .toMap
    assert(out.nonEmpty)
    val yb = graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("yr"),
        col("p_brand"))
      .agg(sum((col("l_extendedprice").cast("decimal(12,2)") *
        (lit(1).cast("decimal(12,2)") -
          col("l_discount").cast("decimal(12,2)")) *
        lit(10000)).cast("decimal(38,0)")).cast("long").as("rev"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val yrTotals = yb.groupBy(_._1)
      .map { case (y, xs) => y -> xs.map(x => BigInt(x._3)).sum }
    val shares = yb.map { case (y, b, r) =>
      (b, (BigInt(r) * 1000000 / yrTotals(y).max(1)).toLong)
    }
    val expected = shares.groupBy(_._1).map { case (b, xs) =>
      val ss = xs.map(_._2)
      b -> (ss.length.toLong, ss.min, ss.max, ss.max - ss.min)
    }
    assert(out === expected)
    // within a year, the observed shares telescope to 1e6 minus at
    // most one truncation ulp per OBSERVED brand (bound derived from
    // the replay, not a hardcoded domain size)
    yrTotals.keys.foreach { y =>
      val inYear = yb.filter(_._1 == y)
      val tot = inYear.map { case (_, _, r) =>
        (BigInt(r) * 1000000 / yrTotals(y).max(1)).toLong }.sum
      assert(tot <= 1000000L && tot > 1000000L - inYear.length)
    }
  }

  test("q362: round-price bias recomputes from brute-force cents " +
      "remainders; whole dollars are a subset of whole dimes") {
    val out = DsShapes.defs2("q362_round_price_bias")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("n_whole_dollar"),
          r.getAs[Long]("whole_dollar_ppm"),
          r.getAs[Long]("n_whole_dime"),
          r.getAs[Long]("whole_dime_ppm"))).toMap
    val cents = graft.Tables.load(spark, dir, "orders")
      .select(pmod(col("o_orderkey"), lit(3)).cast("long").as("chm"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("c"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val chName = Map(0L -> "store", 1L -> "web", 2L -> "catalog")
    val expected = cents.groupBy(x => chName(x._1)).map {
      case (ch, xs) =>
        val n = xs.length.toLong
        val wd = xs.count(_._2 % 100 == 0).toLong
        val dm = xs.count(_._2 % 10 == 0).toLong
        ch -> (n, wd, wd * 1000000L / n, dm, dm * 1000000L / n)
    }
    assert(out === expected)
    out.values.foreach { case (n, wd, _, dm, _) =>
      assert(wd <= dm && dm <= n)
    }
  }

  test("q346: Kruskal-Wallis recomputes from a brute-force midrank " +
      "replay; rank sums telescope to N(N+1)") {
    val r = DsShapes.defs2("q346_kruskal_wallis")(spark, dir)
      .collect().head
    val cents = graft.Tables.load(spark, dir, "orders")
      .select(pmod(col("o_orderkey"), lit(3)).cast("long").as("chm"),
        (col("o_totalprice").cast("decimal(12,2)") * 100)
          .cast("long").as("v"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    // brute force: sort every value, assign 2x midranks per tie run
    val sorted = cents.sortBy(_._2)
    val mr2ByV = sorted.map(_._2).zipWithIndex
      .groupBy(_._1).map { case (v, xs) =>
        // 2*midrank = 2*(first 1-based rank) + (ties - 1)
        v -> (2L * (xs.map(_._2).min + 1) + (xs.length - 1))
      }
    val groups = cents.groupBy(_._1)
    val n = Map(0L -> "store", 1L -> "web", 2L -> "catalog")
      .map { case (m, name) =>
        name -> groups.getOrElse(m, Array.empty).length.toLong }
    val r2 = Map(0L -> "store", 1L -> "web", 2L -> "catalog")
      .map { case (m, name) =>
        name -> groups.getOrElse(m, Array.empty)
          .map(x => mr2ByV(x._2)).sum }
    assert(r.getAs[Long]("n_web") === n("web"))
    assert(r.getAs[Long]("n_store") === n("store"))
    assert(r.getAs[Long]("n_catalog") === n("catalog"))
    assert(r.getAs[Long]("ranksum2_web") === r2("web"))
    assert(r.getAs[Long]("ranksum2_store") === r2("store"))
    assert(r.getAs[Long]("ranksum2_catalog") === r2("catalog"))
    // rank sums telescope: Σ 2·rank over ALL rows = N(N+1)
    val bigN = n.values.sum
    assert(r2.values.sum === bigN * (bigN + 1))
    // H replay with the query's exact truncation order
    val term = Seq("web", "store", "catalog")
      .map(c => (BigInt(r2(c)) * r2(c)) / (4 * n(c))).sum
    val h = (BigInt(12) * term * 1000000) / (bigN * (bigN + 1)) -
      BigInt(3) * (bigN + 1) * 1000000
    assert(r.getAs[Long]("h_ppm") === h.toLong)
  }

  test("q347: supplier HHI recomputes from brute-force shares; a sole-" +
      "supplier brand would score 1e6 and every score is in (0, 1e6]") {
    val out = DsShapes.defs2("q347_supplier_hhi")(spark, dir).collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Long]("n_suppliers"), r.getAs[Long]("qty_e2"),
          r.getAs[Long]("hhi_ppm"))).toMap
    assert(out.nonEmpty)
    val qs = graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("l_suppkey"))
      .agg(sum((col("l_quantity").cast("decimal(12,2)") * 100)
        .cast("long")).as("q"))
      .collect()
      .map(r => (r.getString(0), r.getAs[Long]("q")))
    val expected = qs.groupBy(_._1).map { case (b, xs) =>
      val q = xs.map(x => BigInt(x._2))
      b -> (xs.length.toLong, q.sum.toLong,
        ((q.map(x => x * x).sum * 1000000) / (q.sum * q.sum)).toLong)
    }
    assert(out === expected)
    out.values.foreach { case (ns, _, hhi) =>
      assert(hhi > 0L && hhi <= 1000000L)
      // HHI is bounded below by the equal-share floor 1e6/n
      assert(hhi >= 1000000L / ns)
    }
  }

  test("q348: seasonal indices recompute from a brute-force centered " +
      "MA-12 replay; edge months without a full window are excluded") {
    val out = DsShapes.defs2("q348_seasonal_index")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("moy") ->
        (r.getAs[Long]("n_windows"), r.getAs[Long]("seasonal_ppm")))
      .toMap
    assert(out.nonEmpty)
    val m = graft.Tables.load(spark, dir, "orders")
      .groupBy(((year(col("o_orderdate")) - 1995) * 12 +
          (month(col("o_orderdate")) - 1)).cast("long").as("mi"))
      .agg(sum((col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("decimal(38,0)")).cast("long").as("rev"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val ratios = m.indices.flatMap { i =>
      val lo = i - 6
      val hi = i + 5
      // a window qualifies only when it is CALENDAR-exact: 12 rows AND
      // an 11-month span (a zero-order gap month disqualifies the
      // frames it stretches)
      if (lo < 0 || hi >= m.length ||
          m(hi)._1 - m(lo)._1 != 11) None
      else {
        val wsum = (lo to hi).map(j => BigInt(m(j)._2)).sum
        Some((m(i)._1 % 12,
          (BigInt(m(i)._2) * 12000000 / wsum).toLong))
      }
    }
    val expected = ratios.groupBy(_._1).map { case (moy, xs) =>
      moy -> (xs.length.toLong,
        xs.map(x => BigInt(x._2)).sum.toLong / xs.length)
    }
    assert(out === expected)
    // the excluded edges are real: fewer windows than months
    assert(out.values.map(_._1).sum < m.length.toLong)
  }

  test("q341: the tau=0.5 band row IS q290's Theil-Sen slope, and the " +
      "0.1/0.9 rows bracket it from the same ranked pair space") {
    val band = DsShapes.defs2("q341_slope_quantile_band")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("tau_ppm")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("slope_e4"))).toMap
    val ts = DsShapes.defs2("q290_theil_sen_trend")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("p_brand") ->
        (r.getAs[Long]("n_pairs"),
          r.getAs[Long]("trend_e4_per_month"))).toMap
    assert(ts.nonEmpty)
    // every brand emits exactly the three taus, tau=0.5 ≡ q290
    // (floor(n*0.5) + 1 = n div 2 + 1), and the band is monotone in
    // tau — quantiles of ONE ordered pair space cannot cross
    ts.foreach { case (brand, (n, median)) =>
      assert(band((brand, 500000L)) === ((n, median)))
      val lo = band((brand, 100000L))
      val hi = band((brand, 900000L))
      assert(lo._1 === n && hi._1 === n)
      assert(lo._2 <= median && median <= hi._2)
    }
    assert(band.size === ts.size * 3)
  }
}
