package graft.queries

import graft.Cut.CutOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The remaining TPC-H query shapes (Q2/Q7/Q8/Q9/Q11/Q12/Q13/Q15/Q16/Q17/
  * Q19/Q20/Q21/Q22), adapted to the driver star schema (no partsupp — the
  * part↔supplier relation is derived as `SELECT DISTINCT l_partkey,
  * l_suppkey FROM lineitem`; no ship/commit/receipt-date triple — Q21's
  * "kept waiting" becomes "sole returned supplier").
  *
  * Together with q01/q138/q143/q156/q157/q163/q164/q168 these cover every
  * TPC-H join/subquery pattern: correlated MIN and AVG subqueries, global
  * scalar thresholds, EXISTS + NOT EXISTS pairs, left-outer count
  * distributions, and disjunctive mixed-side predicates.
  *
  * All money arithmetic is scaled to e2/e4 integers before aggregation
  * (price cents × discount hundredths) so sums, ratios and comparisons are
  * integral in BOTH engines — the DuckDB hash-compare never sees a float
  * accumulation order difference. Shapes that TPC-H states as
  * `x < frac * aggregate` are restated integrally
  * (`x_e2 * n < sum_e2` etc.).
  */
object TpchShapes {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** [[t]] + [[Tables.fanOut]] — the fact read for compute-heavy shapes
    * whose pre-exchange pipeline would otherwise run inside the single
    * indivisible scan split (guide §2.5); identity at production file
    * counts. */
  private def tf(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.fanOut(t(s, dir, name))

  /** l_extendedprice*(1-l_discount) in e4 fixed-point (exact). */
  private def revE4: org.apache.spark.sql.Column =
    (col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(12,2)") -
        col("l_discount").cast("decimal(12,2)")) *
      lit(10000)).cast("decimal(38,0)")

  private val RevE4Sql =
    """CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
         (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
         * 10000 AS HUGEINT)"""

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Min-cost supplier (TPC-H Q2 shape): for each part TYPE, the parts at
    // the type's minimum retail price, with their EUROPE-region suppliers
    // (part↔supplier via the distinct lineitem pair relation). The
    // correlated-MIN subquery becomes an aggregate + equi-join — the
    // decorrelation Catalyst itself applies; the region probe is a
    // broadcast semi-join.
    "q176_min_price_supplier" -> { (s, dir) =>
      val part = t(s, dir, "part")
      val mn = part.groupBy(col("p_type").as("mt"))
        .agg(min(col("p_retailprice")).as("mn_price"))
      val ps = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val eu = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")
            .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      part
        .join(broadcast(mn),
          col("p_type") === col("mt") &&
            col("p_retailprice") === col("mn_price"))
        .join(ps, col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(eu), col("s_nationkey") === col("n_nationkey"),
          "left_semi")
        .select(col("p_type"), col("p_partkey"), col("p_name"),
          col("s_suppkey"), col("s_name"), col("s_acctbal"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey").asc,
          col("p_partkey").asc)
        .limit(20)
    },

    // Volume shipping (TPC-H Q7 shape): trade revenue between two nations
    // in either direction, by ship year. Two broadcast nation probes on a
    // fact→orders→customer join spine; the direction disjunction runs
    // AFTER both dims are bound (it needs both sides).
    "q177_volume_shipping" -> { (s, dir) =>
      val nat = broadcast(t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name")))
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          revE4.as("rev_e4"))
      li.join(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(nat.select(col("n_nationkey").as("snk"),
            col("n_name").as("supp_nation")),
          col("s_nationkey") === col("snk"))
        .join(t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(nat.select(col("n_nationkey").as("cnk"),
            col("n_name").as("cust_nation")),
          col("c_nationkey") === col("cnk"))
        .filter(
          (col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("rev_e4")).as("rev_sum"))
        .select(col("supp_nation"), col("cust_nation"), col("l_year"),
          (col("rev_sum") / lit(10000)).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },

    // National market share (TPC-H Q8 shape): of PROMO-part revenue sold
    // to ASIA-region customers, the share supplied by NATION_2 per order
    // year — conditional aggregation with the share as one integral
    // divide (ppm), never a float ratio.
    "q178_market_share" -> { (s, dir) =>
      val asiaCust = t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")
            .join(broadcast(t(s, dir, "region")
                .filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
          col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("c_custkey"))
      val promoParts = t(s, dir, "part")
        .filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val suppNation = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          revE4.as("rev_e4"))
        .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >=
                lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select(col("o_orderkey"), col("o_custkey"),
              year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("n_name") === "NATION_2", col("rev_e4"))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("nat_e4"),
          sum(col("rev_e4")).as("tot_e4"))
        .select(col("o_year"),
          expr("nat_e4 * 1000000 div tot_e4").as("mkt_share_ppm"),
          (col("nat_e4") / lit(10000)).cast("double").as("nation_revenue"),
          (col("tot_e4") / lit(10000)).cast("double").as("total_revenue"))
        .orderBy(col("o_year"))
    },

    // Product profit (TPC-H Q9 shape): profit per supplier nation and
    // order year, with supply cost synthesized as half the part's retail
    // price (no partsupp table) — profit_e4 = rev_e4 − retail·qty·5000,
    // all integral.
    "q179_product_profit" -> { (s, dir) =>
      val suppNation = broadcast(t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")
            .select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name")))
      // fanOut: three broadcast joins + decimal profit arithmetic
      // otherwise run inside the single-split scan stage (guide §2.5)
      tf(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), revE4.as("rev_e4"))
        .join(broadcast(t(s, dir, "part")
            .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders")
            .select(col("o_orderkey"),
              year(col("o_orderdate")).cast("long").as("o_year")),
          col("l_orderkey") === col("o_orderkey"))
        .join(suppNation, col("l_suppkey") === col("s_suppkey"))
        .withColumn("profit_e4",
          col("rev_e4") -
            (col("p_retailprice").cast("decimal(12,2)") *
              col("l_quantity").cast("decimal(12,2)") *
              lit(5000)).cast("decimal(38,0)"))
        .groupBy(col("n_name"), col("o_year"))
        .agg(sum(col("profit_e4")).as("profit_sum"))
        .select(col("n_name"), col("o_year"),
          (col("profit_sum") / lit(10000)).cast("double").as("profit"))
        .orderBy(col("n_name"), col("o_year").desc)
    },

    // Important parts (TPC-H Q11 shape): parts whose revenue exceeds
    // 1.5× the fair per-part share of ALL revenue — a grouped aggregate
    // probed against one global scalar, broadcast to every partition (the
    // HAVING > SUM(...) * frac pattern, with Q11's SF-dependent fraction
    // made data-adaptive). Integral restatement:
    // value_e4 · 2 · n_parts > 3 · total_e4.
    "q180_important_parts" -> { (s, dir) =>
      // localCheckpoint: the per-part aggregate (dimension-scale) feeds
      // both the scalar and the probe — without it the fact scan runs
      // twice; checkpoint (not persist) so the blocks are GC-reclaimed
      // in a long-lived session instead of pinning the cache manager
      val vals = t(s, dir, "lineitem")
        .select(col("l_partkey"), revE4.as("rev_e4"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("rev_e4")).as("value_e4"))
        .cut(true)
      val total = vals.agg(sum(col("value_e4")).as("total_e4"),
        count(lit(1)).as("n_parts"))
      vals.crossJoin(broadcast(total))
        .filter(col("value_e4") * lit(2) * col("n_parts") >
          col("total_e4") * lit(3))
        .select(col("l_partkey"),
          (col("value_e4") / lit(10000)).cast("double").as("value"),
          expr("value_e4 * 1000000 div total_e4").as("share_ppm"))
        .orderBy(col("share_ppm").desc, col("l_partkey"))
    },

    // Priority class matrix (TPC-H Q12 shape): per line status, how many
    // 1996-shipped lines belong to critical- vs normal-priority orders —
    // the two-way conditional count over a fact→orders join.
    "q181_priority_class_matrix" -> { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linestatus"))
        .join(t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit(1L)).otherwise(lit(0L))).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
            lit(0L)).otherwise(lit(1L))).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },

    // Customer order-count distribution (TPC-H Q13 shape): LEFT OUTER
    // join so no-order customers appear at c_count = 0, with the
    // filter folded into the join (a WHERE would silently drop them),
    // then a second aggregation over the first.
    "q182_order_count_distribution" -> { (s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderpriority") =!= "5-LOW")
            .select(col("o_custkey"), col("o_orderkey")),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Top supplier (TPC-H Q15 shape): suppliers whose quarter revenue
    // equals the maximum over all suppliers — revenue kept in e4 integers
    // so the `= MAX(...)` scalar probe is an exact integral equality.
    "q183_top_supplier" -> { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .select(col("l_suppkey"), revE4.as("rev_e4"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("rev_e4")).as("supp_e4"))
        .cut(true) // supplier-scale aggregate read by both MAX and probe
      val mx = rev.agg(max(col("supp_e4")).as("max_e4"))
      rev.crossJoin(broadcast(mx))
        .filter(col("supp_e4") === col("max_e4"))
        .join(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          (col("supp_e4") / lit(10000)).cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },

    // Small-quantity revenue (TPC-H Q17 shape): Brand#1 lines whose
    // quantity is under half the part's average quantity — the correlated
    // AVG subquery as a per-part aggregate rejoin, with the comparison
    // restated integrally (2·qty_e2·n < sum_e2) so no float division
    // decides membership.
    "q184_small_quantity_revenue" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_brand") === "Brand#1")
            .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"),
          (col("l_quantity").cast("decimal(12,2)") * lit(100))
            .cast("long").as("qty_e2"),
          (col("l_extendedprice").cast("decimal(12,2)") * lit(100))
            .cast("decimal(38,0)").as("price_e2"))
      // li is a FACT-scale slice: deliberately rescanned (column-pruned)
      // rather than persisted — caching a brand's share of a 100 TB fact
      // would spill; two pruned scans are the standard Q17 trade
      val avgQty = li.groupBy(col("l_partkey").as("ak"))
        .agg(sum(col("qty_e2")).as("sum_qty_e2"),
          count(lit(1)).as("n_lines_part"))
      li.join(avgQty, col("l_partkey") === col("ak"))
        .filter(col("qty_e2") * lit(2) * col("n_lines_part") <
          col("sum_qty_e2"))
        .agg(sum(col("price_e2")).as("sum_e2"),
          count(lit(1)).as("n_lines"))
        .select(
          // integral /7 first, then one float /100 — both engines see the
          // same single IEEE divide of an exactly-representable integer
          expr("CAST(sum_e2 div 7 AS DOUBLE) / 100").as("avg_yearly"),
          col("n_lines"))
    },

    // Disjunctive mixed-side predicate (TPC-H Q19 shape): an OR of three
    // brand/size/quantity conjunctions spanning both join sides. The
    // implied envelope (brand ∈ {1,2,3}, size ≤ 35, qty ≤ 30) is
    // pre-applied per side so the scans prune; the exact disjunction
    // runs on the joined rows.
    "q185_disjunctive_revenue" -> { (s, dir) =>
      val pt = broadcast(t(s, dir, "part")
        .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
          col("p_size").between(1, 35))
        .select(col("p_partkey"), col("p_brand"), col("p_size")))
      t(s, dir, "lineitem")
        .filter(col("l_quantity").between(1, 30))
        .select(col("l_partkey"), col("l_quantity"), revE4.as("rev_e4"))
        .join(pt, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(sum(col("rev_e4")).as("rev_sum"),
          count(lit(1)).as("n_lines"))
        .select(
          (col("rev_sum") / lit(10000)).cast("double").as("revenue"),
          col("n_lines"))
    },

    // Sole returned supplier (TPC-H Q21 shape): in finished orders with
    // more than one supplier, suppliers whose returned line was the ONLY
    // return in the order — the EXISTS (semi) + NOT EXISTS (anti) pair on
    // the same fact, both as keyed joins (never row-multiplying).
    "q186_sole_returned_supplier" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      val l1 = li.filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders")
            .filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select(col("l_orderkey"), col("l_suppkey"))
      val others = li
        .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val othersReturned = li.filter(col("l_returnflag") === "R")
        .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
      l1
        .join(others,
          col("l_orderkey") === col("ok2") && col("l_suppkey") =!=
            col("sk2"), "left_semi")
        .join(othersReturned,
          col("l_orderkey") === col("ok3") && col("l_suppkey") =!=
            col("sk3"), "left_anti")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(broadcast(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    },

    // Dormant rich customers (TPC-H Q22 shape): customers above the
    // average positive balance with no orders since 2000 — global scalar
    // broadcast + anti-join, with the `bal > AVG(...)` comparison
    // restated integrally (bal_e2 · n > sum_e2).
    "q187_dormant_customers" -> { (s, dir) =>
      val cust = t(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"),
          (col("c_acctbal").cast("decimal(12,2)") * lit(100))
            .cast("long").as("bal_e2"))
      val avgPos = cust.filter(col("bal_e2") > 0L)
        .agg(sum(col("bal_e2")).as("sum_e2"), count(lit(1)).as("n_pos"))
      cust.crossJoin(broadcast(avgPos))
        .filter(col("bal_e2") * col("n_pos") > col("sum_e2"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >=
              lit("2000-01-01").cast("timestamp"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          (sum(col("bal_e2")) / lit(100)).cast("double").as("totacctbal"))
        .orderBy(col("c_nationkey"))
    },

    // Parts-supplier relationship count (TPC-H Q16 shape): distinct
    // supplier counts per (brand, size) over the derived part↔supplier
    // relation, with the NOT-IN exclusion (negative-balance suppliers)
    // as a broadcast anti-join.
    "q195_part_supplier_counts" -> { (s, dir) =>
      val ps = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
      val bad = t(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      ps
        .join(broadcast(bad), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(broadcast(t(s, dir, "part")
            .filter(col("p_type") =!= "PROMO" &&
              col("p_size").isin(1, 5, 10, 15, 20, 25))
            .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
        .limit(20)
    },

    // Dominant suppliers (TPC-H Q20 shape): suppliers holding over 4× the
    // fair per-supplier share of some part's shipped quantity, restricted
    // to the AMERICA region — the nested semi-join chain (share test →
    // distinct supplier set → region probe), all comparisons integral.
    "q196_dominant_suppliers" -> { (s, dir) =>
      val sq = t(s, dir, "lineitem")
        .select(col("l_suppkey"), col("l_partkey"),
          (col("l_quantity").cast("decimal(12,2)") * lit(100))
            .cast("long").as("qty_e2"))
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("qty_e2")).as("sq_e2"))
        .cut(true) // derived partsupp-scale aggregate, read twice
      val pq = sq.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("sq_e2")).as("pq_e2"), count(lit(1)).as("n_supp"))
      val dom = sq.join(pq, col("l_partkey") === col("pk"))
        .filter(col("sq_e2") * col("n_supp") > col("pq_e2") * lit(4))
        .select(col("l_suppkey")).distinct()
      val amer = t(s, dir, "nation")
        .join(broadcast(t(s, dir, "region")
            .filter(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      t(s, dir, "supplier")
        .join(dom, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .join(broadcast(amer), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"))
        .orderBy(col("s_suppkey"))
    })

  def oracles: Map[String, String] = Map(

    "q176_min_price_supplier" ->
      """WITH mn AS (SELECT p_type AS mt, MIN(p_retailprice) AS mn_price
           FROM part GROUP BY 1),
         ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         eu AS (SELECT n_nationkey FROM nation
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE')
         SELECT p.p_type, p.p_partkey, p.p_name,
           s.s_suppkey, s.s_name, s.s_acctbal
         FROM part p
         JOIN mn ON p.p_type = mn.mt AND p.p_retailprice = mn.mn_price
         JOIN ps ON ps.l_partkey = p.p_partkey
         JOIN supplier s ON s.s_suppkey = ps.l_suppkey
         WHERE s.s_nationkey IN (SELECT n_nationkey FROM eu)
         ORDER BY s.s_acctbal DESC, s.s_suppkey, p.p_partkey
         LIMIT 20""",

    "q177_volume_shipping" ->
      s"""WITH j AS (SELECT
           sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           year(l.l_shipdate) AS l_year, $RevE4Sql AS rev_e4
         FROM lineitem l
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
             OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')))
         SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(rev_e4) AS DOUBLE) / 10000 AS revenue
         FROM j GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q178_market_share" ->
      s"""WITH j AS (SELECT
           year(o.o_orderdate) AS o_year, sn.n_name, $RevE4Sql AS rev_e4
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN customer c ON o.o_custkey = c.c_custkey
         JOIN nation cn ON c.c_nationkey = cn.n_nationkey
         JOIN region r ON cn.n_regionkey = r.r_regionkey
           AND r.r_name = 'ASIA'
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation sn ON s.s_nationkey = sn.n_nationkey
         WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'),
         a AS (SELECT o_year,
             SUM(CASE WHEN n_name = 'NATION_2' THEN rev_e4
               ELSE 0::HUGEINT END) AS nat_e4,
             SUM(rev_e4) AS tot_e4
           FROM j GROUP BY 1)
         SELECT o_year,
           CAST(nat_e4 * 1000000 // tot_e4 AS BIGINT) AS mkt_share_ppm,
           CAST(nat_e4 AS DOUBLE) / 10000 AS nation_revenue,
           CAST(tot_e4 AS DOUBLE) / 10000 AS total_revenue
         FROM a ORDER BY o_year""",

    "q179_product_profit" ->
      s"""WITH j AS (SELECT
           sn.n_name, year(o.o_orderdate) AS o_year,
           $RevE4Sql
             - CAST(CAST(p.p_retailprice AS DECIMAL(12,2)) *
                 CAST(l.l_quantity AS DECIMAL(12,2)) * 5000 AS HUGEINT)
             AS profit_e4
         FROM lineitem l
         JOIN part p ON l.l_partkey = p.p_partkey
         JOIN orders o ON l.l_orderkey = o.o_orderkey
         JOIN supplier s ON l.l_suppkey = s.s_suppkey
         JOIN nation sn ON s.s_nationkey = sn.n_nationkey)
         SELECT n_name, o_year,
           CAST(SUM(profit_e4) AS DOUBLE) / 10000 AS profit
         FROM j GROUP BY 1, 2 ORDER BY n_name, o_year DESC""",

    "q180_important_parts" ->
      s"""WITH v AS (SELECT l_partkey, SUM($RevE4Sql) AS value_e4
           FROM lineitem GROUP BY 1),
         tot AS (SELECT SUM(value_e4) AS total_e4, COUNT(*) AS n_parts
           FROM v)
         SELECT v.l_partkey,
           CAST(v.value_e4 AS DOUBLE) / 10000 AS value,
           CAST(v.value_e4 * 1000000 // tot.total_e4 AS BIGINT)
             AS share_ppm
         FROM v, tot
         WHERE v.value_e4 * 2 * tot.n_parts > tot.total_e4 * 3
         ORDER BY share_ppm DESC, v.l_partkey""",

    "q181_priority_class_matrix" ->
      """SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
             THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY 1 ORDER BY 1""",

    "q182_order_count_distribution" ->
      """WITH cc AS (SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS c_count
         FROM customer c LEFT JOIN orders o
           ON c.c_custkey = o.o_custkey
           AND o.o_orderpriority <> '5-LOW'
         GROUP BY 1)
         SELECT c_count, COUNT(*) AS custdist
         FROM cc GROUP BY 1 ORDER BY custdist DESC, c_count DESC""",

    "q183_top_supplier" ->
      s"""WITH rev AS (SELECT l_suppkey, SUM($RevE4Sql) AS supp_e4
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
           GROUP BY 1),
         mx AS (SELECT MAX(supp_e4) AS max_e4 FROM rev)
         SELECT s.s_suppkey, s.s_name,
           CAST(rev.supp_e4 AS DOUBLE) / 10000 AS total_revenue
         FROM rev
         JOIN supplier s ON rev.l_suppkey = s.s_suppkey
         CROSS JOIN mx
         WHERE rev.supp_e4 = mx.max_e4
         ORDER BY s.s_suppkey""",

    "q184_small_quantity_revenue" ->
      """WITH li AS (SELECT l.l_partkey,
           CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS qty_e2,
           CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * 100 AS HUGEINT)
             AS price_e2
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE p.p_brand = 'Brand#1'),
         pa AS (SELECT l_partkey AS ak, SUM(qty_e2) AS sum_qty_e2,
           COUNT(*) AS n_lines_part FROM li GROUP BY 1),
         f AS (SELECT li.price_e2 FROM li JOIN pa ON li.l_partkey = pa.ak
           WHERE li.qty_e2 * 2 * pa.n_lines_part < pa.sum_qty_e2)
         SELECT CAST(SUM(price_e2) // 7 AS DOUBLE) / 100 AS avg_yearly,
           COUNT(*) AS n_lines
         FROM f""",

    "q185_disjunctive_revenue" ->
      s"""SELECT CAST(SUM($RevE4Sql) AS DOUBLE) / 10000 AS revenue,
           COUNT(*) AS n_lines
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         WHERE (p.p_brand = 'Brand#1'
             AND p.p_size BETWEEN 1 AND 15
             AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#2'
             AND p.p_size BETWEEN 1 AND 25
             AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#3'
             AND p.p_size BETWEEN 1 AND 35
             AND l.l_quantity BETWEEN 20 AND 30)""",

    "q186_sole_returned_supplier" ->
      """SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
         FROM lineitem l1
         JOIN supplier s ON s.s_suppkey = l1.l_suppkey
         WHERE l1.l_returnflag = 'R'
           AND EXISTS (SELECT 1 FROM orders o
             WHERE o.o_orderkey = l1.l_orderkey
               AND o.o_orderstatus = 'F')
           AND EXISTS (SELECT 1 FROM lineitem l2
             WHERE l2.l_orderkey = l1.l_orderkey
               AND l2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM lineitem l3
             WHERE l3.l_orderkey = l1.l_orderkey
               AND l3.l_suppkey <> l1.l_suppkey
               AND l3.l_returnflag = 'R')
         GROUP BY 1, 2 ORDER BY numwait DESC, s.s_suppkey LIMIT 20""",

    "q187_dormant_customers" ->
      """WITH cust AS (SELECT c_custkey, c_nationkey,
           CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_e2
         FROM customer),
         avgpos AS (SELECT SUM(bal_e2) AS sum_e2, COUNT(*) AS n_pos
           FROM cust WHERE bal_e2 > 0)
         SELECT c.c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(c.bal_e2) AS DOUBLE) / 100 AS totacctbal
         FROM cust c, avgpos
         WHERE c.bal_e2 * avgpos.n_pos > avgpos.sum_e2
           AND NOT EXISTS (SELECT 1 FROM orders o
             WHERE o.o_custkey = c.c_custkey
               AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         GROUP BY 1 ORDER BY 1""",

    "q195_part_supplier_counts" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
         SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
         FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
         WHERE p.p_type <> 'PROMO'
           AND p.p_size IN (1, 5, 10, 15, 20, 25)
           AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             WHERE s_acctbal < 0)
         GROUP BY 1, 2
         ORDER BY supplier_cnt DESC, p.p_brand, p.p_size LIMIT 20""",

    "q196_dominant_suppliers" ->
      """WITH sq AS (SELECT l_suppkey, l_partkey,
           SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT))
             AS sq_e2
         FROM lineitem GROUP BY 1, 2),
         pq AS (SELECT l_partkey, SUM(sq_e2) AS pq_e2,
             COUNT(*) AS n_supp
           FROM sq GROUP BY 1),
         dom AS (SELECT DISTINCT sq.l_suppkey
           FROM sq JOIN pq ON sq.l_partkey = pq.l_partkey
           WHERE sq.sq_e2 * pq.n_supp > pq.pq_e2 * 4),
         amer AS (SELECT n_nationkey, n_name FROM nation
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'AMERICA')
         SELECT s.s_suppkey, s.s_name, a.n_name
         FROM supplier s
         JOIN amer a ON s.s_nationkey = a.n_nationkey
         WHERE s.s_suppkey IN (SELECT l_suppkey FROM dom)
         ORDER BY s.s_suppkey""")
}
