package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PageRank invariants: equivalence to a single-threaded reference
  * implementation on a handmade graph, determinism under repartitioning,
  * and structural facts on the co-purchase query output. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  /** Single-threaded fixed-point PageRank — the executable definition
    * the distributed operator must match bit-for-bit. */
  private def referencePageRank(edges: Seq[(Long, Long)],
      iterations: Int): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.size.toLong
    }
    val nodes = outdeg.keySet
    var rank: Map[Long, Long] = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iterations) {
      val in = edges
        .filter(e => rank.contains(e._1))
        .groupBy(_._2)
        .map { case (dst, es) =>
          dst -> es.map(e => rank(e._1) / outdeg(e._1)).sum
        }
      rank = nodes.map { n =>
        n -> (150000L + 85L * in.getOrElse(n, 0L) / 100L)
      }.toMap
    }
    rank
  }

  // Two triangles bridged by one edge, symmetrised: a classic small
  // graph with distinct degrees (bridge endpoints rank highest).
  private val rawEdges: Seq[(Long, Long)] =
    Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L))
  private val symEdges: Seq[(Long, Long)] =
    rawEdges ++ rawEdges.map { case (a, b) => (b, a) }

  test("pageRank matches the single-threaded reference bit-for-bit") {
    val df = symEdges.toDF("src", "dst")
    val got = Graph.pageRank(df, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referencePageRank(symEdges, 5))
  }

  test("pageRank is partitioning-invariant (integer arithmetic " +
      "commutes)") {
    val one = Graph.pageRank(symEdges.toDF("src", "dst").coalesce(1), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Graph.pageRank(
      symEdges.toDF("src", "dst").repartition(7), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === many)
  }

  test("bridge endpoints outrank the outer triangle nodes") {
    val got = Graph.pageRank(symEdges.toDF("src", "dst"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 and 4 carry the bridge (degree 3); all others have degree 2
    for (hub <- Seq(3L, 4L); leaf <- Seq(1L, 2L, 5L, 6L))
      assert(got(hub) > got(leaf))
  }

  test("rank floor: every node keeps at least the base mass") {
    val got = Graph.pageRank(symEdges.toDF("src", "dst"), 3)
    assert(got.filter(col("rank_e6") < 150000L).count() === 0L)
  }

  test("coOccurrenceEdges: canonical pairs symmetrised, no self-loops, " +
      "every node has out-degree") {
    val df = Seq((10L, 1L), (10L, 2L), (10L, 3L), (11L, 2L), (11L, 3L),
        (12L, 9L))
      .toDF("grp", "item")
    val e = Graph.coOccurrenceEdges(df, "grp", "item").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(e.count(p => p._1 < p._2) === e.count(p => p._1 > p._2))
    assert(!e.exists(p => p._1 == p._2))
    // group 12 is a singleton: item 9 pairs with nothing
    assert(!e.exists(p => p._1 == 9L || p._2 == 9L))
    // (2,3) co-occur in two groups but appear once per orientation
    assert(e.count(p => p == ((2L, 3L))) === 1)
  }

  /** Seeded single-threaded PPR — executable definition for
    * [[Graph.personalizedPageRank]]. */
  private def referencePpr(edges: Seq[(Long, Long)], seeds: Set[Long],
      iterations: Int): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.size.toLong
    }
    val nodes = outdeg.keySet
    var rank: Map[Long, Long] =
      nodes.map(n => n -> (if (seeds(n)) 1000000L else 0L)).toMap
    for (_ <- 1 to iterations) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => rank(e._1) / outdeg(e._1)).sum
      }
      rank = nodes.map { n =>
        n -> ((if (seeds(n)) 150000L else 0L) +
          85L * in.getOrElse(n, 0L) / 100L)
      }.toMap
    }
    rank
  }

  test("personalizedPageRank matches the seeded reference; mass " +
      "decays with distance from the seed") {
    val df = symEdges.toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.personalizedPageRank(df, seeds, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referencePpr(symEdges, Set(1L), 5))
    // seed holds the most mass; the far triangle gets less than the
    // near one (5 and 6 are 3 hops out vs 2 and 3 adjacent)
    assert(got(1L) > got(2L) && got(2L) > got(5L))
    assert(got(3L) > got(6L))
  }

  test("q255: brand degree sums cover 2m, intra pairs never exceed m, " +
      "contributions stay in [-1e6, 1e6]") {
    val out = graft.queries.GraphQueries
      .defs("q255_brand_modularity")(spark, sf("sf0.001"))
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getAs[Long]("contrib_e6")) <=
      1000000L))
    val li = graft.Tables.load(spark, sf("sf0.001"), "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
    val m = li.toDF("ok", "a").join(li.toDF("ok", "b"), "ok")
      .filter(col("a") < col("b")).select("a", "b").distinct().count()
    assert(rows.map(_.getAs[Long]("degree_sum")).sum === 2 * m)
    assert(rows.map(_.getAs[Long]("intra_pairs")).sum <= m)
  }

  test("q256: no seed-brand rows; ranks positive and descending") {
    val out = graft.queries.GraphQueries
      .defs("q256_related_parts")(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty && out.length <= 20)
    val seedBrand = graft.Tables.load(spark, sf("sf0.001"), "part")
      .agg(min(col("p_brand"))).head.getString(0)
    assert(!out.exists(_.getAs[String]("p_brand") == seedBrand))
    val ranks = out.map(_.getAs[Long]("rank_e6"))
    assert(ranks.forall(_ > 0))
    assert(ranks.sameElements(ranks.sortBy(-_)))
  }

  test("kCore matches a single-threaded peel and strips the pendant " +
      "chain from a clique") {
    // K4 clique (1-4) with a pendant chain 4-7-8: k=3 peeling removes
    // the chain in two rounds and keeps the clique intact
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 7L), (7L, 8L)).toDF("a", "b")
    def referencePeel(ps: Set[(Long, Long)], k: Int,
        rounds: Int): Map[Long, Long] = {
      var cur = ps
      for (_ <- 1 to rounds) {
        val deg = cur.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size }
        val keep = deg.filter(_._2 >= k).keySet
        cur = cur.filter(p => keep(p._1) && keep(p._2))
      }
      cur.toSeq.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
        .map { case (n, xs) => n -> xs.size.toLong }
    }
    val got = Graph.kCore(pairs, k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referencePeel(
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
        (4L, 7L), (7L, 8L)).toSet, 3, 4))
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_ === 3L))
  }

  test("q266 output: bounded, degrees descending, survivors are a " +
      "subset of the graph's parts") {
    val out = graft.queries.GraphQueries
      .defs("q266_copurchase_core")(spark, sf("sf0.001")).collect()
    assert(out.length <= 50)
    val degs = out.map(_.getLong(1))
    assert(degs.sameElements(degs.sortBy(-(_: Long))))
    assert(degs.forall(_ >= 1L))
  }

  test("q293/q294: the stored-core consumers agree with freshly-peeled " +
      "decompositions — brand counts conserve the core, overlap " +
      "identities hold") {
    val dir = sf("sf0.001")
    val li = spark.read.parquet(dir + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val kcore = Graph.kCore(Graph.canonicalPairs(li,
      "l_orderkey", "l_partkey"), k = 4, rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // q293: the brand profile's part counts PARTITION the core
    val prof = graft.queries.GraphQueries
      .defs("q293_core_brand_profile")(spark, dir).collect()
    assert(prof.map(_.getAs[Long]("n_core_parts")).sum ===
      kcore.size.toLong)
    assert(prof.map(_.getAs[Long]("degree_sum")).sum ===
      kcore.values.sum)
    assert(prof.map(_.getAs[Long]("max_degree")).max ===
      kcore.values.max)
    // q294: intersection identities against both fresh peels
    val score = Graph.sCore(Graph.weightedCanonicalPairs(li,
      "l_orderkey", "l_partkey"), s = 80L, rounds = 6)
      .collect().map(_.getLong(0)).toSet
    val ov = graft.queries.GraphQueries
      .defs("q294_core_overlap")(spark, dir).collect().head
    assert(ov.getAs[Long]("n_kcore") === kcore.size.toLong)
    assert(ov.getAs[Long]("n_score") === score.size.toLong)
    assert(ov.getAs[Long]("n_both") ===
      (kcore.keySet & score).size.toLong)
    assert(ov.getAs[Long]("n_kcore") ===
      ov.getAs[Long]("n_both") + ov.getAs[Long]("n_kcore_only"))
    assert(ov.getAs[Long]("n_score") ===
      ov.getAs[Long]("n_both") + ov.getAs[Long]("n_score_only"))
  }

  test("q295 HITS: the top authority normalises to exactly 1e6, scores " +
      "stay in (0, 1e6], and a brute-force two-round replay agrees") {
    val out = graft.queries.GraphQueries
      .defs("q295_hits_authorities")(spark, sf("sf0.001")).collect()
    assert(out.length === 20)
    val auth = out.map(_.getAs[Long]("auth_e6"))
    assert(auth.head === 1000000L) // max-normalisation law
    assert(auth.sameElements(auth.sortBy(-(_: Long))))
    assert(auth.forall(a => a > 0L && a <= 1000000L))
    assert(out.forall(_.getAs[Long]("n_buyers") >= 1L))
    // brute-force replay of the two normalised half-steps over the
    // collected bipartite relation (node-scale at sf0.001)
    val e = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
          .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byP = e.groupBy(_._2); val byC = e.groupBy(_._1)
    val a1 = byP.map { case (p, xs) => p -> xs.size.toLong * 1000000L }
    val ma1 = a1.values.max
    val a1n = a1.map { case (p, a) =>
      p -> (BigInt(a) * 1000000 / ma1).toLong }
    val h1 = byC.map { case (c, xs) =>
      c -> xs.map(x => a1n(x._2)).sum }
    val mh1 = h1.values.max
    val h1n = h1.map { case (c, h) =>
      c -> (BigInt(h) * 1000000 / mh1).toLong }
    val a2 = byP.map { case (p, xs) =>
      p -> xs.map(x => h1n(x._1)).sum }
    val ma2 = a2.values.max
    val a2n = a2.map { case (p, a) =>
      p -> (BigInt(a) * 1000000 / ma2).toLong }
    val expected = a2n.toSeq.sortBy { case (p, a) => (-a, p) }.take(20)
    assert(out.map(r => r.getAs[Long]("part_key") ->
      r.getAs[Long]("auth_e6")).toSeq === expected)
  }

  test("q296 assortativity: ppm within [-1e6, 1e6] and the cross-moments " +
      "match a brute-force recompute over the collected edge list") {
    val out = graft.queries.GraphQueries
      .defs("q296_degree_assortativity")(spark, sf("sf0.001"))
      .collect().head
    val ppm = out.getAs[Long]("assort_ppm")
    assert(ppm >= -1000000L && ppm <= 1000000L)
    // brute-force: symmetrised co-purchase edges + end degrees
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .toSeq.map(r => r.getLong(0) -> r.getLong(1))
    val byOrder = li.groupBy(_._1).map { case (_, xs) =>
      xs.map(_._2).distinct }
    val pairs = byOrder.flatMap(ps =>
      for (a <- ps; b <- ps if a < b) yield (a, b)).toSet
    val sym = pairs.toSeq.flatMap(p => Seq(p, p.swap))
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val m = BigInt(sym.size)
    val sxy = sym.map(e => BigInt(deg(e._1)) * deg(e._2)).sum
    val sx = sym.map(e => BigInt(deg(e._1))).sum
    val sx2 = sym.map(e => BigInt(deg(e._1)) * deg(e._1)).sum
    assert(out.getAs[Long]("m_edges") === m.toLong)
    assert(out.getAs[Long]("sum_xy") === sxy.toLong)
    assert(out.getAs[Long]("sum_x") === sx.toLong)
    assert(out.getAs[Long]("sum_x2") === sx2.toLong)
    val num = m * sxy - sx * sx
    val den = (m * sx2 - sx * sx).max(BigInt(1))
    val want = // truncation toward zero, the engines' shared contract
      if (num >= 0) (num * 1000000 / den).toLong
      else -(((-num) * 1000000) / den).toLong
    assert(ppm === want)
  }

  test("q299 strength assortativity: weighted cross-moments match a " +
      "brute-force recompute; ppm bounded") {
    val out = graft.queries.GraphQueries
      .defs("q299_strength_assortativity")(spark, sf("sf0.001"))
      .collect().head
    assert(out.getAs[Long]("assort_ppm") >= -1000000L &&
      out.getAs[Long]("assort_ppm") <= 1000000L)
    // brute-force weighted moments over the collected weighted pairs
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .toSeq.map(r => r.getLong(0) -> r.getLong(1)).distinct
    val wpairs = li.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity).map { case (p, xs) => (p._1, p._2, xs.size.toLong) }
    val wsym = wpairs.toSeq.flatMap { case (a, b, w) =>
      Seq((a, b, w), (b, a, w)) }
    val st = wsym.groupBy(_._1).map { case (n, xs) =>
      n -> xs.map(_._3).sum }
    val h = wsym.map(e => BigInt(e._3)).sum
    val sxy = wsym.map(e => BigInt(e._3) * st(e._1) * st(e._2)).sum
    val sx = wsym.map(e => BigInt(e._3) * st(e._1)).sum
    val sx2 = wsym.map(e => BigInt(e._3) * st(e._1) * st(e._1)).sum
    assert(out.getAs[Long]("m_edges") === wsym.size.toLong)
    assert(out.getAs[Long]("w_total") === h.toLong)
    assert(out.getAs[Long]("sum_wxy") === sxy.toLong)
    assert(out.getAs[Long]("sum_wx") === sx.toLong)
    assert(out.getAs[Long]("sum_wx2") === sx2.toLong)
    val num = h * sxy - sx * sx
    val den = (h * sx2 - sx * sx).max(BigInt(1))
    val want =
      if (num >= 0) (num * 1000000 / den).toLong
      else -(((-num) * 1000000) / den).toLong
    assert(out.getAs[Long]("assort_ppm") === want)
  }

  test("q300 HITS hubs: top hub normalises to exactly 1e6, basket size " +
      "rides along, and hubs need not be the biggest baskets") {
    val out = graft.queries.GraphQueries
      .defs("q300_hits_hubs")(spark, sf("sf0.001")).collect()
    assert(out.length === 20)
    val hubs = out.map(_.getAs[Long]("hub_e6"))
    assert(hubs.head === 1000000L)
    assert(hubs.sameElements(hubs.sortBy(-(_: Long))))
    assert(hubs.forall(h => h > 0L && h <= 1000000L))
    assert(out.forall(_.getAs[Long]("n_parts") >= 1L))
    // the hub order is authority-weighted, not raw basket size: the
    // n_parts column must NOT be globally descending in lockstep with
    // hub rank on real data (if it ever were, the score would be
    // degree in disguise — flag for a closer look)
    val np = out.map(_.getAs[Long]("n_parts"))
    assert(np.zip(np.tail).exists { case (a, b) => b > a },
      "hub ranking coincides exactly with basket size — suspicious")
  }

  test("q301 rich club: levels nest (nodes/edges shrink, k16 ⊆ k8 ⊆ " +
      "k4) and counts match a brute-force threshold recompute") {
    val out = graft.queries.GraphQueries
      .defs("q301_rich_club")(spark, sf("sf0.001")).collect().head
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .toSeq.map(r => r.getLong(0) -> r.getLong(1)).distinct
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.distinct
    val deg = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    def level(k: Int): (Long, Long, Long) = {
      val nodes = deg.filter(_._2 > k).keySet
      val edges = pairs.count(p => nodes(p._1) && nodes(p._2)).toLong
      val n = nodes.size.toLong
      (n, edges,
        edges * 2000000L / math.max(n * (n - 1), 1L))
    }
    for ((k, pre) <- Seq(4 -> "k4", 8 -> "k8", 16 -> "k16")) {
      val (n, e, d) = level(k)
      assert(out.getAs[Long](s"${pre}_nodes") === n, pre)
      assert(out.getAs[Long](s"${pre}_edges") === e, pre)
      assert(out.getAs[Long](s"${pre}_density_ppm") === d, pre)
    }
    assert(out.getAs[Long]("k8_nodes") <= out.getAs[Long]("k4_nodes"))
    assert(out.getAs[Long]("k16_nodes") <= out.getAs[Long]("k8_nodes"))
    assert(out.getAs[Long]("k8_edges") <= out.getAs[Long]("k4_edges"))
  }

  test("q302 transitivity: the degree-ordered triangle count equals a " +
      "brute-force enumeration and the wedge denominator is sum C(d,2)") {
    val out = graft.queries.GraphQueries
      .defs("q302_transitivity")(spark, sf("sf0.001")).collect().head
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .toSeq.map(r => r.getLong(0) -> r.getLong(1)).distinct
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.distinct.toSet
    val adj = pairs.toSeq.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    // brute-force triangles: for each canonical pair, count common
    // neighbours ABOVE both endpoints (each triangle counted once at
    // its smallest vertex)
    val triangles = pairs.toSeq.map { case (a, b) =>
      (adj(a) & adj(b)).count(c => c > b).toLong
    }.sum
    val wedges = adj.values.map(s =>
      s.size.toLong * (s.size - 1) / 2).sum
    assert(out.getAs[Long]("n_nodes") === adj.size.toLong)
    assert(out.getAs[Long]("n_edges") === pairs.size.toLong)
    assert(out.getAs[Long]("n_wedges") === wedges)
    assert(out.getAs[Long]("n_triangles") === triangles)
    assert(out.getAs[Long]("transitivity_ppm") ===
      (BigInt(3) * triangles * 1000000 /
        BigInt(math.max(wedges, 1L))).toLong)
  }

  test("q303 truss support: histogram equals the brute-force per-edge " +
      "common-neighbour counts, and total support is 3x the q302 " +
      "triangle count") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q303_truss_support")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val li = spark.read.parquet(dir + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .toSeq.map(r => r.getLong(0) -> r.getLong(1)).distinct
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.distinct
    val adj = pairs.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    // support of edge {a,b} IS the common-neighbour count
    val want = pairs.map { case (a, b) => (adj(a) & adj(b)).size.toLong }
      .groupBy(identity).map { case (sup, xs) => sup -> xs.size.toLong }
    assert(out === want)
    // conservation: the histogram covers every edge, and Σ support
    // equals 3x the transitivity query's triangle count
    assert(out.values.sum === pairs.size.toLong)
    val tri = graft.queries.GraphQueries
      .defs("q302_transitivity")(spark, dir).collect().head
      .getAs[Long]("n_triangles")
    assert(out.map { case (sup, n) => sup * n }.sum === 3L * tri)
  }

  test("q251 output: 20 rows, ranks descending, all above base mass") {
    val out = graft.queries.GraphQueries
      .defs("q251_pagerank")(spark, sf("sf0.001")).collect()
    assert(out.length === 20)
    val ranks = out.map(_.getLong(1))
    assert(ranks.sameElements(ranks.sortBy(-_)))
    assert(ranks.forall(_ >= 150000L))
  }

  /** Single-threaded weighted PageRank — contribution (rank·w)/W_src
    * with integer truncation, the executable definition the weighted
    * operator must match bit-for-bit. */
  private def referenceWeightedPageRank(
      edges: Seq[(Long, Long, Long)],
      iterations: Int): Map[Long, Long] = {
    val wout = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(_._3).sum
    }
    val nodes = wout.keySet
    var rank: Map[Long, Long] = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iterations) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) =>
          (BigInt(rank(s)) * w / wout(s)).toLong
        }.sum
      }
      rank = nodes.map { n =>
        n -> (150000L + 85L * in.getOrElse(n, 0L) / 100L)
      }.toMap
    }
    rank
  }

  test("weightedPageRank matches the single-threaded weighted " +
      "reference; heavier edges pull more rank") {
    // triangle with one heavy edge 1-2 (w=10) vs light edges (w=1)
    val raw = Seq((1L, 2L, 10L), (1L, 3L, 1L), (2L, 3L, 1L))
    val sym = raw ++ raw.map { case (a, b, w) => (b, a, w) }
    val got = Graph.weightedPageRank(
      sym.toDF("src", "dst", "w"), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referenceWeightedPageRank(sym, 5))
    // 1 and 2 exchange most of their mass over the heavy edge and
    // starve 3 below the uniform rank
    assert(got(3L) < 1000000L && got(1L) > got(3L) && got(2L) > got(3L))
  }

  test("weightedPageRank with all weights 1 equals plain pageRank " +
      "bit-for-bit") {
    val w1 = symEdges.map { case (a, b) => (a, b, 1L) }
    val weighted = Graph.weightedPageRank(
      w1.toDF("src", "dst", "w"), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = Graph.pageRank(symEdges.toDF("src", "dst"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weighted === plain)
  }

  test("weightedPageRank adaptive width: overflow-scale weights force " +
      "the decimal path and still match the exact BigInt reference") {
    // rank_e6 (1e6) × w (4e18) overflows BIGINT, so the measured guard
    // (max(rank) > Long.MaxValue / max(w)) must route every iteration
    // through DECIMAL(38,0); the BigInt reference is exact either way,
    // so a long-path overflow would surface as a mismatch (or an ANSI
    // throw), and the small-weight triangle test above pins the long
    // path — together they pin the paths' bit-equality claim.
    val heavy = 4000000000000000000L
    val raw = Seq((1L, 2L, heavy), (1L, 3L, 1L), (2L, 3L, 1L))
    val sym = raw ++ raw.map { case (a, b, w) => (b, a, w) }
    val got = Graph.weightedPageRank(
      sym.toDF("src", "dst", "w"), iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referenceWeightedPageRank(sym, 3))
  }

  test("q364 rich-club: matches the brute-force degree-threshold count " +
      "over collected pairs; phi in [0, 1e6]; node counts shrink up " +
      "the ladder") {
    val dir = sf("sf0.001")
    val rows = graft.queries.GraphQueries.defs("q364_rich_club")(
      spark, dir).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L, 4L, 8L, 16L))
    // brute force from the same canonical pair derivation
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = li.groupBy(_._1).values.flatMap { g =>
      val items = g.map(_._2).distinct.toSeq
      for (a <- items; b <- items if a < b) yield (a, b)
    }.toSet
    val deg = pairs.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
    for (r <- rows) {
      val k = r.getLong(0)
      val richN = deg.count(_._2 > k).toLong
      val richE = pairs.count(p => deg(p._1) > k && deg(p._2) > k).toLong
      assert(r.getLong(1) === richN)
      assert(r.getLong(2) === richE)
      val phi = r.getLong(3)
      assert(phi >= 0L && phi <= 1000000L)
      if (richN >= 2)
        assert(phi ===
          BigInt(richE) * 2000000 / (BigInt(richN) * (richN - 1)))
    }
    assert(rows.map(_.getLong(1)).sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q366 recsys holdout: matches the brute-force split/train/score " +
      "replay; hits bounded by test pairs") {
    val dir = sf("sf0.001")
    val row = graft.queries.GraphQueries.defs("q366_recsys_holdout")(
      spark, dir).head()
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def pairsOf(rows: Array[(Long, Long)]): Map[(Long, Long), Long] =
      rows.groupBy(_._1).values.flatMap { g =>
        val items = g.map(_._2).distinct.toSeq
        for (a <- items; b <- items if a < b) yield (a, b)
      }.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val train = pairsOf(li.filter(_._1 % 5 != 0))
    val test = pairsOf(li.filter(_._1 % 5 == 0)).keySet
    // top-3 by (weight desc, dst asc) over both orientations
    val recs = train.toSeq
      .flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
      .groupBy(_._1).toSeq.flatMap { case (src, es) =>
        es.sortBy(e => (-e._3, e._2)).take(3).map(e => (src, e._2))
      }.toSet
    val hits = test.count(p =>
      recs.contains((p._1, p._2)) || recs.contains((p._2, p._1))).toLong
    assert(row.getAs[Long]("n_train_pairs") === train.size.toLong)
    assert(row.getAs[Long]("n_test_pairs") === test.size.toLong)
    assert(row.getAs[Long]("n_hits") === hits)
    assert(hits <= test.size.toLong)
    assert(row.getAs[Long]("hit_rate_ppm") ===
      (BigInt(hits) * 1000000 / BigInt(test.size max 1)).toLong)
  }

  /** Single-threaded synchronous LPA — the executable definition the
    * distributed operator must match bit-for-bit: most frequent
    * neighbour label, ties to the smallest label. */
  private def referenceLpa(pairs: Seq[(Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val sym = pairs ++ pairs.map { case (a, b) => (b, a) }
    val neighbors = sym.groupBy(_._2)
      .map { case (dst, es) => dst -> es.map(_._1) }
    var labels: Map[Long, Long] =
      sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = neighbors.map { case (node, ns) =>
        val freq = ns.map(labels).groupBy(identity)
          .map { case (l, xs) => l -> xs.size }
        // max count, then min label
        node -> freq.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  test("labelPropagation matches the single-threaded reference " +
      "bit-for-bit and is partitioning-invariant") {
    // two triangles bridged by one edge: labels collapse within each
    // triangle; the tie-breaks are exercised by the symmetric degrees
    val pairs = rawEdges
    val ref = referenceLpa(pairs, 4)
    val one = Graph.labelPropagation(pairs.toDF("a", "b").coalesce(1), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val many = Graph.labelPropagation(
      pairs.toDF("a", "b").repartition(7), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one === ref)
    assert(many === ref)
    // every node is labeled, labels are node ids
    assert(one.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(one.values.toSet.subsetOf(one.keySet))
  }

  test("labelPropagation tie-break: on a square (all ties) every node " +
      "adopts its smallest neighbour — deterministic, not arbitrary") {
    // 4-cycle 1-2-3-4: each node has two neighbours with distinct
    // labels (count tie every round) — the min-label rule must win
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val got = Graph.labelPropagation(square.toDF("a", "b"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referenceLpa(square, 3))
  }

  test("LPA keeps weakly-bridged cliques apart where reachability " +
      "would fuse them: two triangles over one bridge get two labels") {
    val got = Graph.labelPropagation(rawEdges.toDF("a", "b"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one connected component, but TWO communities: each triangle
    // converges to its own label (the bridge carries one vote, the
    // intra-triangle majority carries two)
    assert(got.values.toSet.size === 2)
    assert(Set(got(1L), got(2L), got(3L)).size === 1)
    assert(Set(got(4L), got(5L), got(6L)).size === 1)
  }

  /** Single-threaded weighted synchronous LPA: votes are weight sums,
    * ties to the smallest label. */
  private def referenceWeightedLpa(pairs: Seq[(Long, Long, Long)],
      rounds: Int): Map[Long, Long] = {
    val sym = pairs ++ pairs.map { case (a, b, w) => (b, a, w) }
    val neighbors = sym.groupBy(_._2)
      .map { case (dst, es) => dst -> es.map(e => (e._1, e._3)) }
    var labels: Map[Long, Long] =
      sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = neighbors.map { case (node, ns) =>
        val votes = ns.groupBy(e => labels(e._1))
          .map { case (l, es) => l -> es.map(_._2).sum }
        node -> votes.toSeq.minBy { case (l, v) => (-v, l) }._1
      }
    }
    labels
  }

  test("weightedLabelPropagation matches the weighted reference; a " +
      "strong cluster with a heavy bridge absorbs the bridged node " +
      "where unweighted LPA keeps it home; w=1 equals unweighted") {
    // triangle {1,2,3} light; triangle {4,5,6} heavy-internal (w=5);
    // bridge 3-4 (w=3). Weighted: 3 is pulled into the 4-5-6 family
    // (and the strong triangle holds together); unweighted: 3's three
    // equal votes tie-break to label 1, so it stays home.
    val wpairs = Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L),
      (3L, 4L, 3L), (4L, 5L, 5L), (4L, 6L, 5L), (5L, 6L, 5L))
    val weighted = Graph.weightedLabelPropagation(
      wpairs.toDF("a", "b", "w"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weighted === referenceWeightedLpa(wpairs, 4))
    assert(weighted(3L) === weighted(4L) &&
      weighted(4L) === weighted(5L) && weighted(5L) === weighted(6L),
      "the heavy bridge + strong cluster must absorb node 3")
    val unweighted = Graph.labelPropagation(
      wpairs.map(p => (p._1, p._2)).toDF("a", "b"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unweighted(3L) !== unweighted(4L),
      "without weights node 3 stays with its own triangle")
    // degeneracy: all weights 1 ≡ unweighted, bit-for-bit
    val w1 = rawEdges.map { case (a, b) => (a, b, 1L) }
    val viaWeighted = Graph.weightedLabelPropagation(
      w1.toDF("a", "b", "w"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = Graph.labelPropagation(rawEdges.toDF("a", "b"), 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaWeighted === plain)
  }

  test("q271 output: family sizes descending, >= 2 docs each, id " +
      "span consistent") {
    val out = graft.queries.GraphQueries
      .defs("q271_dedup_communities")(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty && out.length <= 40)
    val sizes = out.map(_.getLong(1))
    assert(sizes.sameElements(sizes.sortBy(-(_: Long))))
    assert(sizes.forall(_ >= 2L))
    assert(out.forall(r => r.getLong(2) <= r.getLong(3)))
  }

  test("hopDistance matches single-threaded BFS, caps at maxHops, " +
      "omits unreached nodes") {
    // path 1-2-3-4-5 plus isolated-from-seed 7-8; seed = {1}
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (7L, 8L))
    val sym = raw ++ raw.map { case (a, b) => (b, a) }
    def bfs(maxHops: Int): Map[Long, Long] = {
      var dist = Map(1L -> 0L)
      for (_ <- 1 to maxHops)
        dist = (dist.toSeq ++ sym.flatMap { case (s, d) =>
          dist.get(s).map(h => d -> (h + 1L))
        }).groupBy(_._1).map { case (n, hs) => n -> hs.map(_._2).min }
      dist
    }
    val seeds = Seq(1L).toDF("node")
    val got = Graph.hopDistance(sym.toDF("src", "dst"), seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === bfs(3))
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    assert(!got.contains(5L), "beyond maxHops stays absent")
    assert(!got.contains(7L) && !got.contains(8L),
      "unreached nodes stay absent, never NULL")
    // partitioning invariance (min commutes)
    val many = Graph.hopDistance(
      sym.toDF("src", "dst").repartition(7), seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(many === got)
  }

  test("allPairsHopDistance matches per-source single-threaded BFS; " +
      "self-distance is 0; symmetric edges give a symmetric matrix") {
    // two components: path 1-2-3 and dyad 7-8
    val raw = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    val sym = raw ++ raw.map { case (a, b) => (b, a) }
    def bfs(src: Long, maxHops: Int): Map[Long, Long] = {
      var dist = Map(src -> 0L)
      for (_ <- 1 to maxHops)
        dist = (dist.toSeq ++ sym.flatMap { case (s, d) =>
          dist.get(s).map(h => d -> (h + 1L))
        }).groupBy(_._1).map { case (n, hs) => n -> hs.map(_._2).min }
      dist
    }
    val got = Graph.allPairsHopDistance(sym.toDF("src", "dst"), 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val nodes = sym.flatMap(e => Seq(e._1, e._2)).distinct
    val want = nodes.flatMap(s =>
      bfs(s, 6).map { case (n, d) => (s, n) -> d }).toMap
    assert(got === want)
    nodes.foreach(n => assert(got((n, n)) === 0L))
    // unreached cross-component pairs are ABSENT, never NULL
    assert(!got.contains((1L, 7L)) && !got.contains((8L, 3L)))
    // symmetric edges ⇒ symmetric distances
    got.foreach { case ((a, b), d) => assert(got((b, a)) === d) }
    // partitioning invariance (min commutes)
    val many = Graph.allPairsHopDistance(
      sym.toDF("src", "dst").repartition(7), 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(many === got)
  }

  test("allPairsHopDistanceBounded is bit-identical to the distributed " +
      "loop on both sides of the node gate (fused path AND fallback)") {
    val raw = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L))
    val sym = (raw ++ raw.map { case (a, b) => (b, a) })
      .toDF("src", "dst")
    val want = Graph.allPairsHopDistance(sym, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // fused path: 6 nodes clear the default gate
    val fused = Graph.allPairsHopDistanceBounded(sym, 6).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fused === want)
    // schema parity: same names, same node type, hops LONG
    val d = Graph.allPairsHopDistanceBounded(sym, 6)
    assert(d.schema.fieldNames.toSeq === Seq("src", "node", "hops"))
    assert(d.schema("hops").dataType ===
      org.apache.spark.sql.types.LongType)
    // fallback path: a 5-node gate forces the distributed loop on the
    // same input — callers above the gate never lose the scale shape
    val fell = Graph.allPairsHopDistanceBounded(sym, 6, maxNodes = 5L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fell === want)
    // maxHops truncation matches: at 1 hop only direct edges + diagonal
    val want1 = Graph.allPairsHopDistance(sym, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fused1 = Graph.allPairsHopDistanceBounded(sym, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fused1 === want1)
    assert(!fused1.contains((1L, 3L)), "2-hop pair absent at maxHops=1")
  }

  test("q349: closeness recomputes from a brute-force all-pairs BFS " +
      "replay; the Wasserman-Faust score is 1e6 on a complete graph " +
      "member") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q349_brand_closeness")(spark, dir).collect()
      .map(r => r.getAs[String]("brand") ->
        (r.getAs[Long]("n_reachable"), r.getAs[Long]("sum_hops"),
          r.getAs[Long]("n_nodes"), r.getAs[Long]("closeness_ppm")))
      .toMap
    assert(out.nonEmpty)
    val ob = graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("p_brand")).distinct()
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1)))
    val edges: Set[(String, String)] =
      ob.groupBy(_._1).values.toSeq.flatMap { xs =>
        val bs = xs.map(_._2).distinct
        for (a <- bs; b <- bs if a != b) yield (a, b)
      }.toSet
    val nodes = edges.map(_._1).toSeq.sorted
    def bfs(src: String): Map[String, Long] = {
      var dist = Map(src -> 0L)
      for (_ <- 1 to 6)
        dist = (dist.toSeq ++ edges.toSeq.flatMap { case (s, d) =>
          dist.get(s).map(h => d -> (h + 1L))
        }).groupBy(_._1).map { case (n, hs) => n -> hs.map(_._2).min }
      dist
    }
    assert(out.keySet === nodes.toSet)
    nodes.foreach { b =>
      val d = bfs(b)
      val r = d.size.toLong
      val sd = d.values.sum
      val (gr, gsd, gn, gppm) = out(b)
      assert(gr === r)
      assert(gsd === sd)
      assert(gn === nodes.length.toLong)
      assert(gppm === (r - 1) * (r - 1) * 1000000L /
        math.max((nodes.length - 1).toLong * sd, 1L))
      // on a fully-connected component (every hop = 1), the score
      // is exactly 1e6; never above
      assert(gppm <= 1000000L)
      if (sd == r - 1 && r == nodes.length.toLong)
        assert(gppm === 1000000L)
    }
  }

  test("q274 output: hop histogram starts at 0, hops ascending and " +
      "bounded by 4") {
    val out = graft.queries.GraphQueries
      .defs("q274_brand_hop_profile")(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    val hops = out.map(_.getLong(0))
    assert(hops.head === 0L)
    assert(hops.sameElements(hops.sorted))
    assert(hops.forall(h => h >= 0L && h <= 4L))
    assert(out.forall(_.getLong(1) >= 1L))
  }

  test("sCore matches a single-threaded strength peel; a heavy dyad " +
      "survives where degree-peeling drops it; w=1 equals kCore") {
    def referencePeel(ps: Set[(Long, Long, Long)], s: Long,
        rounds: Int): Map[Long, Long] = {
      var cur = ps
      for (_ <- 1 to rounds) {
        val st = cur.toSeq.flatMap(p => Seq(p._1 -> p._3, p._2 -> p._3))
          .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).sum }
        val keep = st.filter(_._2 >= s).keySet
        cur = cur.filter(p => keep(p._1) && keep(p._2))
      }
      cur.toSeq.flatMap(p => Seq(p._1 -> p._3, p._2 -> p._3))
        .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).sum }
    }
    // heavy dyad 1-2 (w=10, degree 1 each) + a light star around 5
    // (degrees 3, all w=1): s=6 keeps the dyad and drops the star —
    // the exact inversion of degree-based peeling
    val wpairs = Seq((1L, 2L, 10L), (5L, 6L, 1L), (5L, 7L, 1L),
      (5L, 8L, 1L))
    val got = Graph.sCore(wpairs.toDF("a", "b", "w"), s = 6L,
        rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referencePeel(wpairs.toSet, 6L, 4))
    assert(got === Map(1L -> 10L, 2L -> 10L))
    // w=1 degeneracy: strength IS degree, so sCore(k) ≡ kCore(k)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 7L), (7L, 8L))
    val viaS = Graph.sCore(
      pairs.map(p => (p._1, p._2, 1L)).toDF("a", "b", "w"),
      s = 3L, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaK = Graph.kCore(pairs.toDF("a", "b"), k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaS === viaK)
  }

  test("q276 output: bounded, strengths descending and at or above " +
      "the s threshold") {
    val out = graft.queries.GraphQueries
      .defs("q276_copurchase_strength_core")(spark, sf("sf0.001"))
      .collect()
    assert(out.length <= 50)
    val st = out.map(_.getLong(1))
    assert(st.sameElements(st.sortBy(-(_: Long))))
    // a survivor's FINAL strength can only count surviving partners,
    // and the last peel guaranteed each was >= s before the final
    // edge drop — so final strengths sit at or above s minus dropped
    // partners; assert the weaker structural fact: all positive
    assert(st.forall(_ >= 1L))
  }

  test("q275: LPA-partition modularity obeys the q255 conservation " +
      "laws — degree sums cover 2m, intra pairs never exceed m, " +
      "contributions stay in [-1e6, 1e6]") {
    val out = graft.queries.GraphQueries
      .defs("q275_lpa_modularity")(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    val li = graft.Tables.load(spark, sf("sf0.001"), "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val m = Graph.canonicalPairs(li, "l_orderkey", "l_partkey").count()
    // every edge endpoint belongs to exactly one community (top-20 cut
    // can hide some, so compare as bounds)
    assert(out.map(_.getAs[Long]("degree_sum")).sum <= 2 * m)
    assert(out.forall(_.getAs[Long]("intra_pairs") <= m))
    assert(out.forall { r =>
      val c = r.getAs[Long]("contrib_e6")
      c >= -1000000L && c <= 1000000L
    })
    // contributions arrive largest-first
    val cs = out.map(_.getAs[Long]("contrib_e6"))
    assert(cs.sameElements(cs.sortBy(-(_: Long))))
  }

  test("q287: weighted modularity equals a BigInt brute-force recompute " +
      "over the weighted pairs and the stored weighted labels") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q287_weighted_modularity")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    // independent replay: weighted pairs + a fresh weighted LPA run
    // (deterministic, so it equals the stored artifact)
    val wp = Graph.weightedCanonicalPairs(
        graft.Tables.load(spark, dir, "lineitem"),
        "l_orderkey", "l_partkey")
    val pairs = wp.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val labels =
      try Graph.weightedLabelPropagation(wp, 4).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      finally Graph.release(wp)
    val bigW = BigInt(pairs.map(_._3).sum)
    val strength = pairs.flatMap { case (a, b, w) =>
      Seq(a -> w, b -> w) }
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).sum }
    val byC = strength.groupBy { case (n, _) => labels(n) }
    val intraW = pairs
      .filter { case (a, b, _) => labels(a) == labels(b) }
      .groupBy { case (a, _, _) => labels(a) }
      .map { case (l, xs) => l -> xs.map(_._3).sum }
    val expect = byC.map { case (l, members) =>
      val sSum = BigInt(members.values.sum)
      val iw = BigInt(intraW.getOrElse(l, 0L))
      val contrib = iw * 1000000 / bigW -
        sSum * sSum * 1000000 / (4 * bigW * bigW)
      (l, members.size.toLong, members.values.sum, intraW.getOrElse(l, 0L),
        contrib.toLong)
    }.toSeq.sortBy { case (l, _, _, _, c) => (-c, l) }.take(20)
    val got = out.map(r => (r.getAs[Long]("community"),
      r.getAs[Long]("n_parts"), r.getAs[Long]("strength_sum"),
      r.getAs[Long]("intra_w"), r.getAs[Long]("contrib_e6"))).toSeq
    assert(got === expect)
  }

  test("q288: seed-scoped neighbor Jaccard equals a brute-force " +
      "recompute over adjacency sets, exact top-20 with deterministic " +
      "tie-break") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q288_neighbor_jaccard")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    val pr = Graph.canonicalPairs(
      graft.Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey")
    val edges =
      try pr.collect().map(r => (r.getLong(0), r.getLong(1)))
      finally Graph.release(pr)
    val part = graft.Tables.load(spark, dir, "part")
      .select(col("p_partkey").cast("long"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val seedBrand = part.map(_._2).min
    val seeds = part.collect { case (k, b) if b == seedBrand => k }.toSet
    val adj = (edges.map { case (a, b) => a -> b } ++
      edges.map { case (a, b) => b -> a })
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    // wedge-generated (seed, counterpart) pairs: x seeded, y any other
    // member of a shared neighborhood
    val common = adj.values.toSeq
      .flatMap { ns =>
        for (x <- ns.toSeq if seeds(x); y <- ns.toSeq if y != x)
          yield (x, y)
      }
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val expect = common.toSeq.map { case ((x, y), c) =>
      val (dx, dy) = (adj(x).size.toLong, adj(y).size.toLong)
      (x, y, c, dx, dy, c * 1000000L / (dx + dy - c))
    }.sortBy { case (x, y, _, _, _, j) => (-j, x, y) }.take(20)
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expect)
    // every reported seed part really carries the seed brand
    assert(out.forall(r => seeds(r.getLong(0))))
  }

  test("q291: resource-allocation index equals the brute-force " +
      "1e6-div-degree replay over the seed-scoped wedges") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q291_resource_allocation")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    val pr = Graph.canonicalPairs(
      graft.Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey")
    val edges =
      try pr.collect().map(r => (r.getLong(0), r.getLong(1)))
      finally Graph.release(pr)
    val part = graft.Tables.load(spark, dir, "part")
      .select(col("p_partkey").cast("long"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val seedBrand = part.map(_._2).min
    val seeds = part.collect { case (k, b) if b == seedBrand => k }.toSet
    val adj = (edges.map { case (a, b) => a -> b } ++
      edges.map { case (a, b) => b -> a })
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    // each via contributes 1e6 div deg(via), truncated PER TERM — the
    // same fixed-point contract the query and its oracle share
    val scored = adj.toSeq.flatMap { case (via, ns) =>
      val term = 1000000L / ns.size
      for (x <- ns.toSeq if seeds(x); y <- ns.toSeq if y != x)
        yield ((x, y), term)
    }.groupBy(_._1).map { case (p, xs) =>
      (p._1, p._2, xs.size.toLong, xs.map(_._2).sum)
    }
    val expect = scored.toSeq
      .sortBy { case (x, y, _, ra) => (-ra, x, y) }.take(20)
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq
    assert(got === expect)
    // hub discounting really discriminates: scores are not all equal
    assert(expect.map(_._4).distinct.length > 1 ||
      expect.length < 20)
  }

  test("q268 output: community sizes descending, members >= 3, span " +
      "consistent") {
    val out = graft.queries.GraphQueries
      .defs("q268_copurchase_communities")(spark, sf("sf0.001"))
      .collect()
    assert(out.nonEmpty && out.length <= 30)
    val sizes = out.map(_.getLong(1))
    assert(sizes.sameElements(sizes.sortBy(-(_: Long))))
    assert(sizes.forall(_ >= 3L))
    assert(out.forall(r => r.getLong(2) <= r.getLong(3)))
  }

  test("q277 output: one row over the stored label artifact; counts " +
      "partition the node set and the flag matches the stable count") {
    val out = graft.queries.GraphQueries
      .defs("q277_lpa_convergence")(spark, sf("sf0.001"))
      .collect()
    assert(out.length === 1)
    val r = out.head
    val (n, stable, osc, converged) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(n > 0L)
    assert(stable + osc <= n)
    assert(converged === (if (stable == n) 1L else 0L))
    // the stored assignment q277 diagnoses is the one q268 summarises:
    // total community membership equals the artifact's node count
    // (no >=3 filter on this check — sum over ALL labels)
    val labels = graft.queries.GraphQueries
      .defs("q268_copurchase_communities")(spark, sf("sf0.001"))
    assert(labels.count() > 0)
  }

  test("weightedCanonicalPairs counts DISTINCT co-occurring groups: an " +
      "item duplicated within one group contributes 1, and the " +
      "all-weights-1 case equals canonicalPairs exactly") {
    // group 10 lists item 1 twice beside item 2: raw join-row counting
    // would give (1,2) weight 2; distinct-group semantics give 1.
    // group 20 repeats the (1,2) co-occurrence: true weight 2.
    val df = Seq((10L, 1L), (10L, 1L), (10L, 2L),
      (20L, 1L), (20L, 2L), (20L, 3L)).toDF("g", "item")
    val w = Graph.weightedCanonicalPairs(df, "g", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(w === Map((1L, 2L) -> 2L, (1L, 3L) -> 1L, (2L, 3L) -> 1L))
    // degeneration law: pairs with w dropped == the distinct pairs
    val unweighted = Graph.canonicalPairs(df, "g", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w.keySet === unweighted)
  }

  test("canonicalPairs hands back an EAGER local checkpoint: the " +
      "relation is a materialised leaf before any consumer acts") {
    val df = Seq((10L, 1L), (10L, 2L), (20L, 2L), (20L, 3L))
      .toDF("g", "item")
    for (pairs <- Seq(Graph.canonicalPairs(df, "g", "item"),
        Graph.weightedCanonicalPairs(df, "g", "item"))) {
      val leaf = pairs.queryExecution.analyzed
      assert(leaf.isInstanceOf[
        org.apache.spark.sql.execution.LogicalRDD])
      val rdd = leaf
        .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd
      // an eager localCheckpoint has already computed and cached every
      // partition; a lazy one would report 0 cached until first action
      val info = spark.sparkContext.getRDDStorageInfo
        .find(_.id == rdd.id)
      assert(info.exists(i => i.numCachedPartitions == rdd.getNumPartitions),
        s"pairs RDD ${rdd.id} not fully cached at build: $info")
      Graph.release(pairs)
    }
  }

  test("broadcastRanks routes the loop's join decision through the " +
      "JoinAdvisor: broadcast under the limit, shuffle above, never on " +
      "an empty side") {
    assert(Graph.broadcastRanks(edgeRows = 1000000L, nodeRows = 50000L))
    assert(!Graph.broadcastRanks(edgeRows = 1000000000L,
      nodeRows = Graph.BroadcastNodeLimit + 1))
    assert(!Graph.broadcastRanks(edgeRows = 0L, nodeRows = 10L))
    // explicit limit override (the advisor's threshold-as-input rule)
    assert(!Graph.broadcastRanks(edgeRows = 1000L, nodeRows = 100L,
      limit = 10L))
  }

  test("LPA diagnostic flags a period-2 oscillator and a converged " +
      "run: the single edge swaps labels forever; the triangle fixes") {
    // single edge 1-2: l0=(1,2), l1=(2,1), l2=(1,2), ... pure period 2
    val (edgeLabels, edgeDiag) = Graph.labelPropagationWithDiag(
      Seq((1L, 2L)).toDF("a", "b"), rounds = 4)
    assert(edgeDiag.nNodes === 2L)
    assert(edgeDiag.nStable === 0L)
    assert(edgeDiag.nOscillating === 2L)
    assert(!edgeDiag.converged)
    // the assignment itself still matches the single-threaded reference
    val gotEdge = edgeLabels.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotEdge === referenceLpa(Seq((1L, 2L)), 4))

    // triangle: labels collapse to 1 by round 2 and stay — converged
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val (_, triDiag) = Graph.labelPropagationWithDiag(
      tri.toDF("a", "b"), rounds = 4)
    assert(triDiag.nNodes === 3L)
    assert(triDiag.nStable === 3L)
    assert(triDiag.nOscillating === 0L)
    assert(triDiag.converged)

    // weighted variant shares the loop: a heavy edge can break the
    // square's all-ties oscillation where the unweighted run cycles
    val square = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (1L, 4L, 1L))
    val (_, sqDiag) = Graph.weightedLabelPropagationWithDiag(
      square.toDF("a", "b", "w"), rounds = 4)
    assert(sqDiag.nNodes === 4L)
  }

  /** Brute-force Rand index in ppm: iterate every node pair, count
    * agreements (together in both partitions, or apart in both). */
  private def bruteRandPpm(a: Map[Long, Long],
      b: Map[Long, Long]): Long = {
    val nodes = (a.keySet & b.keySet).toSeq.sorted
    val pairs = for {
      i <- nodes.indices; j <- (i + 1) until nodes.length
    } yield (nodes(i), nodes(j))
    if (pairs.isEmpty) 0L
    else {
      val agree = pairs.count { case (x, y) =>
        (a(x) == a(y)) == (b(x) == b(y))
      }
      agree.toLong * 1000000L / pairs.length
    }
  }

  test("randIndexPpm equals the brute-force pairwise Rand index; " +
      "identical partitions score 1e6, maximally-split vs merged 0") {
    def df(m: Map[Long, Long]) = m.toSeq.toDF("node", "label")
    // mixed case: two partitions of 6 nodes that partly agree
    val pa = Map(1L -> 10L, 2L -> 10L, 3L -> 10L,
      4L -> 20L, 5L -> 20L, 6L -> 30L)
    val pb = Map(1L -> 7L, 2L -> 7L, 3L -> 8L,
      4L -> 8L, 5L -> 9L, 6L -> 9L)
    val got = Graph.randIndexPpm(df(pa), df(pb)).collect().head
    assert(got.getAs[Long]("n_nodes") === 6L)
    assert(got.getAs[Long]("n_comm_a") === 3L)
    assert(got.getAs[Long]("n_comm_b") === 3L)
    assert(got.getAs[Long]("rand_ppm") === bruteRandPpm(pa, pb))
    // self-comparison: every pair agrees
    val self = Graph.randIndexPpm(df(pa), df(pa)).collect().head
    assert(self.getAs[Long]("rand_ppm") === 1000000L)
    assert(self.getAs[Long]("same_same_pairs") === 4L) // C(3,2)+C(2,2)
    // all-singletons vs one-cluster: NO pair agrees — 0 ppm
    val singles = Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L)
    val merged = Map(1L -> 9L, 2L -> 9L, 3L -> 9L, 4L -> 9L)
    assert(Graph.randIndexPpm(df(singles), df(merged)).collect()
      .head.getAs[Long]("rand_ppm") === 0L)
    // only the SHARED node set is compared
    val extra = Graph.randIndexPpm(df(pa + (99L -> 5L)), df(pb))
      .collect().head
    assert(extra.getAs[Long]("n_nodes") === 6L)
  }

  test("kCoreArtifact / sCoreArtifact equal their lazy twins and hand " +
      "back a caller-owned materialised node-scale relation (r14 ask " +
      "#3)") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 7L), (7L, 8L)).toDF("a", "b")
    val viaLazy = Graph.kCore(pairs, k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val art = Graph.kCoreArtifact(pairs, k = 3, rounds = 4)
    // the artifact is an eager checkpoint: its analyzed plan is a
    // LogicalRDD leaf (what a shared cache retains and can release)
    assert(art.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    assert(art.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === viaLazy)
    val wpairs = Seq((1L, 2L, 10L), (5L, 6L, 1L), (5L, 7L, 1L),
      (5L, 8L, 1L)).toDF("a", "b", "w")
    val sLazy = Graph.sCore(wpairs, s = 6L, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sArt = Graph.sCoreArtifact(wpairs, s = 6L, rounds = 4)
    assert(sArt.queryExecution.analyzed
      .isInstanceOf[org.apache.spark.sql.execution.LogicalRDD])
    assert(sArt.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      === sLazy)
  }

  test("resource allocation vs Adamic-Adar: same ranking on the q291 " +
      "wedge shape (why RA is the oracle-gated variant: 1e6 div deg " +
      "is exact fixed point, 1/ln(deg) is not)") {
    // Both indices sum a decreasing function of the shared neighbour's
    // degree — RA 1/deg, AA 1/ln(deg) — so on candidate pairs whose
    // common-neighbour degree MULTISETS are comparable elementwise they
    // must order identically. Construct exactly that: seed node 1 with
    // three counterparts reached through (a) two degree-2 hubs, (b) one
    // degree-2 hub, (c) one degree-4 hub — RA scores 1000000, 500000,
    // 250000 and AA scores 2/ln2, 1/ln2, 1/ln4 rank the same way.
    // AA over doubles cannot hash-match a DuckDB oracle bit-for-bit
    // (ln is transcendental; the last-ulp contract in GoeQueries'
    // scaladoc), which is WHY q291 ships RA — this spec documents the
    // deliberate choice by pinning their agreement where it must hold.
    val sym = Seq(
      // hubs 10, 11: degree 2 each, linking seed 1 <-> counterpart 2
      (1L, 10L), (10L, 1L), (2L, 10L), (10L, 2L),
      (1L, 11L), (11L, 1L), (2L, 11L), (11L, 2L),
      // hub 12: degree 2, linking 1 <-> 3
      (1L, 12L), (12L, 1L), (3L, 12L), (12L, 3L),
      // hub 13: degree 4, linking 1 <-> 4 (plus fillers 5, 6)
      (1L, 13L), (13L, 1L), (4L, 13L), (13L, 4L),
      (5L, 13L), (13L, 5L), (6L, 13L), (13L, 6L))
    val deg = sym.groupBy(_._1).map { case (n, xs) => n -> xs.size }
    def wedges(x: Long): Seq[Long] = // shared-neighbour degrees of (1, x)
      sym.filter(_._2 == 1L).map(_._1)
        .intersect(sym.filter(_._2 == x).map(_._1))
        .map(v => deg(v).toLong)
    val candidates = Seq(2L, 3L, 4L)
    val aa = candidates.map(x =>
      x -> wedges(x).map(d => 1.0 / math.log(d.toDouble)).sum)
    // the ENGINE-side q291 plan shape over the same graph: seed-scoped
    // wedge join + sum(1e6 div via_deg)
    val symDf = sym.toDF("src", "dst")
    val degDf = symDf.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val ra = symDf.select(col("src").as("via"), col("dst").as("x"))
      .filter(col("x") === 1L)
      .join(symDf.select(col("src").as("via"), col("dst").as("y")),
        "via")
      .filter(col("x") =!= col("y"))
      .join(degDf.select(col("node").as("via"),
        col("deg").as("via_deg")), "via")
      .groupBy(col("y"))
      .agg(sum(expr("1000000 div via_deg")).as("ra_e6"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact fixed-point scores, bit-stable — what lets q291 carry a
    // hash-compared oracle
    assert(ra === Map(2L -> 1000000L, 3L -> 500000L, 4L -> 250000L,
      5L -> 250000L, 6L -> 250000L))
    // rank-order agreement with AA on the three named counterparts
    val raOrder = candidates.sortBy(x => (-ra(x), x))
    val aaOrder = aa.sortBy(t => (-t._2, t._1)).map(_._1)
    assert(raOrder === aaOrder)
  }

  test("seededLabelPropagation: a fixed-point seed is returned " +
      "unchanged, unseeded nodes start from the cold identity") {
    // triangle 10-11-12 plus a new node 1 joined to all three (K4)
    val pairs = Seq((10L, 11L), (11L, 12L), (10L, 12L),
      (1L, 10L), (1L, 11L), (1L, 12L)).toDF("a", "b")
    // the triangle's converged assignment (cold LPA lands on min id 10)
    val seeds = Seq((10L, 10L), (11L, 10L), (12L, 10L))
      .toDF("node", "label")
    val warm = Graph.seededLabelPropagation(pairs, seeds, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the stable region keeps its literal label; the new node adopts it
    assert(warm === Map(1L -> 10L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
    // cold on the same graph relabels everything to the new min id —
    // the flip warm start exists to avoid
    val cold = Graph.labelPropagation(pairs, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cold === Map(1L -> 1L, 10L -> 1L, 11L -> 1L, 12L -> 1L))
    // an empty seed relation IS the cold operator
    val empty = Seq.empty[(Long, Long)].toDF("node", "label")
    val seededEmpty = Graph.seededLabelPropagation(pairs, empty, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(seededEmpty === cold)
  }

  test("q306 edge clustering: ppm equals the brute-force common-" +
      "neighbour recompute, bounded by construction, top-20 ordered") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q306_edge_clustering")(spark, dir).collect()
    assert(out.length === 20)
    val li = spark.read.parquet(dir + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .toSeq.map(r => r.getLong(0) -> r.getLong(1)).distinct
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.distinct
    val adj = pairs.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val want = pairs.map { case (a, b) =>
      val sup = (adj(a) & adj(b)).size.toLong
      val minDeg = math.min(adj(a).size, adj(b).size).toLong
      ((a, b), (sup, minDeg,
        sup * 1000000L / math.max(minDeg - 1, 1L)))
    }.toMap
    out.foreach { r =>
      val (sup, minDeg, ecc) =
        want((r.getAs[Long]("a"), r.getAs[Long]("b")))
      assert(r.getAs[Long]("support") === sup)
      assert(r.getAs[Long]("min_deg") === minDeg)
      assert(r.getAs[Long]("ecc_ppm") === ecc)
      // the structural bound: the other endpoint occupies a slot
      assert(sup <= minDeg - 1)
      assert(ecc >= 0L && ecc <= 1000000L)
    }
    // top-20 by (ecc desc, a, b) against the full brute-force ranking
    val full = want.toSeq
      .map { case ((a, b), (_, _, e)) => (e, a, b) }
      .sortBy { case (e, a, b) => (-e, a, b) }.take(20)
    assert(out.map(r => (r.getAs[Long]("ecc_ppm"), r.getAs[Long]("a"),
      r.getAs[Long]("b"))).toSeq === full)
  }

  test("q307 bridge brand mix: the four cells partition the edge set " +
      "and match a brute-force support x brand recompute") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q307_bridge_brand_mix")(spark, dir).collect().head
    val li = spark.read.parquet(dir + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .toSeq.map(r => r.getLong(0) -> r.getLong(1)).distinct
    val brand = spark.read.parquet(dir + "/part.parquet")
      .select(col("p_partkey"), col("p_brand")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.distinct
    val adj = pairs.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    def cell(bridge: Boolean, within: Boolean): Long =
      pairs.count { case (a, b) =>
        ((adj(a) & adj(b)).isEmpty == bridge) &&
          ((brand(a) == brand(b)) == within)
      }.toLong
    val bc = cell(bridge = true, within = false)
    val bw = cell(bridge = true, within = true)
    val sc = cell(bridge = false, within = false)
    val sw = cell(bridge = false, within = true)
    assert(out.getAs[Long]("bridge_cross") === bc)
    assert(out.getAs[Long]("bridge_within") === bw)
    assert(out.getAs[Long]("supported_cross") === sc)
    assert(out.getAs[Long]("supported_within") === sw)
    assert(bc + bw + sc + sw === pairs.size.toLong)
    assert(out.getAs[Long]("bridge_cross_ppm") ===
      bc * 1000000L / math.max(bc + bw, 1L))
    assert(out.getAs[Long]("supported_cross_ppm") ===
      sc * 1000000L / math.max(sc + sw, 1L))
  }

  test("q311 knn curve: per-degree mean neighbour degree matches the " +
      "brute-force recompute; edge ends conserve 2x edges") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q311_avg_neighbor_degree")(spark, dir).collect()
    val li = spark.read.parquet(dir + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .toSeq.map(r => r.getLong(0) -> r.getLong(1)).distinct
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.distinct
    val adj = pairs.flatMap(p => Seq(p, p.swap))
      .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
    val want = adj.toSeq
      // vs is a Set — materialise to Seq BEFORE mapping to degree
      // pairs, or neighbours of equal degree collapse into one end
      .flatMap { case (u, vs) => vs.toSeq.map(v =>
        (adj(u).size.toLong, adj(v).size.toLong)) }
      .groupBy(_._1).map { case (d, es) =>
        d -> (es.length.toLong,
          es.map(e => BigInt(e._2)).sum * 1000000 / es.length) }
    assert(out.length === want.size)
    out.foreach { r =>
      val (n, a) = want(r.getAs[Long]("degree"))
      assert(r.getAs[Long]("n_edge_ends") === n)
      assert(BigInt(r.getAs[Long]("avg_nbr_deg_ppm")) === a)
    }
    assert(out.map(_.getAs[Long]("n_edge_ends")).sum ===
      2L * pairs.length)
  }

  test("q313 degree tail: bands are bit-lengths, survival is a right " +
      "cumulative that conserves the node count and decreases") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q313_degree_tail")(spark, dir).collect()
    val li = spark.read.parquet(dir + "/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .toSeq.map(r => r.getLong(0) -> r.getLong(1)).distinct
    val pairs = li.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2)
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.distinct
    val degs = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).values.map(_.size.toLong).toSeq
    val want = degs.groupBy(d => 64L - java.lang.Long
      .numberOfLeadingZeros(d)).map { case (b, xs) =>
        b -> xs.size.toLong }
    assert(out.map(r => r.getAs[Long]("band") ->
      r.getAs[Long]("n_nodes")).toMap === want)
    // survival: right-cumulative, starts at the total, never rises
    val rows = out.sortBy(_.getAs[Long]("band"))
    assert(rows.head.getAs[Long]("n_at_least_floor") ===
      degs.size.toLong)
    val surv = rows.map(_.getAs[Long]("n_at_least_floor"))
    surv.zip(surv.tail).foreach { case (hi, lo) => assert(hi >= lo) }
    rows.foreach { r =>
      assert(r.getAs[Long]("floor_deg") ===
        (1L << (r.getAs[Long]("band") - 1)))
      assert(r.getAs[Long]("n_at_least_floor") ===
        degs.count(d => d >= r.getAs[Long]("floor_deg")).toLong)
    }
  }

  test("q317 basket lift: top-20 equals the brute-force " +
      "n_ab*N/(n_a*n_b) ranking; support bounded by both marginals") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q317_basket_lift")(spark, dir).collect()
    val lp = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").cast("long"),
        col("l_partkey").cast("long"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = lp.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    val nItem = lp.groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val nOrders = byOrder.size.toLong
    val want = byOrder.values.toSeq
      .flatMap(ps => for {
        i <- ps.indices; j <- (i + 1) until ps.length
      } yield (ps(i), ps(j)))
      .groupBy(identity).toSeq
      .collect { case ((a, b), xs) if xs.length >= 3 =>
        val w = xs.length.toLong
        (a, b, w, nItem(a), nItem(b),
          (BigInt(w) * nOrders * 1000000 /
            (BigInt(nItem(a)) * nItem(b))).toLong)
      }
      .sortBy { case (a, b, _, _, _, l) => (-l, a, b) }.take(20)
    assert(out.length === want.length)
    out.zip(want).foreach { case (r, (a, b, w, na, nb, l)) =>
      assert(r.getAs[Long]("part_a") === a)
      assert(r.getAs[Long]("part_b") === b)
      assert(r.getAs[Long]("n_ab") === w)
      assert(r.getAs[Long]("n_a") === na)
      assert(r.getAs[Long]("n_b") === nb)
      assert(r.getAs[Long]("n_orders") === nOrders)
      assert(r.getAs[Long]("lift_e6") === l)
      // co-occurrence can't exceed either marginal
      assert(w <= na && w <= nb)
    }
  }

  test("q324 isolated parts: the per-brand counts recompute from the " +
      "brute-force pair node set and conserve the catalog") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q324_isolated_parts")(spark, dir).collect()
    val lp = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").cast("long"),
        col("l_partkey").cast("long"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // a part is IN the graph iff some order pairs it with another part
    val inGraph = lp.groupBy(_._1).values
      .collect { case ps if ps.length >= 2 => ps.map(_._2) }
      .flatten.toSet
    val parts = graft.Tables.load(spark, dir, "part")
      .select(col("p_partkey").cast("long"), col("p_brand"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = parts.groupBy(_._2).map { case (brand, xs) =>
      brand -> (xs.length.toLong,
        xs.count(p => !inGraph.contains(p._1)).toLong)
    }
    assert(out.length === want.size)
    out.foreach { r =>
      val (n, iso) = want(r.getAs[String]("p_brand"))
      assert(r.getAs[Long]("n_parts") === n)
      assert(r.getAs[Long]("n_isolated") === iso)
      assert(r.getAs[Long]("isolated_ppm") === iso * 1000000L / n)
    }
    assert(out.map(_.getAs[Long]("n_parts")).sum === parts.length.toLong)
  }

  test("truss peel: K4 survives the k=4 peel, lone triangles and " +
      "pendants drop in round one") {
    // K4 on {1,2,3,4} (every edge in 2 triangles), a lone triangle
    // {10,11,12} (support 1 each), a pendant edge {20,21} (support 0)
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (10L, 11L), (10L, 12L), (11L, 12L), (20L, 21L))
      .toDF("a", "b").localCheckpoint(true)
    try {
      val traj = Graph.trussPeelTrajectory(pairs, k = 4L, rounds = 3)
        .orderBy(col("round")).collect()
      assert(traj.map(r => (r.getAs[Long]("round"),
        r.getAs[Long]("n_edges_in"), r.getAs[Long]("n_dropped"),
        r.getAs[Long]("n_survivors"))).toSeq ===
        Seq((1L, 10L, 4L, 6L), (2L, 6L, 0L, 6L), (3L, 6L, 0L, 6L)))
    } finally Graph.release(pairs)
  }

  test("q326 truss trajectory: rounds chain (in(r+1) = survivors(r)) " +
      "and recompute from a brute-force support peel") {
    // sf0.01, NOT sf0.001: the sf0.001 co-purchase graph is dense
    // enough that no edge ever drops (identity trajectory — any
    // implementation passes); at sf0.01 rounds drop 115662/65/2 edges,
    // so the recompute genuinely pins the peel (r15 review)
    val dir = sf("sf0.01")
    val out = graft.queries.GraphQueries
      .defs("q326_truss_peel")(spark, dir).collect()
      .sortBy(_.getAs[Long]("round"))
    val lp = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").cast("long"),
        col("l_partkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = lp.groupBy(_._1).values
      .flatMap { ps =>
        val parts = ps.map(_._2).distinct.sorted
        for (i <- parts.indices; j <- (i + 1) until parts.length)
          yield (parts(i), parts(j))
      }.toSet
    val want = (1 to 3).map { r =>
      val adj = edges.toSeq.flatMap(e => Seq(e, e.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val kept = edges.filter { case (a, b) =>
        (adj(a) & adj(b)).size >= 2
      }
      val row = (r.toLong, edges.size.toLong,
        (edges.size - kept.size).toLong, kept.size.toLong)
      edges = kept
      row
    }
    assert(out.map(r => (r.getAs[Long]("round"),
      r.getAs[Long]("n_edges_in"), r.getAs[Long]("n_dropped"),
      r.getAs[Long]("n_survivors"))).toSeq === want)
    assert(out.map(_.getAs[Long]("n_dropped")).sum > 0L,
      "no edge ever dropped — the peel was not exercised")
    out.sliding(2).foreach {
      case Array(prev, next) =>
        assert(next.getAs[Long]("n_edges_in") ===
          prev.getAs[Long]("n_survivors"))
      case _ =>
    }
  }

  test("q338: size bands recompute from the reference 4-round LPA " +
      "and conserve the node universe") {
    val dir = sf("sf0.001")
    val out = graft.queries.GraphQueries
      .defs("q338_community_size_profile")(spark, dir).collect()
      .sortBy(_.getAs[Long]("band"))
    val lp = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").cast("long"),
        col("l_partkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = lp.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- (i + 1) until parts.length)
        yield (parts(i), parts(j))
    }.toSet.toSeq
    val labels = referenceLpa(pairs, 4)
    val sizes = labels.values.groupBy(identity)
      .map { case (_, xs) => xs.size.toLong }
    val want = sizes.groupBy(sz => 64L - java.lang.Long
        .numberOfLeadingZeros(sz))
      .map { case (band, xs) =>
        band -> (xs.size.toLong, xs.sum)
      }
    assert(out.length === want.size)
    val total = labels.size.toLong
    out.foreach { r =>
      val (nc, nm) = want(r.getAs[Long]("band"))
      assert(r.getAs[Long]("n_communities") === nc)
      assert(r.getAs[Long]("n_members") === nm)
      assert(r.getAs[Long]("floor_size") ===
        (1L << (r.getAs[Long]("band") - 1)))
      assert(r.getAs[Long]("member_share_ppm") ===
        nm * 1000000L / total)
    }
    assert(out.map(_.getAs[Long]("n_members")).sum === total)
  }

  test("weightedPageRank static long-safety bound routes the constant " +
      "long path and matches the per-round adaptive probe bit-for-bit") {
    // small weights: 1e6*n*maxW fits BIGINT, so the loop takes the
    // probe-free constant-contribution path; the reference is exact
    // BigInt, so any width error would surface as a value diff (the
    // overflow-scale test above pins the decimal fallback)
    val wraw = Seq((1L, 2L, 7L), (1L, 3L, 1L), (2L, 3L, 3L), (3L, 4L, 2L))
    val wsym = (wraw ++ wraw.map { case (a, b, w) => (b, a, w) })
    val got = Graph.weightedPageRank(wsym.toDF("src", "dst", "w"), 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === referenceWeightedPageRank(wsym, 5))
  }
}
