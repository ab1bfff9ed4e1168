package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Graph

/** Graph-analytics queries over co-occurrence structure in the star
  * schema — the iterative message-passing family (PageRank) alongside
  * the existing one-shot graph measures (q141 triangles, q199
  * clustering coefficients, connected components).
  *
  * Oracle discipline: ranks are e6 fixed-point BIGINTs with truncating
  * integer division at every step (see [[graft.operators.Graph]]), so
  * the DuckDB oracle — the same five iterations unrolled as CTEs —
  * hash-matches the distributed run exactly.
  */
object GraphQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The near-duplicate candidate graph as canonical pairs `(a, b)` —
    * the banded minhash join (q28's relation), shared by the centrality
    * (q264) and community (q271) views. `lshCandidates` already returns
    * a distinct pair relation, so no re-dedup; the EAGER checkpoint
    * (the `Graph.canonicalPairs` contract) lets both symmetrisation
    * orientations read one materialisation with no first-consumer
    * race. */
  private def lshPairs(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    Dedup.lshCandidates(
        Dedup.minhashSignatures(t(s, dir, "documents"),
          PipelineQueries.NumHashes),
        PipelineQueries.NumHashes, PipelineQueries.Bands)
      .select(col("id_a").as("a"), col("id_b").as("b"))
      .localCheckpoint(true)
  }


  /** Cached artifacts KEYED by (session, key): the PqModels train-once
    * discipline applied to the graph family. The build runs on first
    * use, every later consumer reads the retained relation. Keyed (not
    * single-slot — the r13 shape): a long-lived listener alternating
    * requests across two data dirs must not rebuild the lineitem
    * self-join (and 4 LPA rounds) on every flip. LRU with a small cap
    * bounds the retained storage; eviction RELEASES the artifact when it
    * belongs to the evicting caller's session (an entry from another
    * session is just dropped — its checkpoints die with that session,
    * and releasing through a foreign/stopped context is not safe).
    * `buildCount` is the test hook pinning build-once behavior. */
  private[graft] final class DirCache[K, A](
      build: (SparkSession, K) => A, releaseFn: A => Unit, cap: Int = 4) {
    private val cached =
      scala.collection.mutable.LinkedHashMap.empty[(SparkSession, K), A]
    private var builds = 0L
    private[graft] def buildCount: Long = synchronized(builds)
    def get(s: SparkSession, key: K): A = synchronized {
      val k = (s, key)
      cached.remove(k) match {
        case Some(a) =>
          cached.put(k, a) // re-insert: most-recently-used at the tail
          a
        case None =>
          builds += 1
          val a = build(s, key)
          cached.put(k, a)
          while (cached.size > cap) {
            val (ek, ea) = cached.head
            cached.remove(ek)
            if (ek._1 eq s) releaseFn(ea)
          }
          a
      }
    }
  }

  /** The co-purchase CANONICAL PAIRS artifact: one lineitem self-join
    * per data dir, shared by q251/q255/q256/q266/q268/q274/q275/q277 —
    * each query stays self-contained (first caller builds), but a
    * bench pass no longer re-derives the same edge relation per
    * query. */
  private val pairsCache = new DirCache[String, DataFrame]((s, dir) =>
    Graph.canonicalPairs(t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")),
      "l_orderkey", "l_partkey"), Graph.release)

  /** The WEIGHTED pairs artifact (q272/q273/q276). */
  private val wpairsCache = new DirCache[String, DataFrame]((s, dir) =>
    Graph.weightedCanonicalPairs(t(s, dir, "lineitem"),
      "l_orderkey", "l_partkey"), Graph.release)

  /** LPA rounds for the co-purchase community family — one constant so
    * the stored label artifact, its consumers and their oracles can
    * never disagree on the round count. */
  private val LpaRounds = 4

  /** The PERSISTED LPA LABEL artifact: the 4-round assignment (plus
    * its convergence diagnostic) computed once per data dir over the
    * shared pairs artifact. q268 summarises it, q275 scores its
    * modularity, q277 reports its convergence — none of them re-runs
    * the rounds. Labels are deterministic (synchronous integer LPA),
    * so stored-vs-recomputed is unobservable in any result — the
    * DuckDB oracles still unroll the rounds from scratch. */
  private val labelsCache =
    new DirCache[String, (DataFrame, Graph.LpaDiag)]((s, dir) =>
      Graph.labelPropagationWithDiag(pairsCache.get(s, dir), LpaRounds),
      (a: (DataFrame, Graph.LpaDiag)) => Graph.release(a._1))

  /** The WEIGHTED LPA label artifact — the weighted twin of
    * [[labelsCache]]: the 4-round weighted assignment computed once per
    * (data dir, session) over the shared weighted pairs. q273
    * summarises it, q287 scores its weighted modularity; neither
    * re-runs the rounds. */
  private val wLabelsCache = new DirCache[String, DataFrame]((s, dir) =>
    Graph.weightedLabelPropagation(wpairsCache.get(s, dir), LpaRounds),
    Graph.release)

  /** YEAR-scoped LPA label artifacts for the drift family, keyed
    * (dir, year): both 1996/1997 subgraph labellings are deterministic
    * per data dir, and q282's two cold LPA runs made it the suite's most
    * expensive query — cached, a drift call pays only the
    * contingency-scale Rand index. The year PAIRS feed exactly one LPA
    * run and are released inside the build; only the labels (one
    * node-scale relation per year) stay resident, LRU-bounded. */
  private val yearLabelsCache =
    new DirCache[(String, Int), DataFrame]((s, key) => {
      val (dir, y) = key
      val p = Graph.canonicalPairs(
        t(s, dir, "lineitem")
          .filter(year(col("l_shipdate")) === y)
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey")
      try Graph.labelPropagation(p, LpaRounds)
      finally Graph.release(p)
    }, Graph.release)

  /** The alphabetically-first brand's part keys — the shared seed set
    * of the proximity pair q256 (PPR mass) / q274 (hop distance). */
  private def seedBrandParts(s: SparkSession, dir: String): DataFrame = {
    val partDim = t(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val seedBrand = partDim.agg(min(col("p_brand")).as("seed_brand"))
    partDim.crossJoin(broadcast(seedBrand))
      .filter(col("p_brand") === col("seed_brand"))
      .select(col("p_partkey").as("node"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PageRank over the part co-purchase graph: parts are linked when
    // they appear in the same order; five damped iterations in exact
    // e6 fixed-point; top 20 by rank. Each iteration is one shuffle
    // join + one keyed aggregate over the edge relation — the scale
    // shape a 100 TB co-purchase graph needs (edges co-partitioned on
    // src, node-scale rank relation moving, lineage cut per round).
    "q251_pagerank" -> { (s, dir) =>
      Graph.pageRank(Graph.symmetrize(pairsCache.get(s, dir)),
          iterations = 5)
        .select(col("node").as("part_key"), col("rank_e6"))
        .orderBy(col("rank_e6").desc, col("part_key"))
        .limit(20)
    },

    // Modularity of the brand partition over the co-purchase graph:
    // per brand, Q's contribution e_c/m − (d_c/2m)² in exact e6
    // fixed-point (DECIMAL(38,0) cross-terms — the 100 TB overflow
    // path). Positive contributions mark brands whose parts are bought
    // together more than degree-chance predicts. Everything reduces to
    // the canonical pair relation + two keyed aggregates; the global
    // edge count rides a broadcast single-row cross join.
    "q255_brand_modularity" -> { (s, dir) =>
      val pairs = pairsCache.get(s, dir)
      val brand = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val m = pairs.agg(count(lit(1)).as("m"))
      val deg = pairs.select(col("a").as("node"))
        .unionByName(pairs.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val degByBrand = deg
        .join(brand, col("node") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("deg")).as("degree_sum"))
      val intra = pairs
        .join(brand.select(col("p_partkey").as("a"),
          col("p_brand").as("brand_a")), Seq("a"))
        .join(brand.select(col("p_partkey").as("b"),
          col("p_brand").as("brand_b")), Seq("b"))
        .filter(col("brand_a") === col("brand_b"))
        .groupBy(col("brand_a").as("p_brand"))
        .agg(count(lit(1)).as("intra_pairs"))
      degByBrand
        .join(intra, Seq("p_brand"), "left_outer")
        .na.fill(0L, Seq("intra_pairs"))
        .crossJoin(broadcast(m))
        .withColumn("contrib_e6",
          expr("""CAST(intra_pairs AS DECIMAL(38,0)) * 1000000
                    div CAST(m AS DECIMAL(38,0))
                  - CAST(degree_sum AS DECIMAL(38,0))
                    * CAST(degree_sum AS DECIMAL(38,0)) * 1000000
                    div (CAST(4 AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))
                      * CAST(m AS DECIMAL(38,0)))"""))
        .select(col("p_brand"), col("n_parts"), col("degree_sum"),
          col("intra_pairs"), col("contrib_e6").cast("long")
            .as("contrib_e6"))
        .orderBy(col("p_brand"))
    },

    // Centrality of the near-duplicate graph: PageRank over the LSH
    // candidate pairs — hub documents are the TEMPLATES (every variant
    // near-duplicates them), distinguishing them from chain-like
    // false-positive paths the same way q199's clustering coefficient
    // does, but with a global propagated measure. Edges come from the
    // banded minhash join (q28's relation), so the graph build is the
    // bucketed dedup path — never all-pairs.
    "q264_dedup_centrality" -> { (s, dir) =>
      val pairs = lshPairs(s, dir)
      val edges = pairs
        .select(col("a").as("src"), col("b").as("dst"))
        .unionByName(pairs.select(col("b").as("src"),
          col("a").as("dst")))
      Graph.pageRank(edges, iterations = 5)
        .select(col("node").as("doc_id"), col("rank_e6"))
        .orderBy(col("rank_e6").desc, col("doc_id"))
        .limit(20)
    },

    // Dense co-purchase core: six rounds of k-core peeling (k = 4) on
    // the part co-purchase graph — parts that stay mutually connected
    // after the stringy periphery is stripped are the catalogue's
    // bundle backbone. Six simultaneous peels; the fixed round count
    // is what keeps the distributed loop and the unrolled SQL oracle
    // byte-identical (see Graph.kCore).
    "q266_copurchase_core" -> { (s, dir) =>
      Graph.kCore(pairsCache.get(s, dir), k = 4, rounds = 6)
        .select(col("node").as("part_key"), col("degree"))
        .orderBy(col("degree").desc, col("part_key"))
        .limit(50)
    },

    // Related parts by personalized PageRank: random-walk-with-restart
    // from the alphabetically-first brand's parts as the seed set; the
    // top non-seed parts by propagated relevance are the cross-brand
    // "bought with" recommendations. Same deterministic e6 arithmetic;
    // the seed restart mass is the only base term, so rank measures
    // graph proximity to the seed brand.
    "q256_related_parts" -> { (s, dir) =>
      val edges = Graph.symmetrize(pairsCache.get(s, dir))
      val partDim = t(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val seedBrand = partDim.agg(min(col("p_brand")).as("seed_brand"))
      Graph.personalizedPageRank(edges, seedBrandParts(s, dir),
          iterations = 5)
        .join(partDim, col("node") === col("p_partkey"))
        .crossJoin(broadcast(seedBrand))
        .filter(col("p_brand") =!= col("seed_brand") &&
          col("rank_e6") > 0)
        .select(col("node").as("part_key"), col("p_brand"),
          col("rank_e6"))
        .orderBy(col("rank_e6").desc, col("part_key"))
        .limit(20)
    },

    // Community ASSIGNMENT over the co-purchase graph: four rounds of
    // deterministic synchronous label propagation (most frequent
    // neighbour label, ties to the smallest) — the partition FINDER
    // pairing with q255's modularity scorer of a given partition. Pure
    // integer labels, synchronous update → bit-identical under any
    // partitioning and unrollable as SQL. Output is the community
    // summary relation (size + id span), largest first.
    "q268_copurchase_communities" -> { (s, dir) =>
      labelsCache.get(s, dir)._1
        .groupBy(col("label").as("community"))
        .agg(count(lit(1)).as("n_members"),
          min(col("node")).as("min_member"),
          max(col("node")).as("max_member"))
        .filter(col("n_members") >= 3)
        .orderBy(col("n_members").desc, col("community"))
        .limit(30)
    },

    // Weighted co-purchase PageRank: edges carry the CO-ORDER COUNT —
    // a pair bought together 50 times pulls 50× the rank of a one-off,
    // which is what separates catalogue staples from chance adjacency
    // (q251's unweighted rank treats both alike). Contribution =
    // (rank·w) div Σw in DECIMAL(38,0) — exact, order-free, and the
    // per-edge quotient is bounded by the rank, so sums stay BIGINT.
    "q272_weighted_copurchase_rank" -> { (s, dir) =>
      Graph.weightedPageRank(
        Graph.symmetrizeWeighted(wpairsCache.get(s, dir)),
        iterations = 5)
        .select(col("node").as("part_key"), col("rank_e6"))
        .orderBy(col("rank_e6").desc, col("part_key"))
        .limit(20)
    },

    // Hop-distance profile from the seed brand: fixed-round
    // multi-source BFS over the co-purchase graph — the "how many
    // bundle steps away is the rest of the catalogue" proximity
    // histogram pairing with q256's strength-of-connection PPR (same
    // seeds, same graph, distance instead of mass). Min hop commutes,
    // so the distributed rounds and the unrolled UNION+MIN oracle are
    // bit-identical; the histogram output is hop-scale.
    "q274_brand_hop_profile" -> { (s, dir) =>
      val edges = Graph.symmetrize(pairsCache.get(s, dir))
      // seeds intersected with the GRAPH's nodes — the q256 PPR seed
      // semantics (a brand part in no co-purchase pair is outside the
      // graph, not a hop-0 member; counting it would overstate
      // coverage)
      val seeds = seedBrandParts(s, dir)
        .join(edges.select(col("src").as("node")).distinct(),
          Seq("node"), "left_semi")
      Graph.hopDistance(edges, seeds, maxHops = 4)
        .groupBy(col("hops"))
        .agg(count(lit(1)).as("n_parts"))
        .orderBy(col("hops"))
    },

    // Weighted community assignment: neighbours vote with their
    // co-order count, so a 50×-bought-together pair pulls labels 50×
    // harder than a chance adjacency — the vote-weight upgrade to
    // q268's unweighted communities, mirroring q272's upgrade to
    // q251's rank.
    "q273_weighted_communities" -> { (s, dir) =>
      wLabelsCache.get(s, dir)
        .groupBy(col("label").as("community"))
        .agg(count(lit(1)).as("n_members"),
          min(col("node")).as("min_member"),
          max(col("node")).as("max_member"))
        .filter(col("n_members") >= 3)
        .orderBy(col("n_members").desc, col("community"))
        .limit(30)
    },

    // Strength core of the co-purchase graph: six rounds of s-core
    // peeling (s = 80 total co-order count) over the WEIGHTED pair
    // relation — q266's k-core keeps nodes with many partners; this
    // keeps nodes whose partnerships are heavily REPEATED (one
    // 50-times-bought-together pairing can anchor a node that
    // degree-peeling would judge peripheral). Fixed rounds for oracle
    // parity, same as the k-core.
    "q276_copurchase_strength_core" -> { (s, dir) =>
      Graph.sCore(wpairsCache.get(s, dir), s = 80L, rounds = 6)
        .select(col("node").as("part_key"), col("strength"))
        .orderBy(col("strength").desc, col("part_key"))
        .limit(50)
    },

    // Modularity OF the found partition: q255 scores the GIVEN brand
    // partition, q268 finds one by label propagation — this closes the
    // loop by scoring what LPA found with the same exact e6 modularity
    // arithmetic (DECIMAL(38,0) cross-terms). Per-community
    // contribution e_c/m − (d_c/2m)², largest first; whether the found
    // partition beats the brand partition is now a query away, not a
    // judgment call.
    "q275_lpa_modularity" -> { (s, dir) =>
      val pairs = pairsCache.get(s, dir)
      val labels = labelsCache.get(s, dir)._1
      val m = pairs.agg(count(lit(1)).as("m"))
      val deg = pairs.select(col("a").as("node"))
        .unionByName(pairs.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val degByC = deg.join(labels, "node")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("deg")).as("degree_sum"))
      val intra = pairs
        .join(labels.select(col("node").as("a"),
          col("label").as("label_a")), Seq("a"))
        .join(labels.select(col("node").as("b"),
          col("label").as("label_b")), Seq("b"))
        .filter(col("label_a") === col("label_b"))
        .groupBy(col("label_a").as("label"))
        .agg(count(lit(1)).as("intra_pairs"))
      degByC
        .join(intra, Seq("label"), "left_outer")
        .na.fill(0L, Seq("intra_pairs"))
        .crossJoin(broadcast(m))
        .withColumn("contrib_e6",
          expr("""CAST(intra_pairs AS DECIMAL(38,0)) * 1000000
                    div CAST(m AS DECIMAL(38,0))
                  - CAST(degree_sum AS DECIMAL(38,0))
                    * CAST(degree_sum AS DECIMAL(38,0)) * 1000000
                    div (CAST(4 AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0))
                      * CAST(m AS DECIMAL(38,0)))"""))
        .select(col("label").as("community"), col("n_parts"),
          col("degree_sum"), col("intra_pairs"),
          col("contrib_e6").cast("long").as("contrib_e6"))
        .orderBy(col("contrib_e6").desc, col("community"))
        .limit(20)
    },

    // Template families in the near-duplicate graph: label propagation
    // over the banded LSH candidate pairs groups documents into
    // variant families (each family = one template and its mutations) —
    // the community view of the same relation q264 ranks and q65's
    // connected components merely partitions by reachability: LPA keeps
    // weakly-bridged families apart where CC would fuse them through
    // one chance collision. Edges come from the bucketed dedup path,
    // never all-pairs.
    "q271_dedup_communities" -> { (s, dir) =>
      Graph.labelPropagation(lshPairs(s, dir), rounds = 4)
        .groupBy(col("label").as("family"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("node")).as("min_doc"),
          max(col("node")).as("max_doc"))
        .filter(col("n_docs") >= 2)
        .orderBy(col("n_docs").desc, col("family"))
        .limit(40)
    },

    // Convergence diagnostic of the stored co-purchase LPA run:
    // synchronous LPA can 2-cycle on bipartite-ish structures, and a
    // fixed-round assignment silently lands on an arbitrary phase of
    // that cycle — this reports how much of q268's partition is a true
    // fixed point (label(r)==label(r−1)) and how much carries the
    // period-2 signature (==label(r−2) but ≠label(r−1)). One extra
    // node-scale three-way join at the end of the run every community
    // consumer shares; reads the same persisted label artifact as
    // q268/q275.
    "q277_lpa_convergence" -> { (s, dir) =>
      import s.implicits._
      val d = labelsCache.get(s, dir)._2
      Seq((d.nNodes, d.nStable, d.nOscillating,
        if (d.converged) 1L else 0L))
        .toDF("n_nodes", "n_stable", "n_oscillating", "converged")
    },

    // Neighborhood-similarity probe (the link-prediction primitive):
    // for the SEED brand's parts, their most similar counterparts by
    // common-neighbor JACCARD over the co-purchase graph — "which parts
    // share this part's co-purchase context", whether or not the two
    // ever co-occurred themselves. SEED-SCOPED deliberately: the
    // all-pairs variant is Σdeg² wedge volume by definition (≈1.5×10⁸
    // wedge rows already at sf0.1 — measured, 23 s — growing linearly
    // with the node count), while the per-seed-set probe is the shape a
    // product actually serves ("similar items for THIS catalog slice")
    // and bounds the wedge join by the seeds' wedge share. Common
    // neighbors via the wedge join semi-joined to the seed set BEFORE
    // the expansion; Jaccard = common / (deg_x + deg_y − common) over
    // FULL-graph degrees, exact ppm (integral div); top-20 is
    // TakeOrdered, never a full sort.
    "q288_neighbor_jaccard" -> { (s, dir) =>
      val sym = Graph.symmetrize(pairsCache.get(s, dir))
      val seeds = seedBrandParts(s, dir)
      val deg = sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      val common = sym.select(col("src").as("via"), col("dst").as("x"))
        .join(seeds.withColumnRenamed("node", "x"), Seq("x"),
          "left_semi")
        .join(sym.select(col("src").as("via"), col("dst").as("y")),
          "via")
        .filter(col("x") =!= col("y"))
        .groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("common"))
      common
        .join(deg.select(col("node").as("x"), col("deg").as("deg_x")),
          "x")
        .join(deg.select(col("node").as("y"), col("deg").as("deg_y")),
          "y")
        .withColumn("jaccard_ppm",
          expr("""CAST(common * 1000000 AS DECIMAL(38,0))
                  div (deg_x + deg_y - common)"""))
        .orderBy(col("jaccard_ppm").desc, col("x"), col("y"))
        .limit(20)
        .select(col("x").as("seed_part"), col("y").as("counterpart"),
          col("common").as("common_neighbors"),
          col("deg_x"), col("deg_y"), col("jaccard_ppm"))
    },

    // Resource-allocation link prediction (Zhou-Lü-Zhang 2009) — the
    // refinement of q288's raw common-neighbor count: each shared
    // neighbor votes 1/deg(via), so a rare shared context counts far
    // more than co-occurring with a part everything co-occurs with
    // (the same hub-discounting idea as Adamic-Adar, but 1/deg is
    // EXACTLY representable in fixed point where 1/ln(deg) is not:
    // each term is 1e6 div deg, deterministic and oracle-stable).
    // Same seed-scoped wedge shape as q288 — semi-join to the seed
    // brand's parts BEFORE the expansion bounds the join by the seeds'
    // wedge share; top-20 TakeOrdered.
    "q291_resource_allocation" -> { (s, dir) =>
      val sym = Graph.symmetrize(pairsCache.get(s, dir))
      val seeds = seedBrandParts(s, dir)
      val deg = sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
      sym.select(col("src").as("via"), col("dst").as("x"))
        .join(seeds.withColumnRenamed("node", "x"), Seq("x"),
          "left_semi")
        .join(sym.select(col("src").as("via"), col("dst").as("y")),
          "via")
        .filter(col("x") =!= col("y"))
        .join(deg.select(col("node").as("via"),
          col("deg").as("via_deg")), "via")
        .groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("common"),
          sum(expr("1000000 div via_deg")).as("ra_e6"))
        .orderBy(col("ra_e6").desc, col("x"), col("y"))
        .limit(20)
        .select(col("x").as("seed_part"), col("y").as("counterpart"),
          col("common").as("common_neighbors"), col("ra_e6"))
    },

    // WEIGHTED modularity of the weighted partition — q275's twin on
    // the weighted axis, closing the weighted loop the same way (q273
    // finds the partition, this scores it): per-community contribution
    // w_intra/W − (S_c/2W)² in exact e6 fixed point, where W is total
    // edge weight and S_c the community's strength sum. Both queries
    // read the SAME stored weighted-label artifact — the rounds run
    // once per data dir. Arithmetic mirrors q275: each `div` term is
    // separately non-negative, so truncation-vs-floor never diverges
    // between engines even though the contribution itself can be
    // negative.
    "q287_weighted_modularity" -> { (s, dir) =>
      val pairs = wpairsCache.get(s, dir)
      val labels = wLabelsCache.get(s, dir)
      val wTot = pairs.agg(sum(col("w")).as("m"))
      val strength = pairs.select(col("a").as("node"), col("w"))
        .unionByName(pairs.select(col("b").as("node"), col("w")))
        .groupBy(col("node")).agg(sum(col("w")).as("deg"))
      val byC = strength.join(labels, "node")
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("deg")).as("strength_sum"))
      val intra = pairs
        .join(labels.select(col("node").as("a"),
          col("label").as("label_a")), Seq("a"))
        .join(labels.select(col("node").as("b"),
          col("label").as("label_b")), Seq("b"))
        .filter(col("label_a") === col("label_b"))
        .groupBy(col("label_a").as("label"))
        .agg(sum(col("w")).as("intra_w"))
      byC
        .join(intra, Seq("label"), "left_outer")
        .na.fill(0L, Seq("intra_w"))
        .crossJoin(broadcast(wTot))
        .withColumn("contrib_e6",
          expr("""CAST(intra_w AS DECIMAL(38,0)) * 1000000
                    div CAST(m AS DECIMAL(38,0))
                  - CAST(strength_sum AS DECIMAL(38,0))
                    * CAST(strength_sum AS DECIMAL(38,0)) * 1000000
                    div (CAST(4 AS DECIMAL(38,0))
                      * CAST(m AS DECIMAL(38,0))
                      * CAST(m AS DECIMAL(38,0)))"""))
        .select(col("label").as("community"), col("n_parts"),
          col("strength_sum"), col("intra_w"),
          col("contrib_e6").cast("long").as("contrib_e6"))
        .orderBy(col("contrib_e6").desc, col("community"))
        .limit(20)
    },

    // Year-over-year community drift: LPA communities of the 1996 and
    // 1997 co-shipment subgraphs compared with the RAND INDEX in exact
    // ppm — "did the co-purchase structure persist?". The pairwise
    // definition (agreeing node pairs / all pairs) would be n² at any
    // scale; the contingency identity computes it from the
    // (label₁₉₉₆ × label₁₉₉₇) table instead: Σ C(nij,2), row/column
    // marginal Σ C(·,2) and C(n,2) — everything downstream of the two
    // LPA runs is communities²-scale. Marginals ride partitioned
    // windows over that tiny relation (no 1-row cross join to trip the
    // cartesian audit); all arithmetic integral (`div`), so the ppm is
    // bit-stable against the unrolled oracle.
    "q282_community_drift" -> { (s, dir) =>
      // both year labellings ride the (dir, year) artifact cache — they
      // belong to the cache (released on evict), so the call pays only
      // the contingency-scale Rand index. The 1-row index is cut
      // EAGERLY before returning: a lazy plan would still reference the
      // cache-owned checkpoints at the CALLER's action time, and in a
      // multi-dir listener another thread's gets can LRU-evict (and
      // release) them in between — the eager cut runs while this call
      // still holds them live. The 1-row checkpoint itself is never
      // released (negligible, and the caller owns the result).
      val la = yearLabelsCache.get(s, (dir, 1996))
      val lb = yearLabelsCache.get(s, (dir, 1997))
      Graph.randIndexPpm(la, lb).localCheckpoint(true)
        .select(col("n_nodes"),
          col("n_comm_a").as("n_comm_1996"),
          col("n_comm_b").as("n_comm_1997"),
          col("same_same_pairs"), col("rand_ppm"))
    })

  /** One PageRank step as SQL: contributions by in-neighbor, damped. */
  private def stepSql(prev: String, cur: String): String =
    s"""$cur AS (SELECT n.node,
         150000 + (85 * COALESCE(s.s, 0)) // 100 AS r
       FROM nodes n LEFT JOIN (
         SELECT e.dst AS node, SUM(p.r // e.outdeg) AS s
         FROM edges e JOIN $prev p ON e.src = p.node
         GROUP BY 1) s ON n.node = s.node)"""

  /** One personalized step: restart mass on seeds only. */
  private def pprStepSql(prev: String, cur: String): String =
    s"""$cur AS (SELECT n.node,
         (CASE WHEN n.is_seed THEN 150000 ELSE 0 END) +
           (85 * COALESCE(s.s, 0)) // 100 AS r
       FROM nd n LEFT JOIN (
         SELECT e.dst AS node, SUM(p.r // e.outdeg) AS s
         FROM edges e JOIN $prev p ON e.src = p.node
         GROUP BY 1) s ON n.node = s.node)"""

  /** The shared WEIGHTED pair CTEs, mirroring
    * `Graph.weightedCanonicalPairs`: `(group, item)` deduplicated
    * BEFORE the self-join, so w counts DISTINCT co-occurring orders —
    * an item repeated within one order contributes 1, not k. */
  private val WPairsCtes =
    """gi AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS item
           FROM lineitem),
       wpairs AS (SELECT la.item AS a, lb.item AS b, COUNT(*) AS w
         FROM gi la JOIN gi lb
           ON la.g = lb.g AND la.item < lb.item
         GROUP BY 1, 2)"""

  /** The shared co-purchase graph CTEs (canonical pairs → symmetrised
    * edges with out-degrees). */
  private val GraphCtes =
    """pairs AS (SELECT DISTINCT la.l_partkey AS a,
           lb.l_partkey AS b
         FROM lineitem la JOIN lineitem lb
           ON la.l_orderkey = lb.l_orderkey
          AND la.l_partkey < lb.l_partkey),
       sym AS (SELECT a AS src, b AS dst FROM pairs
         UNION ALL SELECT b, a FROM pairs),
       deg AS (SELECT src, COUNT(*) AS outdeg FROM sym GROUP BY 1),
       edges AS (SELECT s.src, s.dst, d.outdeg
         FROM sym s JOIN deg d ON s.src = d.src),
       nodes AS (SELECT src AS node FROM deg)"""

  /** One label-propagation round as SQL: per-destination neighbour-label
    * frequencies, argmax by (count DESC, label ASC) — exactly the
    * engine's max(struct(cnt, −label)) tie-break. MATERIALIZED for the
    * same inline-expansion reason as the peel rounds. */
  private def lpaStepSql(prev: String, cur: String,
      sym: String = "sym"): String =
    s"""$cur AS MATERIALIZED (SELECT dst AS node, label FROM (
         SELECT f.dst, f.label,
           ROW_NUMBER() OVER (PARTITION BY f.dst
             ORDER BY f.cnt DESC, f.label) AS rk
         FROM (SELECT e.dst, l.label, COUNT(*) AS cnt
               FROM $sym e JOIN $prev l ON e.src = l.node
               GROUP BY e.dst, l.label) f)
       WHERE rk = 1)"""

  /** One multi-source BFS round as SQL: reached ∪ (frontier + 1),
    * MIN per node. */
  private def hopStepSql(prev: String, cur: String): String =
    s"""$cur AS MATERIALIZED (SELECT node, MIN(h) AS h FROM (
         SELECT node, h FROM $prev
         UNION ALL
         SELECT e.dst AS node, p.h + 1 AS h
         FROM sym e JOIN $prev p ON e.src = p.node)
       GROUP BY node)"""

  /** One WEIGHTED label-propagation round as SQL: votes are SUM(w)
    * over `wsym` edges, same (votes DESC, label ASC) tie-break. */
  private def wLpaStepSql(prev: String, cur: String): String =
    s"""$cur AS MATERIALIZED (SELECT dst AS node, label FROM (
         SELECT f.dst, f.label,
           ROW_NUMBER() OVER (PARTITION BY f.dst
             ORDER BY f.cnt DESC, f.label) AS rk
         FROM (SELECT e.dst, l.label, CAST(SUM(e.w) AS BIGINT) AS cnt
               FROM wsym e JOIN $prev l ON e.src = l.node
               GROUP BY e.dst, l.label) f)
       WHERE rk = 1)"""

  /** One WEIGHTED PageRank step as SQL: per-edge (rank·w) // wout in
    * HUGEINT — the engine's DECIMAL(38,0) lift — summed by destination. */
  private def wStepSql(prev: String, cur: String): String =
    s"""$cur AS (SELECT n.node,
         150000 + (85 * COALESCE(s.s, 0)) // 100 AS r
       FROM wnodes n LEFT JOIN (
         SELECT e.dst AS node,
           SUM(CAST((CAST(p.r AS HUGEINT) * e.w) // e.wout AS BIGINT))
             AS s
         FROM wedges e JOIN $prev p ON e.src = p.node
         GROUP BY 1) s ON n.node = s.node)"""

  /** One s-core (strength) peel round as SQL (s = 80): SUM(w)
    * strengths over the surviving weighted pairs, threshold, semi-join
    * both sides. Same MATERIALIZED discipline as the k-core rounds. */
  private def sPeelSql(prev: String, cur: String): String =
    s"""st_$cur AS MATERIALIZED (SELECT node,
           CAST(SUM(w) AS BIGINT) AS strength
         FROM (SELECT a AS node, w FROM $prev
               UNION ALL SELECT b, w FROM $prev) GROUP BY 1),
       k_$cur AS (SELECT node FROM st_$cur WHERE strength >= 80),
       $cur AS MATERIALIZED (SELECT p.a, p.b, p.w FROM $prev p
         JOIN k_$cur ka ON p.a = ka.node
         JOIN k_$cur kb ON p.b = kb.node)"""

  /** One k-core peel round as SQL (k = 4). MATERIALIZED is load-bearing:
    * DuckDB inlines plain CTEs per reference, and each round references
    * the previous one three times — six inlined rounds would expand the
    * base self-join 3⁶-fold (it exhausts file handles before memory). */
  private def peelSql(prev: String, cur: String): String =
    s"""d_$cur AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM (
         SELECT a AS node FROM $prev
         UNION ALL SELECT b FROM $prev) GROUP BY 1),
       k_$cur AS (SELECT node FROM d_$cur WHERE deg >= 4),
       $cur AS MATERIALIZED (SELECT p.a, p.b FROM $prev p
         JOIN k_$cur ka ON p.a = ka.node
         JOIN k_$cur kb ON p.b = kb.node)"""

  val oracles: Map[String, String] = Map(

    "q266_copurchase_core" ->
      s"""WITH $GraphCtes,
         ${peelSql("pairs", "p1")},
         ${peelSql("p1", "p2")},
         ${peelSql("p2", "p3")},
         ${peelSql("p3", "p4")},
         ${peelSql("p4", "p5")},
         ${peelSql("p5", "p6")}
         SELECT node AS part_key, CAST(COUNT(*) AS BIGINT) AS degree
         FROM (SELECT a AS node FROM p6
               UNION ALL SELECT b FROM p6)
         GROUP BY node ORDER BY degree DESC, part_key LIMIT 50""",

    "q251_pagerank" ->
      s"""WITH $GraphCtes,
         r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
         ${stepSql("r0", "r1")},
         ${stepSql("r1", "r2")},
         ${stepSql("r2", "r3")},
         ${stepSql("r3", "r4")},
         ${stepSql("r4", "r5")}
         SELECT node AS part_key, CAST(r AS BIGINT) AS rank_e6
         FROM r5 ORDER BY rank_e6 DESC, part_key LIMIT 20""",

    "q255_brand_modularity" ->
      s"""WITH $GraphCtes,
         m AS (SELECT COUNT(*) AS m FROM pairs),
         nd AS (SELECT node, COUNT(*) AS deg FROM (
             SELECT a AS node FROM pairs
             UNION ALL SELECT b FROM pairs) GROUP BY 1),
         db AS (SELECT p_brand, COUNT(*) AS n_parts,
             CAST(SUM(deg) AS BIGINT) AS degree_sum
           FROM nd JOIN part ON node = p_partkey GROUP BY 1),
         intra AS (SELECT pa.p_brand, COUNT(*) AS intra_pairs
           FROM pairs
           JOIN part pa ON a = pa.p_partkey
           JOIN part pb ON b = pb.p_partkey
           WHERE pa.p_brand = pb.p_brand GROUP BY 1)
         SELECT db.p_brand, db.n_parts, db.degree_sum,
           COALESCE(intra.intra_pairs, 0) AS intra_pairs,
           CAST(CAST(COALESCE(intra.intra_pairs, 0) AS HUGEINT)
               * 1000000 // CAST(m.m AS HUGEINT)
             - CAST(db.degree_sum AS HUGEINT)
               * CAST(db.degree_sum AS HUGEINT) * 1000000
               // (4 * CAST(m.m AS HUGEINT) * CAST(m.m AS HUGEINT))
             AS BIGINT) AS contrib_e6
         FROM db LEFT JOIN intra USING (p_brand) CROSS JOIN m
         ORDER BY p_brand""",

    "q264_dedup_centrality" ->
      s"""WITH ${PipelineQueries.shingleCte},
         ${PipelineQueries.minhashSigSql}, ${PipelineQueries.bandSql},
         pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM bands x JOIN bands y USING (band, band_key)
           WHERE x.doc_id < y.doc_id),
         sym AS (SELECT a AS src, b AS dst FROM pairs
           UNION ALL SELECT b, a FROM pairs),
         deg AS (SELECT src, COUNT(*) AS outdeg FROM sym GROUP BY 1),
         edges AS (SELECT s.src, s.dst, d.outdeg
           FROM sym s JOIN deg d ON s.src = d.src),
         nodes AS (SELECT src AS node FROM deg),
         r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
         ${stepSql("r0", "r1")},
         ${stepSql("r1", "r2")},
         ${stepSql("r2", "r3")},
         ${stepSql("r3", "r4")},
         ${stepSql("r4", "r5")}
         SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_e6
         FROM r5 ORDER BY rank_e6 DESC, doc_id LIMIT 20""",

    "q256_related_parts" ->
      s"""WITH $GraphCtes,
         seeds AS (SELECT p_partkey AS node FROM part
           WHERE p_brand = (SELECT min(p_brand) FROM part)),
         nd AS (SELECT n.node, (s.node IS NOT NULL) AS is_seed
           FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
         r0 AS (SELECT node,
             CAST(CASE WHEN is_seed THEN 1000000 ELSE 0 END AS BIGINT)
               AS r
           FROM nd),
         ${pprStepSql("r0", "r1")},
         ${pprStepSql("r1", "r2")},
         ${pprStepSql("r2", "r3")},
         ${pprStepSql("r3", "r4")},
         ${pprStepSql("r4", "r5")}
         SELECT p.node AS part_key, pt.p_brand,
           CAST(p.r AS BIGINT) AS rank_e6
         FROM r5 p JOIN part pt ON p.node = pt.p_partkey
         WHERE pt.p_brand <> (SELECT min(p_brand) FROM part)
           AND p.r > 0
         ORDER BY rank_e6 DESC, part_key LIMIT 20""",

    "q268_copurchase_communities" ->
      s"""WITH $GraphCtes,
         l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes),
         ${lpaStepSql("l0", "l1")},
         ${lpaStepSql("l1", "l2")},
         ${lpaStepSql("l2", "l3")},
         ${lpaStepSql("l3", "l4")}
         SELECT label AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(node) AS min_member, MAX(node) AS max_member
         FROM l4 GROUP BY label HAVING COUNT(*) >= 3
         ORDER BY n_members DESC, community LIMIT 30""",

    "q272_weighted_copurchase_rank" ->
      s"""WITH $WPairsCtes,
         wsym AS (SELECT a AS src, b AS dst, w FROM wpairs
           UNION ALL SELECT b, a, w FROM wpairs),
         wdeg AS (SELECT src, CAST(SUM(w) AS BIGINT) AS wout
           FROM wsym GROUP BY 1),
         wedges AS (SELECT s.src, s.dst, s.w, d.wout
           FROM wsym s JOIN wdeg d ON s.src = d.src),
         wnodes AS (SELECT src AS node FROM wdeg),
         r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM wnodes),
         ${wStepSql("r0", "r1")},
         ${wStepSql("r1", "r2")},
         ${wStepSql("r2", "r3")},
         ${wStepSql("r3", "r4")},
         ${wStepSql("r4", "r5")}
         SELECT node AS part_key, CAST(r AS BIGINT) AS rank_e6
         FROM r5 ORDER BY rank_e6 DESC, part_key LIMIT 20""",

    "q276_copurchase_strength_core" ->
      s"""WITH $WPairsCtes,
         ${sPeelSql("wpairs", "s1")},
         ${sPeelSql("s1", "s2")},
         ${sPeelSql("s2", "s3")},
         ${sPeelSql("s3", "s4")},
         ${sPeelSql("s4", "s5")},
         ${sPeelSql("s5", "s6")}
         SELECT node AS part_key, CAST(SUM(w) AS BIGINT) AS strength
         FROM (SELECT a AS node, w FROM s6
               UNION ALL SELECT b, w FROM s6)
         GROUP BY node ORDER BY strength DESC, part_key LIMIT 50""",

    "q275_lpa_modularity" ->
      s"""WITH $GraphCtes,
         l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes),
         ${lpaStepSql("l0", "l1")},
         ${lpaStepSql("l1", "l2")},
         ${lpaStepSql("l2", "l3")},
         ${lpaStepSql("l3", "l4")},
         m AS (SELECT COUNT(*) AS m FROM pairs),
         nd AS (SELECT node, COUNT(*) AS deg FROM (
             SELECT a AS node FROM pairs
             UNION ALL SELECT b FROM pairs) GROUP BY 1),
         dc AS (SELECT l.label, COUNT(*) AS n_parts,
             CAST(SUM(nd.deg) AS BIGINT) AS degree_sum
           FROM nd JOIN l4 l ON nd.node = l.node GROUP BY 1),
         intra AS (SELECT la.label, COUNT(*) AS intra_pairs
           FROM pairs
           JOIN l4 la ON pairs.a = la.node
           JOIN l4 lb ON pairs.b = lb.node
           WHERE la.label = lb.label GROUP BY 1)
         SELECT dc.label AS community, dc.n_parts, dc.degree_sum,
           COALESCE(intra.intra_pairs, 0) AS intra_pairs,
           CAST(CAST(COALESCE(intra.intra_pairs, 0) AS HUGEINT)
               * 1000000 // CAST(m.m AS HUGEINT)
             - CAST(dc.degree_sum AS HUGEINT)
               * CAST(dc.degree_sum AS HUGEINT) * 1000000
               // (4 * CAST(m.m AS HUGEINT) * CAST(m.m AS HUGEINT))
             AS BIGINT) AS contrib_e6
         FROM dc LEFT JOIN intra USING (label) CROSS JOIN m
         ORDER BY contrib_e6 DESC, community LIMIT 20""",

    "q274_brand_hop_profile" ->
      s"""WITH $GraphCtes,
         seeds AS (SELECT p_partkey AS node FROM part
           WHERE p_brand = (SELECT min(p_brand) FROM part)),
         d0 AS MATERIALIZED (SELECT DISTINCT s.node,
             CAST(0 AS BIGINT) AS h
           FROM seeds s JOIN nodes n ON s.node = n.node),
         ${hopStepSql("d0", "d1")},
         ${hopStepSql("d1", "d2")},
         ${hopStepSql("d2", "d3")},
         ${hopStepSql("d3", "d4")}
         SELECT h AS hops, CAST(COUNT(*) AS BIGINT) AS n_parts
         FROM d4 GROUP BY h ORDER BY hops""",

    "q273_weighted_communities" ->
      s"""WITH $WPairsCtes,
         wsym AS (SELECT a AS src, b AS dst, w FROM wpairs
           UNION ALL SELECT b, a, w FROM wpairs),
         l0 AS MATERIALIZED (SELECT DISTINCT src AS node,
           src AS label FROM wsym),
         ${wLpaStepSql("l0", "l1")},
         ${wLpaStepSql("l1", "l2")},
         ${wLpaStepSql("l2", "l3")},
         ${wLpaStepSql("l3", "l4")}
         SELECT label AS community,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(node) AS min_member, MAX(node) AS max_member
         FROM l4 GROUP BY label HAVING COUNT(*) >= 3
         ORDER BY n_members DESC, community LIMIT 30""",

    "q288_neighbor_jaccard" ->
      s"""WITH $GraphCtes,
         seeds AS (SELECT p_partkey AS node FROM part
           WHERE p_brand = (SELECT min(p_brand) FROM part)),
         common AS (SELECT ex.dst AS x, ey.dst AS y, COUNT(*) AS common
           FROM sym ex
           JOIN seeds s ON ex.dst = s.node
           JOIN sym ey ON ex.src = ey.src AND ex.dst <> ey.dst
           GROUP BY 1, 2)
         SELECT c.x AS seed_part, c.y AS counterpart,
           CAST(common AS BIGINT) AS common_neighbors,
           CAST(dx.outdeg AS BIGINT) AS deg_x,
           CAST(dy.outdeg AS BIGINT) AS deg_y,
           CAST(CAST(common AS HUGEINT) * 1000000
             // (dx.outdeg + dy.outdeg - common) AS BIGINT) AS jaccard_ppm
         FROM common c
         JOIN deg dx ON c.x = dx.src
         JOIN deg dy ON c.y = dy.src
         ORDER BY jaccard_ppm DESC, seed_part, counterpart LIMIT 20""",

    "q291_resource_allocation" ->
      s"""WITH $GraphCtes,
         seeds AS (SELECT p_partkey AS node FROM part
           WHERE p_brand = (SELECT min(p_brand) FROM part))
         SELECT c.x AS seed_part, c.y AS counterpart,
           CAST(common AS BIGINT) AS common_neighbors,
           CAST(ra_e6 AS BIGINT) AS ra_e6
         FROM (SELECT ex.dst AS x, ey.dst AS y, COUNT(*) AS common,
             SUM(1000000 // d.outdeg) AS ra_e6
           FROM sym ex
           JOIN seeds s ON ex.dst = s.node
           JOIN sym ey ON ex.src = ey.src AND ex.dst <> ey.dst
           JOIN deg d ON ex.src = d.src
           GROUP BY 1, 2) c
         ORDER BY ra_e6 DESC, seed_part, counterpart LIMIT 20""",

    "q287_weighted_modularity" ->
      s"""WITH $WPairsCtes,
         wsym AS (SELECT a AS src, b AS dst, w FROM wpairs
           UNION ALL SELECT b, a, w FROM wpairs),
         l0 AS MATERIALIZED (SELECT DISTINCT src AS node,
           src AS label FROM wsym),
         ${wLpaStepSql("l0", "l1")},
         ${wLpaStepSql("l1", "l2")},
         ${wLpaStepSql("l2", "l3")},
         ${wLpaStepSql("l3", "l4")},
         wtot AS (SELECT CAST(SUM(w) AS BIGINT) AS m FROM wpairs),
         st AS (SELECT node, CAST(SUM(w) AS BIGINT) AS deg FROM (
             SELECT a AS node, w FROM wpairs
             UNION ALL SELECT b, w FROM wpairs) GROUP BY 1),
         dc AS (SELECT l.label, COUNT(*) AS n_parts,
             CAST(SUM(st.deg) AS BIGINT) AS strength_sum
           FROM st JOIN l4 l ON st.node = l.node GROUP BY 1),
         intra AS (SELECT la.label,
             CAST(SUM(wpairs.w) AS BIGINT) AS intra_w
           FROM wpairs
           JOIN l4 la ON wpairs.a = la.node
           JOIN l4 lb ON wpairs.b = lb.node
           WHERE la.label = lb.label GROUP BY 1)
         SELECT dc.label AS community, dc.n_parts, dc.strength_sum,
           COALESCE(intra.intra_w, 0) AS intra_w,
           CAST(CAST(COALESCE(intra.intra_w, 0) AS HUGEINT)
               * 1000000 // CAST(wtot.m AS HUGEINT)
             - CAST(dc.strength_sum AS HUGEINT)
               * CAST(dc.strength_sum AS HUGEINT) * 1000000
               // (4 * CAST(wtot.m AS HUGEINT) * CAST(wtot.m AS HUGEINT))
             AS BIGINT) AS contrib_e6
         FROM dc LEFT JOIN intra USING (label) CROSS JOIN wtot
         ORDER BY contrib_e6 DESC, community LIMIT 20""",

    "q271_dedup_communities" ->
      s"""WITH ${PipelineQueries.shingleCte},
         ${PipelineQueries.minhashSigSql}, ${PipelineQueries.bandSql},
         pairs AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
           FROM bands x JOIN bands y USING (band, band_key)
           WHERE x.doc_id < y.doc_id),
         sym AS (SELECT a AS src, b AS dst FROM pairs
           UNION ALL SELECT b, a FROM pairs),
         l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label
           FROM sym),
         ${lpaStepSql("l0", "l1")},
         ${lpaStepSql("l1", "l2")},
         ${lpaStepSql("l2", "l3")},
         ${lpaStepSql("l3", "l4")}
         SELECT label AS family, CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(node) AS min_doc, MAX(node) AS max_doc
         FROM l4 GROUP BY label HAVING COUNT(*) >= 2
         ORDER BY n_docs DESC, family LIMIT 40""",

    "q277_lpa_convergence" ->
      s"""WITH $GraphCtes,
         l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes),
         ${lpaStepSql("l0", "l1")},
         ${lpaStepSql("l1", "l2")},
         ${lpaStepSql("l2", "l3")},
         ${lpaStepSql("l3", "l4")}
         SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(COALESCE(SUM(CASE WHEN r.label = p.label
             THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_stable,
           CAST(COALESCE(SUM(CASE WHEN r.label = pp.label
             AND r.label <> p.label THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_oscillating,
           CAST(CASE WHEN COUNT(*) = COALESCE(SUM(CASE WHEN
             r.label = p.label THEN 1 ELSE 0 END), 0)
             THEN 1 ELSE 0 END AS BIGINT) AS converged
         FROM l4 r JOIN l3 p ON r.node = p.node
           JOIN l2 pp ON r.node = pp.node""",

    "q282_community_drift" -> {
      /* one year-restricted co-shipment graph: canonical pairs where
       * BOTH lines shipped in the year, symmetrised, plus the identity
       * labelling — suffix keeps the two graphs' CTEs apart */
      def yearCtes(sfx: String, year: Int): String =
        s"""pairs$sfx AS MATERIALIZED (SELECT DISTINCT
             la.l_partkey AS a, lb.l_partkey AS b
           FROM lineitem la JOIN lineitem lb
             ON la.l_orderkey = lb.l_orderkey
            AND la.l_partkey < lb.l_partkey
           WHERE year(la.l_shipdate) = $year
             AND year(lb.l_shipdate) = $year),
         sym$sfx AS (SELECT a AS src, b AS dst FROM pairs$sfx
           UNION ALL SELECT b, a FROM pairs$sfx),
         l0$sfx AS MATERIALIZED (SELECT DISTINCT src AS node,
           src AS label FROM sym$sfx)"""
      def rounds(sfx: String): String =
        (1 to 4).map(i =>
          lpaStepSql(s"l${i - 1}$sfx", s"l$i$sfx", s"sym$sfx"))
          .mkString(",\n         ")
      s"""WITH ${yearCtes("x", 1996)},
         ${rounds("x")},
         ${yearCtes("y", 1997)},
         ${rounds("y")},
         j AS (SELECT a.node, a.label AS la2, b.label AS lb2
           FROM l4x a JOIN l4y b ON a.node = b.node),
         cont AS MATERIALIZED (SELECT la2, lb2, COUNT(*) AS nij
           FROM j GROUP BY 1, 2),
         st AS (SELECT CAST(SUM(nij) AS BIGINT) AS n_nodes,
             CAST(SUM(nij * (nij - 1) // 2) AS BIGINT) AS s_nij
           FROM cont),
         am AS (SELECT la2, SUM(nij) AS ai FROM cont GROUP BY 1),
         sa AS (SELECT CAST(SUM(ai * (ai - 1) // 2) AS BIGINT) AS s_a,
             COUNT(*) AS ka FROM am),
         bm AS (SELECT lb2, SUM(nij) AS bj FROM cont GROUP BY 1),
         sb AS (SELECT CAST(SUM(bj * (bj - 1) // 2) AS BIGINT) AS s_b,
             COUNT(*) AS kb FROM bm)
         SELECT n_nodes,
           CAST(ka AS BIGINT) AS n_comm_1996,
           CAST(kb AS BIGINT) AS n_comm_1997,
           s_nij AS same_same_pairs,
           CAST(CAST(n_nodes * (n_nodes - 1) // 2
               + 2 * s_nij - s_a - s_b AS HUGEINT)
             * 1000000
             // GREATEST(n_nodes * (n_nodes - 1) // 2, 1) AS BIGINT)
             AS rand_ppm
         FROM st, sa, sb"""
    })
}
