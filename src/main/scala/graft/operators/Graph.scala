package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge relations.
  *
  * North-star extension (the reference computes no graph measures; its
  * closest analogue is the dedup candidate graph this engine already
  * builds). Companions to the existing graph surface — triangle counts
  * (q141), clustering coefficients (q199), connected components
  * ([[Dedup.connectedComponents]], `streaming/StreamingCc`) — this adds
  * the canonical iterative message-passing computation: PageRank.
  *
  * Scale shape: each iteration is ONE shuffle join (edges ⋈ ranks on the
  * source node) plus ONE keyed aggregate (contributions by destination).
  * The edge relation is the large side and never moves between
  * iterations once co-partitioned; ranks are node-scale (orders of
  * magnitude smaller than edges). Lineage is cut per iteration with a
  * lazy `localCheckpoint`, the same discipline as the iterative
  * connected-components loop — without it the plan doubles every round.
  *
  * Determinism: ranks are e6 fixed-point BIGINTs. A node's contribution
  * is `rank div outdeg` (integer truncation — order-free), and the
  * damping update is `(1-d) + d·Σ` computed as
  * `150000 + (85 · Σ) div 100`. Integer sums commute, so the result is
  * bit-identical under any partitioning, task order, or engine — which
  * is what lets a DuckDB oracle hash-match a distributed 5-iteration
  * PageRank exactly.
  */
object Graph {

  /** Undirected co-occurrence edges: items sharing a group key.
    *
    * Canonical `a < b` pairs (distinct), then symmetrised to a directed
    * relation with both orientations, so every node has out-degree ≥ 1
    * and PageRank needs no dangling-mass term. The pair fan-out is
    * bounded by the per-group item count (per-order lineitem counts are
    * single-digit), so the self-join is a key-equi join whose output
    * stays linear in the fact — never an all-pairs product.
    */
  def coOccurrenceEdges(df: DataFrame, groupCol: String,
      itemCol: String): DataFrame = {
    val g = df.select(col(groupCol).as("g"), col(itemCol).as("item"))
    val pairs = g.toDF("g", "a")
      .join(g.toDF("g", "b"), "g")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
      // both union orientations read the SAME materialised pair blocks —
      // without the cut, each branch re-runs the group self-join
      .localCheckpoint(false)
    pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
  }

  /** Fixed-iteration deterministic PageRank over a directed edge
    * relation `(src, dst)`. Returns `(node, rank_e6)`.
    *
    * Every node present as a source participates (on the symmetrised
    * relations from [[coOccurrenceEdges]] that is every node). Ranks
    * start at 1.0 (e6 = 1,000,000); `dampingPct` is the integer damping
    * percentage (85 = the classic 0.85).
    */
  def pageRank(edges: DataFrame, iterations: Int,
      dampingPct: Int = 85): DataFrame =
    pageRankFrom(edges, None, iterations, dampingPct)

  /** [[pageRank]] warm-started from a previous rank relation
    * `(node, rank_e6)`. Power iteration composes: K₂ steps from the
    * ranks after K₁ cold steps equal K₁+K₂ cold steps (the streaming
    * refresh's contract, spec-pinned). Nodes absent from `init` (new
    * arrivals) start at the cold 1.0; `init` nodes absent from the
    * current edge set are dropped (ranks are defined over the graph's
    * nodes). */
  def pageRankFrom(edges: DataFrame, init: Option[DataFrame],
      iterations: Int, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val basePct = 100 - dampingPct
    // Out-degrees ride along each edge so the per-iteration join touches
    // only (edgesWithDeg ⋈ ranks); checkpointed once — the loop reuses
    // the materialised blocks instead of recomputing the degree join.
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    // EAGER checkpoints: both relations are read once per iteration, and
    // a lazy cut would let the 5 iteration jobs race on first
    // materialisation (each recomputing the degree join)
    val edgesWithDeg = edges.join(deg, "src").localCheckpoint(true)
    val nodes = deg.select(col("src").as("node")).localCheckpoint(true)
    var ranks = init match {
      case Some(prev) =>
        nodes.join(prev.select(col("node"),
            col("rank_e6").as("prev_e6")), Seq("node"), "left_outer")
          .select(col("node"),
            coalesce(col("prev_e6"), lit(1000000L)).as("rank_e6"))
          .localCheckpoint(false)
      case None =>
        nodes.select(col("node"), lit(1000000L).as("rank_e6"))
    }
    for (_ <- 1 to iterations) {
      val contribs = edgesWithDeg
        .join(ranks, col("src") === col("node"))
        .select(col("dst"),
          expr("rank_e6 div outdeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("s"))
      // Left join back to the node list: a node with no in-edges (never
      // on symmetrised graphs, possible on arbitrary ones) keeps the
      // base mass instead of dropping out of the relation.
      ranks = nodes
        .join(contribs, col("node") === col("dst"), "left_outer")
        .select(col("node"),
          (lit(basePct.toLong * 10000L) +
            expr(s"$dampingPct * coalesce(s, 0L) div 100"))
            .as("rank_e6"))
        .localCheckpoint(false)
    }
    ranks
  }

  /** Personalized PageRank: random-walk-with-restart relevance from a
    * SEED set — the base mass lands only on seeds, so rank measures
    * proximity to the seeds through the graph (the standard
    * related-items / trusted-seed-expansion primitive). Same e6
    * fixed-point determinism and per-iteration shape as [[pageRank]];
    * seeds is a single-column `(node)` relation, expected node-scale
    * (it joins the node list once, outside the loop). */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iterations: Int, dampingPct: Int = 85): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val basePct = 100 - dampingPct
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    val edgesWithDeg = edges.join(deg, "src").localCheckpoint(true)
    val nodes = deg.select(col("src").as("node"))
      .join(seeds.select(col("node"), lit(true).as("is_seed")),
        Seq("node"), "left_outer")
      .select(col("node"),
        coalesce(col("is_seed"), lit(false)).as("is_seed"))
      .localCheckpoint(true)
    var ranks = nodes.select(col("node"),
      when(col("is_seed"), lit(1000000L)).otherwise(lit(0L))
        .as("rank_e6"))
    for (_ <- 1 to iterations) {
      val contribs = edgesWithDeg
        .join(ranks, col("src") === col("node"))
        .select(col("dst"),
          expr("rank_e6 div outdeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("s"))
      ranks = nodes
        .join(contribs, col("node") === col("dst"), "left_outer")
        .select(col("node"),
          (when(col("is_seed"), lit(basePct.toLong * 10000L))
            .otherwise(lit(0L)) +
            expr(s"$dampingPct * coalesce(s, 0L) div 100"))
            .as("rank_e6"))
        .localCheckpoint(false)
    }
    ranks
  }
}
