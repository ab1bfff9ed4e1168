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

  test("q251 output: 20 rows, ranks descending, all above base mass") {
    val out = graft.queries.GraphQueries
      .defs("q251_pagerank")(spark, sf("sf0.001")).collect()
    assert(out.length === 20)
    val ranks = out.map(_.getLong(1))
    assert(ranks.sameElements(ranks.sortBy(-_)))
    assert(ranks.forall(_ >= 150000L))
  }
}
