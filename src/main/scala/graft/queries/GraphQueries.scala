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

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // PageRank over the part co-purchase graph: parts are linked when
    // they appear in the same order; five damped iterations in exact
    // e6 fixed-point; top 20 by rank. Each iteration is one shuffle
    // join + one keyed aggregate over the edge relation — the scale
    // shape a 100 TB co-purchase graph needs (edges co-partitioned on
    // src, node-scale rank relation moving, lineage cut per round).
    "q251_pagerank" -> { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val edges = Graph.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      Graph.pageRank(edges, iterations = 5)
        .select(col("node").as("part_key"), col("rank_e6"))
        .orderBy(col("rank_e6").desc, col("part_key"))
        .limit(20)
    })

  /** One PageRank step as SQL: contributions by in-neighbor, damped. */
  private def stepSql(prev: String, cur: String): String =
    s"""$cur AS (SELECT n.node,
         150000 + (85 * COALESCE(s.s, 0)) // 100 AS r
       FROM nodes n LEFT JOIN (
         SELECT e.dst AS node, SUM(p.r // e.outdeg) AS s
         FROM edges e JOIN $prev p ON e.src = p.node
         GROUP BY 1) s ON n.node = s.node)"""

  val oracles: Map[String, String] = Map(

    "q251_pagerank" ->
      s"""WITH pairs AS (SELECT DISTINCT la.l_partkey AS a,
             lb.l_partkey AS b
           FROM lineitem la JOIN lineitem lb
             ON la.l_orderkey = lb.l_orderkey
            AND la.l_partkey < lb.l_partkey),
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
         SELECT node AS part_key, CAST(r AS BIGINT) AS rank_e6
         FROM r5 ORDER BY rank_e6 DESC, part_key LIMIT 20""")
}
