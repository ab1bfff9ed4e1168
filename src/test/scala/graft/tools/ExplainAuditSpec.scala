package graft.tools

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** CI plan-audit gate: every declared query must build a plan free of the
  * shapes that pass small-SF correctness but die at cluster scale —
  * cartesian products between row-scale inputs, unpartitioned windows
  * over unbounded inputs (single-task serialization), and group-quadratic
  * self-joins (two sides of one leaf relation paired on a domain-grain
  * key — the r15 q329 blind spot: oracle-green, plan-audit-silent, and
  * quadratic in the group's slice of the data). Quadratic fires are
  * CONFIRMED at a larger scale factor before they are findings: a key
  * whose NDV grows with the data (events.user_id) clears itself, a key
  * whose NDV stays put (p_brand) keeps firing. Catches regressions the
  * oracle hash gate cannot see. */
class ExplainAuditSpec extends SparkSpec {

  /** Build `name` at `dir` with the CI quadratic sink tapped into
    * [[ExplainAudit.auditedCut]] (checkpoint-backed queries collapse
    * their joins to a LogicalRDD leaf before the spec can see them, so
    * the cut itself must report) and ALSO run the post-build audit for
    * plain lazy queries. Returns (static findings, quadratic findings
    * from both paths). */
  private def auditsOf(name: String,
      fn: (org.apache.spark.sql.SparkSession, String)
        => org.apache.spark.sql.DataFrame,
      dir: String)
      : (Seq[ExplainAudit.Finding], Seq[ExplainAudit.Finding]) = {
    val buf = Seq.newBuilder[ExplainAudit.Finding]
    ExplainAudit.quadraticSink = f => { buf += f; () }
    val df =
      try fn(spark, dir)
      finally ExplainAudit.quadraticSink = null
    (ExplainAudit.audit(df, name),
      buf.result() ++ ExplainAudit.auditQuadraticSelfJoin(df, name))
  }

  test("every query plan is free of cartesian products, global windows, " +
      "and unreviewed scale-confirmed group-quadratic self-joins") {
    val dir = sf("sf0.001")
    val confirmDir = sf("sf0.1")
    val findings = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val (statics, quad0) = auditsOf(name, fn, dir)
        // cross-scale confirmation: only a fire that reproduces at the
        // larger dir is a finding (constant-mean-group keys clear)
        val quad =
          if (quad0.isEmpty) Nil
          else auditsOf(name, fn, confirmDir)._2
        statics ++ quad
    }
    assert(findings.isEmpty, findings.mkString("\n"))
  }

  test("group-quadratic detector: the r15 q329 all-pairs shape fires, " +
      "and keeps firing at the larger scale factor") {
    // the EXACT shape the r15 verdict flagged weak: part self-joined on
    // p_brand (NDV 25 at EVERY scale — the domain-grain tell) with a
    // k1 < k2 pair filter
    def offender(s: org.apache.spark.sql.SparkSession, d: String) = {
      val p = graft.Tables.load(s, d, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_size"))
      p.toDF("p_brand", "k1", "sz1")
        .join(p.toDF("p_brand", "k2", "sz2"), "p_brand")
        .filter(col("k1") < col("k2"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n_pairs"))
    }
    val f = ExplainAudit.auditQuadraticConfirmed(offender,
      "synthetic_r15_q329", spark, Seq(sf("sf0.001"), sf("sf0.1")),
      allow = Set.empty)
    assert(f.nonEmpty, "the r15 q329 shape must fire at both scales")
    assert(f.head.kind === "group_quadratic_self_join")
    assert(f.head.detail.contains("p_brand"))
  }

  test("group-quadratic detector: row-identity keys, enrichment joins, " +
      "bounded sides, scale-growing keys, and the allowlist stay quiet") {
    val dir = sf("sf0.001")
    // order-grain self-join (the q334 substrate): l_orderkey's NDV
    // scales WITH the data, so groups stay O(items per order) at any
    // scale — no fire even at one SF
    val l = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val orderGrain = l.toDF("k", "p1").join(l.toDF("k", "p2"), "k")
      .filter(col("p1") < col("p2"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    assert(ExplainAudit.auditQuadraticSelfJoin(orderGrain,
      "synthetic_order_grain", allow = Set.empty).isEmpty)
    // 1:N ENRICHMENT join on a tiny key: the offsets side carries ONE
    // row per key (an aggregate re-derived from the same leaf but left
    // unbounded by a checkpoint would look identical), so the join is
    // linear and the both-sides group rule keeps it quiet
    val e = graft.Tables.load(spark, dir, "events")
      .select(pmod(col("user_id"), lit(5)).as("b"), col("value"))
    val offsets = e.groupBy(col("b"))
      .agg(sum(col("value")).as("off"))
      .localCheckpoint(true) // collapses to an (unbounded-looking) leaf
    try {
      val enrich = e.join(offsets, "b")
      assert(ExplainAudit.auditQuadraticSelfJoin(enrich,
        "synthetic_enrich", allow = Set.empty).isEmpty)
    } finally graft.operators.Graph.release(offsets)
    // month-grain pairs (the q290 substrate): both sides are AGGREGATES
    // — bounded by construction, screened out before any measurement
    val m = graft.Tables.load(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("c"))
    val monthGrain = m.toDF("m1", "c1")
      .crossJoin(m.toDF("m2", "c2")).filter(col("m1") < col("m2"))
    assert(ExplainAudit.auditQuadraticSelfJoin(monthGrain,
      "synthetic_month_grain", allow = Set.empty).isEmpty)
    // SCALE-GROWING key (the q68/q167 class): per-user pairing fires on
    // the 15-user sf0.001 slice but user NDV grows 100x by sf0.1 —
    // cross-scale confirmation clears it
    def userPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
      val ev = graft.Tables.load(s, d, "events")
        .select(col("user_id"), col("ts"))
      ev.toDF("u", "t1").join(ev.toDF("u", "t2"), "u")
        .filter(col("t1") < col("t2"))
        .groupBy(col("u")).agg(count(lit(1)).as("n"))
    }
    assert(ExplainAudit.auditQuadraticSelfJoin(
      userPairs(spark, dir), "synthetic_user_pairs",
      allow = Set.empty).nonEmpty,
      "the small slice alone must look quadratic (15 users)")
    assert(ExplainAudit.auditQuadraticConfirmed(userPairs,
      "synthetic_user_pairs", spark, Seq(dir, sf("sf0.1")),
      allow = Set.empty).isEmpty,
      "user NDV grows with the data — cross-scale must clear it")
    // an allowlisted name suppresses even a genuine offender — the
    // reviewed-case escape hatch is honored before any probe runs
    val p = graft.Tables.load(spark, dir, "part")
      .select(col("p_brand"), col("p_partkey"))
    val allowed = p.toDF("p_brand", "k1")
      .join(p.toDF("p_brand", "k2"), "p_brand")
      .filter(col("k1") < col("k2"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
    assert(ExplainAudit.auditQuadraticSelfJoin(allowed, "reviewed_case",
      allow = Set("reviewed_case")).isEmpty)
    // SEMI-JOIN on the same tiny key: a membership probe emits at most
    // one row per left row — linear, never a pair generator — so the
    // join-type screen keeps it quiet however small the key domain
    val brands = graft.Tables.load(spark, dir, "part")
      .filter(col("p_size") > 25).select(col("p_brand"))
    val semi = p.join(brands, Seq("p_brand"), "left_semi")
    assert(ExplainAudit.auditQuadraticSelfJoin(semi, "synthetic_semi",
      allow = Set.empty).isEmpty)
  }

  test("the quadratic sink catches an auditedCut-wrapped offender whose " +
      "post-cut plan is a bare LogicalRDD leaf") {
    val dir = sf("sf0.001")
    val p = graft.Tables.load(spark, dir, "part")
      .select(col("p_brand"), col("p_partkey"))
    def offender() = p.toDF("p_brand", "k1")
      .join(p.toDF("p_brand", "k2"), "p_brand")
      .filter(col("k1") < col("k2"))
      .groupBy(col("p_brand")).agg(count(lit(1)).as("n"))
    // sink tapped: the cut reports the pre-cut join
    val buf = Seq.newBuilder[ExplainAudit.Finding]
    ExplainAudit.quadraticSink = f => { buf += f; () }
    val cut =
      try ExplainAudit.auditedCut(offender(), "synthetic_cut_offender")
      finally ExplainAudit.quadraticSink = null
    try {
      val sunk = buf.result()
      assert(sunk.nonEmpty && sunk.head.kind === "group_quadratic_self_join")
      assert(sunk.head.query === "synthetic_cut_offender")
      // and the post-cut plan is exactly the blind spot: no Join left
      assert(ExplainAudit.auditQuadraticSelfJoin(cut,
        "synthetic_cut_offender", allow = Set.empty).isEmpty)
      // sink cleared: a fresh cut of the same offender reports nothing
      // (production path — the measurement must not run)
      ExplainAudit.auditedCut(offender(), "synthetic_cut_offender")
      assert(buf.result() === sunk)
    } finally graft.operators.Graph.release(cut)
  }
}
