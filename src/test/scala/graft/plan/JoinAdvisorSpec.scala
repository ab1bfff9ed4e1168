package graft.plan

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The advisor's decision table, exercised with constructed relations:
  * the diagnostics it composes (CMS bound, hottest-key share) are
  * oracle-checked elsewhere (q167, q155); here we pin the decisions. */
class JoinAdvisorSpec extends SparkSpec {
  import spark.implicits._

  private def rel(keys: Seq[Long]) = keys.toDF("k")

  test("small right side broadcasts; CMS bound dominates the true size") {
    val left = rel(1L to 1000L)
    val right = rel(1L to 10L)
    val a = JoinAdvisor.advise(left, "k", right, "k",
      broadcastRowLimit = 100L)
    assert(a.recommendation === "broadcast_right")
    assert(a.joinSizeEst >= 10L) // Cormode–Muthukrishnan: est ≥ truth
  }

  test("small left side broadcasts when the right is large") {
    val a = JoinAdvisor.advise(rel(1L to 10L), "k",
      rel(1L to 1000L), "k", broadcastRowLimit = 100L)
    assert(a.recommendation === "broadcast_left")
  }

  test("balanced large sides sort-merge; a hot key flips to salted") {
    val balanced = JoinAdvisor.advise(rel(1L to 500L), "k",
      rel(1L to 500L), "k", broadcastRowLimit = 10L)
    assert(balanced.recommendation === "sort_merge")
    // 60% of the left rows share one key: far past the 10% fence
    val hot = rel(Seq.fill(300)(7L) ++ (1L to 200L))
    val skewed = JoinAdvisor.advise(hot, "k", rel(1L to 500L), "k",
      broadcastRowLimit = 10L)
    assert(skewed.maxKeyShareL_ppm > 100000L)
    assert(skewed.recommendation === "sort_merge_salted")
  }

  test("an empty side is its own verdict; json renders every field") {
    val a = JoinAdvisor.advise(rel(Seq.empty), "k", rel(1L to 5L), "k")
    assert(a.recommendation === "empty_side")
    val js = JoinAdvisor.renderJson(a)
    assert(js.contains("\"recommendation\": \"empty_side\"") &&
      js.contains("\"join_size_est\""))
  }

  test("keyQuantiles reports the frequency percentiles of a key") {
    val df = rel(Seq.fill(8)(1L) ++ Seq.fill(4)(2L) ++ (3L to 10L))
    val q = JoinAdvisor.keyQuantiles(df, "k").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(q(50) === 1L && q(99) === 8L)
  }

  // ---- execution wiring: the advice drives the join it scored ----

  private def sameRows(a: org.apache.spark.sql.DataFrame,
                       b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.columns.toSeq === b.columns.toSeq)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("saltedJoin is row-identical to the plain join, inner and left") {
    // hot key 7 (60% of rows), keys 900+ unmatched on the right
    val left = (Seq.fill(300)(7L) ++ (1L to 200L) ++ (901L to 920L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "lv")
    val right = (1L to 500L).map(k => (k, k * 10)).toDF("k", "rv")
    sameRows(graft.plan.Salting.saltedJoin(left, right, Seq("k")),
      left.join(right, Seq("k"), "inner"))
    sameRows(graft.plan.Salting.saltedJoin(left, right, Seq("k"), "left"),
      left.join(right, Seq("k"), "left"))
    intercept[IllegalArgumentException] {
      graft.plan.Salting.saltedJoin(left, right, Seq("k"), "full")
    }
  }

  test("adviseAndJoin: a skewed fixture takes the salted path and " +
      "matches the plain join hash-for-hash") {
    val left = (Seq.fill(300)(7L) ++ (1L to 200L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "lv")
    val right = (1L to 500L).map(k => (k, k * 10)).toDF("k", "rv")
    val (joined, a) = JoinAdvisor.adviseAndJoin(left, right, "k",
      broadcastRowLimit = 10L)
    assert(a.recommendation === "sort_merge_salted")
    // the salted rewrite is structurally present (salt column in plan)
    assert(joined.queryExecution.analyzed.toString.contains("__salt"))
    sameRows(joined, left.join(right, Seq("k"), "inner"))
  }

  test("adviseAndJoin: right-side skew under an inner join salts the " +
      "swapped sides and restores plain-join column order") {
    val left = (1L to 500L).map(k => (k, k + 1000)).toDF("k", "lv")
    val right = (Seq.fill(300)(7L) ++ (1L to 200L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "rv")
    val (joined, a) = JoinAdvisor.adviseAndJoin(left, right, "k",
      broadcastRowLimit = 10L)
    assert(a.recommendation === "sort_merge_salted" &&
      a.maxKeyShareR_ppm > 100000L)
    sameRows(joined, left.join(right, Seq("k"), "inner"))
  }

  test("adviseAndJoin: a small right side executes as a broadcast join") {
    val left = (1L to 1000L).map(k => (k, k)).toDF("k", "lv")
    val right = (1L to 10L).map(k => (k, k * 10)).toDF("k", "rv")
    val (joined, a) = JoinAdvisor.adviseAndJoin(left, right, "k",
      broadcastRowLimit = 100L)
    assert(a.recommendation === "broadcast_right")
    assert(joined.queryExecution.sparkPlan.toString
      .contains("BroadcastHashJoin"))
    sameRows(joined, left.join(right, Seq("k"), "inner"))
  }
}
