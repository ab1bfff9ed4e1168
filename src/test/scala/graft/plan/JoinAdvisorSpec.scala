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
}
