package graft.tools

import graft.SparkSpec

/** Scan-efficiency gate for the scan-bound queries: their selective
  * predicates must reach the parquet reader as PushedFilters, and their
  * read schemas must be pruned to the referenced columns — the two
  * properties that decide whether a 100 TB scan reads terabytes or
  * gigabytes. Complements ExplainAuditSpec (which forbids scale-fatal
  * plan shapes) with a positive check that pushdown survives the
  * DataFrame composition.
  */
class ScanPushdownSpec extends SparkSpec {

  private def formattedPlan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sf("sf0.001"))
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
  }

  test("q168 (TPC-H Q6 shape): ship-date and quantity filters are pushed") {
    val plan = formattedPlan("q168_forecast_revenue")
    assert(plan.contains("PushedFilters:"), plan.take(2000))
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters:")).mkString("\n")
    assert(pushed.contains("l_shipdate"), pushed)
    assert(pushed.contains("l_quantity"), pushed)
    // scan-bound: the lineitem read schema excludes untouched wide columns
    val readSchema = plan.linesIterator
      .filter(_.contains("ReadSchema:")).mkString("\n")
    assert(!readSchema.contains("l_partkey"), readSchema)
  }

  test("q164 (TPC-H Q4 shape): date window and return flag are pushed") {
    val plan = formattedPlan("q164_priority_returns")
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters:")).mkString("\n")
    assert(pushed.contains("o_orderdate"), pushed)
    assert(pushed.contains("l_returnflag"), pushed)
  }

  test("q177 (TPC-H Q7 shape): dims broadcast, fact predicates pushed") {
    val plan = formattedPlan("q177_volume_shipping")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters:")).mkString("\n")
    assert(pushed.contains("l_shipdate"), pushed)
  }

  test("q185 (TPC-H Q19 shape): the implied envelope prunes BOTH scans") {
    val plan = formattedPlan("q185_disjunctive_revenue")
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters:")).mkString("\n")
    // the disjunction itself can't push, but its envelope must:
    assert(pushed.contains("l_quantity"), pushed)   // qty ∈ [1, 30]
    assert(pushed.contains("p_brand"), pushed)      // brand ∈ {1,2,3}
    assert(pushed.contains("p_size"), pushed)       // size ∈ [1, 35]
  }

  test("q196 (TPC-H Q20 shape): the nested chain stays broadcast+semi") {
    val plan = formattedPlan("q196_dominant_suppliers")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(plan.contains("LeftSemi"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("q156 (TPC-H Q10 shape): column pruning reaches every scan") {
    val plan = formattedPlan("q156_returned_revenue")
    val schemas = plan.linesIterator
      .filter(_.contains("ReadSchema:")).mkString("\n")
    // lineitem: only the three referenced columns, never the full width
    assert(schemas.contains("l_orderkey"), schemas)
    assert(!schemas.contains("l_shipdate"), schemas)
    // customer: name + key only — the unreferenced wide columns that DO
    // exist in this dataset must be pruned out of the read schema
    assert(schemas.contains("c_name"), schemas)
    assert(!schemas.contains("c_acctbal") && !schemas.contains("c_mktsegment"),
      schemas)
  }
}
