package graft.tools

import graft.SparkSpec

/** CI plan-audit gate: every declared query must build a plan free of the
  * shapes that pass small-SF correctness but die at cluster scale —
  * cartesian products between row-scale inputs and unpartitioned windows
  * over unbounded inputs (single-task serialization). Catches regressions
  * the oracle hash gate cannot see. */
class ExplainAuditSpec extends SparkSpec {

  test("every query plan is free of cartesian products and global windows") {
    val dir = sf("sf0.001")
    val findings = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) => ExplainAudit.audit(fn(spark, dir), name)
    }
    assert(findings.isEmpty, findings.mkString("\n"))
  }
}
