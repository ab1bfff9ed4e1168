package graft.verify

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.verify.Expectations._

/** Rule-engine semantics on synthetic frames with known defects, plus
  * the fixed q257 suite over the star schema. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private val dirty = Seq(
    (Some(1L), Some("a"), Some(0.05)),
    (Some(1L), Some("a"), Some(0.20)),   // dup key, out of range
    (None, Some("zz"), Some(0.10)),      // null key, bad value
    (Some(3L), None, None)               // nulls are NOT value violations
  ).toDF("k", "v", "x")

  private val parents = Seq(1L, 2L).toDF("pk")

  test("single-table rules count exactly: nulls, dupes, values, range") {
    val got = evaluate(spark,
      Map("t" -> dirty, "p" -> parents), Seq(
        NotNull("t", "k"),
        Unique("t", Seq("k")),
        AcceptedValues("t", "v", Seq("a", "b")),
        InRange("t", "x", 0L, 100000L)))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed")))
      .toMap
    assert(got("not_null:t.k") === ((1L, false)))
    // 4 rows, 3 distinct key tuples (1, null, 3) -> one excess row
    assert(got("unique:t.k") === ((1L, false)))
    assert(got("accepted_values:t.v") === ((1L, false)))
    assert(got("in_range:t.x") === ((1L, false)))
  }

  test("in_range survives un-castable values and counts them as " +
      "violations (ANSI cast would abort the scan)") {
    val nasty = Seq("0.05", "N/A", "9999999999999.0", "0.2")
      .toDF("x")
    val got = evaluate(spark, Map("t" -> nasty),
      Seq(InRange("t", "x", 0L, 100000L))).head
    // N/A (un-castable), the 1e13 overflow, and 0.2 all violate
    assert(got.getAs[Long]("n_violations") === 3L)
    // and the row-level predicate agrees
    val rows = sampleViolations(nasty,
      Seq(InRange("t", "x", 0L, 100000L)), Seq("x"), perRule = 10)
      .collect().map(_.getAs[String]("violating_value")).toSet
    assert(rows === Set("N/A", "9999999999999.0", "0.2"))
  }

  test("referential rule counts orphan KEYS, not rows; null child " +
      "keys are skipped") {
    val child = Seq(Some(1L), Some(9L), Some(9L), None)
      .toDF("fk")
    val got = evaluate(spark,
      Map("c" -> child, "p" -> parents), Seq(
        RefIntegrity("c", "fk", "p", "pk"))).head
    assert(got.getAs[Long]("n_rows") === 4L)
    // 9 appears twice but is ONE missing key; null is skipped
    assert(got.getAs[Long]("n_violations") === 1L)
    assert(!got.getAs[Boolean]("passed"))
  }

  test("a clean table passes every rule") {
    val clean = Seq((1L, "a", 0.1), (2L, "b", 0.0)).toDF("k", "v", "x")
    val out = evaluate(spark, Map("t" -> clean, "p" -> parents), Seq(
      NotNull("t", "k"), Unique("t", Seq("k")),
      AcceptedValues("t", "v", Seq("a", "b")),
      InRange("t", "x", 0L, 100000L),
      RefIntegrity("t", "k", "p", "pk")))
    assert(out.filter(!col("passed")).count() === 0L)
  }

  test("parseRules round-trips every rule type from JSONL") {
    val f = Files.createTempDirectory("exp").resolve("rules.jsonl")
    Files.write(f, java.util.Arrays.asList(
      """{"type":"not_null","table":"t","column":"k"}""",
      """{"type":"unique","table":"t","columns":["k","v"]}""",
      """{"type":"accepted_values","table":"t","column":"v","values":["a","b"]}""",
      """{"type":"in_range","table":"t","column":"x","lo_e6":0,"hi_e6":100000}""",
      """{"type":"ref","table":"t","column":"k","parent_table":"p","parent_column":"pk"}"""))
    val rules = parseRules(spark, f.toString)
    assert(rules.toSet === Set(
      NotNull("t", "k"), Unique("t", Seq("k", "v")),
      AcceptedValues("t", "v", Seq("a", "b")),
      InRange("t", "x", 0L, 100000L),
      RefIntegrity("t", "k", "p", "pk")))
  }

  test("sampleViolations: every sampled row actually violates its " +
      "rule, capped per rule, deterministic") {
    val out = graft.queries.CurationExtras
      .defs("q259_violation_rows")(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    val byRule = out.groupBy(_.getString(0))
    assert(byRule.forall(_._2.length <= 5))
    // the passing discount rule contributes nothing
    assert(!byRule.contains("in_range:lineitem.l_discount"))
    // each tax sample's value really exceeds the bound
    byRule.get("in_range:lineitem.l_tax").foreach(_.foreach { r =>
      assert(BigDecimal(r.getAs[String]("violating_value")) >
        BigDecimal("0.05"))
    })
    // deterministic: a second run returns identical rows
    val again = graft.queries.CurationExtras
      .defs("q259_violation_rows")(spark, sf("sf0.001")).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("q257 suite: the tax and event-vocabulary rules fail on this " +
      "data, everything else passes") {
    val out = graft.queries.CurationExtras
      .defs("q257_expectations")(spark, sf("sf0.001")).collect()
    assert(out.length === 9)
    val failed = out.filterNot(_.getAs[Boolean]("passed"))
      .map(_.getString(0)).toSet
    assert(failed === Set("in_range:lineitem.l_tax",
      "accepted_values:events.event_type"))
    // violation counts are bounded by row counts everywhere
    assert(out.forall(r =>
      r.getAs[Long]("n_violations") <= r.getAs[Long]("n_rows")))
  }
}
