package graft.types

import org.scalatest.funsuite.AnyFunSuite

/** Override-control matrix — mirrors the reference's
  * tests/unit/offload/test_data_type_mappings.py override cases plus the
  * Oracle NUMBER edge cases (oracle_offload_source_table.py:1405-1435). */
class TypeOverridesSpec extends AnyFunSuite {
  import CanonicalType._
  import TypeOverrides.{DecimalOverride, OverrideException}

  private val schema = Seq(
    CanonicalColumn("id", Integer8),
    CanonicalColumn("qty", Integer4),
    CanonicalColumn("price", Double8),
    CanonicalColumn("ratio", Decimal(Some(18), Some(4))),
    CanonicalColumn("name", VariableString),
    CanonicalColumn("created", Timestamp),
    CanonicalColumn("updated", TimestampTz))

  private def typeOf(cols: Seq[CanonicalColumn], n: String): CanonicalType =
    cols.find(_.name == n).get.ctype

  test("wildcard expansion is case-insensitive; unmatched pattern errors") {
    assert(TypeOverrides.expand(Seq("QT*"), schema.map(_.name)) == Seq("qty"))
    assert(TypeOverrides.expand(Seq("*at*"), schema.map(_.name)) ==
      Seq("ratio", "created", "updated"))
    intercept[OverrideException] {
      TypeOverrides.expand(Seq("nope*"), schema.map(_.name))
    }
    intercept[OverrideException] {
      TypeOverrides.expand(Seq("missing_col"), schema.map(_.name))
    }
  }

  test("integer/decimal/double overrides land with safeMapping=false") {
    val out = TypeOverrides(schema, TypeOverrides(
      integer1 = Seq("qty"),
      integer38 = Seq("id"),
      decimals = Seq(DecimalOverride(Seq("price"), 12, 2)),
      doubles = Seq("ratio")))
    assert(typeOf(out, "qty") == Integer1)
    assert(typeOf(out, "id") == Integer38)
    assert(typeOf(out, "price") == Decimal(Some(12), Some(2)))
    assert(typeOf(out, "ratio") == Double8)
    assert(out.filter(c => Seq("qty", "id", "price", "ratio").contains(c.name))
      .forall(!_.safeMapping))
    // untouched columns keep their mapping and safety
    assert(typeOf(out, "name") == VariableString)
    assert(out.find(_.name == "name").get.safeMapping)
  }

  test("date-based overrides: date, variable-string, timestamp-tz") {
    val out = TypeOverrides(schema, TypeOverrides(
      dates = Seq("created"),
      variableStrings = Seq("updated")))
    assert(typeOf(out, "created") == Date)
    assert(typeOf(out, "updated") == VariableString)
    val tz = TypeOverrides(schema, TypeOverrides(timestampTz = Seq("created")))
    assert(typeOf(tz, "created") == TimestampTz)
  }

  test("unicode override sets char semantics, keeps the type") {
    val out = TypeOverrides(schema, TypeOverrides(
      unicodeStrings = Seq("name")))
    val c = out.find(_.name == "name").get
    assert(c.ctype == VariableString)
    assert(c.charSemantics.contains(CharSemantics.Unicode))
    assert(c.safeMapping) // semantics-only override is not a type narrowing
  }

  test("type-class guards reject invalid conversions") {
    intercept[OverrideException] { // numeric flag on a string column
      TypeOverrides(schema, TypeOverrides(integer4 = Seq("name")))
    }
    intercept[OverrideException] { // date flag on a numeric column
      TypeOverrides(schema, TypeOverrides(dates = Seq("qty")))
    }
    intercept[OverrideException] { // unicode on a non-string column
      TypeOverrides(schema, TypeOverrides(unicodeStrings = Seq("qty")))
    }
    intercept[OverrideException] { // variable-string is the date->string path
      TypeOverrides(schema, TypeOverrides(variableStrings = Seq("name")))
    }
  }

  test("conflicting flags over one column error") {
    intercept[OverrideException] {
      TypeOverrides(schema, TypeOverrides(
        integer2 = Seq("qty"), integer4 = Seq("qt*")))
    }
    // same flag twice is not a conflict
    val ok = TypeOverrides(schema, TypeOverrides(
      integer2 = Seq("qty", "qt*")))
    assert(typeOf(ok, "qty") == Integer2)
  }

  test("decimal override validates precision/scale bounds") {
    intercept[IllegalArgumentException] { DecimalOverride(Seq("x"), 39, 0) }
    intercept[IllegalArgumentException] { DecimalOverride(Seq("x"), 10, 12) }
    intercept[IllegalArgumentException] { DecimalOverride(Seq("x"), 0, 0) }
  }

  test("Oracle NUMBER edge cases: scale>precision, negative scale, unknown") {
    // NUMBER(3,5): scale > precision widens precision to the scale
    assert(TypeOverrides.oracleNumber(Some(3), Some(5)) ==
      ((Decimal(Some(5), Some(5)), true)))
    // NUMBER(10,-5): negative scale clamps to 0 -> integral mapping
    assert(TypeOverrides.oracleNumber(Some(10), Some(-5)) ==
      ((Integer8, true)))
    // NUMBER (no precision, no scale) is an unsafe unbounded decimal
    assert(TypeOverrides.oracleNumber(None, None) ==
      ((Decimal(None, None), false)))
    // plain decimal passes through
    assert(TypeOverrides.oracleNumber(Some(12), Some(2)) ==
      ((Decimal(Some(12), Some(2)), true)))
  }

  test("decimal->integral thresholds mirror the reference") {
    def it(p: Int, safe: Boolean = true) =
      TypeOverrides.decimalToIntegral(Some(p), Some(0), safe)
    assert(it(1).contains(Integer1) && it(2).contains(Integer1))
    assert(it(3).contains(Integer2) && it(4).contains(Integer2))
    assert(it(5).contains(Integer4) && it(9).contains(Integer4))
    assert(it(10).contains(Integer8) && it(18).contains(Integer8))
    assert(it(19).contains(Integer38) && it(38).contains(Integer38))
    // unsafe mapping on the INTEGER_8 edge rounds up to INTEGER_38
    assert(it(17, safe = false).contains(Integer38))
    assert(it(18, safe = false).contains(Integer38))
    assert(it(16, safe = false).contains(Integer8))
    // non-zero scale is never integral
    assert(TypeOverrides.decimalToIntegral(Some(10), Some(2)).isEmpty)
    assert(TypeOverrides.decimalToIntegral(Some(10), None).isEmpty)
  }
}
