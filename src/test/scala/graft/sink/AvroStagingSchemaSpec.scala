package graft.sink

import graft.types.{CanonicalColumn, CanonicalType}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Golden matrices for the Avro staging type algebra
  * (`avro_staging_file.py:149-310`) — rendering only; execution stays ORC
  * (no spark-avro jar in this sandbox, documented in COVERAGE §2.1). */
class AvroStagingSchemaSpec extends AnyFunSuite {

  import AvroStagingSchema._
  import AvroType._

  private def col(t: CanonicalType, safe: Boolean = true) =
    CanonicalColumn("c", t, nullable = true, safeMapping = safe)

  test("canonical→Avro: strings and boolean stage native and safe") {
    for (t <- Seq(CanonicalType.FixedString, CanonicalType.VariableString,
                  CanonicalType.LargeString)) {
      val s = fromCanonical(col(t))
      assert(s.avro == AString && s.safeMapping)
    }
    val b = fromCanonical(col(CanonicalType.Boolean1))
    assert(b.avro == ABoolean && b.safeMapping)
  }

  test("canonical→Avro: binary stages bytes, or base64 string on demand") {
    for (t <- Seq(CanonicalType.Binary, CanonicalType.LargeBinary)) {
      assert(fromCanonical(col(t)).avro == ABytes)
      assert(fromCanonical(col(t), binaryAsBase64 = true).avro == AString)
      assert(fromCanonical(col(t)).safeMapping)
    }
  }

  test("canonical→Avro: bounded integers/floats native only when the " +
    "frontend mapping was safe; else string + unsafe") {
    val native = Seq(
      CanonicalType.Integer1 -> AInt, CanonicalType.Integer2 -> AInt,
      CanonicalType.Integer4 -> AInt, CanonicalType.Integer8 -> ALong,
      CanonicalType.Float4 -> AFloat, CanonicalType.Double8 -> ADouble)
    for ((t, expect) <- native) {
      val safe = fromCanonical(col(t, safe = true))
      assert(safe.avro == expect && safe.safeMapping, t.name)
      val risky = fromCanonical(col(t, safe = false))
      assert(risky.avro == AString && !risky.safeMapping, t.name)
    }
  }

  test("canonical→Avro: unbounded/temporal/interval ALWAYS through string " +
    "and marked unsafe (the everything-risky-through-string rule)") {
    val throughString = Seq(CanonicalType.Integer38,
      CanonicalType.Decimal(Some(20), Some(4)), CanonicalType.Date,
      CanonicalType.Time, CanonicalType.Timestamp, CanonicalType.TimestampTz,
      CanonicalType.IntervalDs, CanonicalType.IntervalYm)
    for (t <- throughString) {
      val s = fromCanonical(col(t, safe = true)) // even when frontend safe
      assert(s.avro == AString && !s.safeMapping, t.name)
    }
  }

  test("Avro→canonical reverse map (read-back face)") {
    def back(a: AvroType, b64: Boolean = false) =
      toCanonical(StagingColumn("c", a, nullable = true, safeMapping = true),
        binaryAsBase64 = b64).ctype
    assert(back(ABoolean) == CanonicalType.Boolean1)
    assert(back(ABytes) == CanonicalType.Binary)
    assert(back(ABytes, b64 = true) == CanonicalType.VariableString)
    assert(back(ADouble) == CanonicalType.Double8)
    assert(back(AFloat) == CanonicalType.Float4)
    assert(back(AInt) == CanonicalType.Integer4)
    assert(back(ALong) == CanonicalType.Integer8)
    assert(back(AString) == CanonicalType.VariableString)
  }

  test(".avsc golden shape: record envelope, ['type','null'] unions in the " +
    "reference's member order, tableName annotation") {
    val json = schemaJson("load_db", "t1", Seq(
      StagingColumn("id", ALong, nullable = false, safeMapping = true),
      StagingColumn("price", AString, nullable = true, safeMapping = false)))
    assert(json ==
      """{
  "type" : "record",
  "name" : "t1",
  "namespace" : "load_db",
  "fields" : [{"name":"id","type":"long"}, {"name":"price","type":["string","null"]}],
  "tableName" : "load_db.t1"
}""")
  }

  test("java primitive remap: native 1:1, string-staged→String, " +
    "binary→implicit (None)") {
    val canonStr = col(CanonicalType.Decimal(None, None))
    val canonBin = col(CanonicalType.Binary)
    def staged(a: AvroType) = StagingColumn("c", a, nullable = true,
      safeMapping = true)
    assert(javaPrimitive(staged(ABoolean), canonStr).contains("Boolean"))
    assert(javaPrimitive(staged(ADouble), canonStr).contains("Double"))
    assert(javaPrimitive(staged(AFloat), canonStr).contains("Float"))
    assert(javaPrimitive(staged(AInt), canonStr).contains("Integer"))
    assert(javaPrimitive(staged(ALong), canonStr).contains("Long"))
    assert(javaPrimitive(staged(AString), canonStr).contains("String"))
    assert(javaPrimitive(staged(ABytes), canonBin).isEmpty)
  }

  test("fromStructType end-to-end: Spark schema → staging .avsc") {
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType, nullable = false),
      StructField("l_extendedprice", DecimalType(12, 2), nullable = true),
      StructField("l_shipdate", TimestampType, nullable = true),
      StructField("l_comment", StringType, nullable = true)))
    val json = fromStructType("load_db", "lineitem", schema)
    assert(json.contains(""""name" : "lineitem""""))
    assert(json.contains("""{"name":"l_orderkey","type":"long"}"""))
    // decimal and timestamp both route through string
    assert(json.contains(
      """{"name":"l_extendedprice","type":["string","null"]}"""))
    assert(json.contains("""{"name":"l_shipdate","type":["string","null"]}"""))
    assert(json.contains("""{"name":"l_comment","type":["string","null"]}"""))
  }

  test("unknown Avro type name rejected") {
    intercept[IllegalArgumentException](AvroType.parse("fixed"))
  }
}
