package graft.types

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Canonical↔Spark mapping matrix — mirrors the reference's
  * test_data_type_mappings.py coverage style. */
class TypeMapperSpec extends AnyFunSuite {
  import CanonicalType._

  test("canonical -> Spark matrix") {
    assert(TypeMapper.toSpark(VariableString) == StringType)
    assert(TypeMapper.toSpark(FixedString) == StringType)
    assert(TypeMapper.toSpark(LargeString) == StringType)
    assert(TypeMapper.toSpark(Binary) == BinaryType)
    assert(TypeMapper.toSpark(Integer1) == ByteType)
    assert(TypeMapper.toSpark(Integer2) == ShortType)
    assert(TypeMapper.toSpark(Integer4) == IntegerType)
    assert(TypeMapper.toSpark(Integer8) == LongType)
    assert(TypeMapper.toSpark(Integer38) == DecimalType(38, 0))
    assert(TypeMapper.toSpark(Decimal(Some(10), Some(2))) == DecimalType(10, 2))
    assert(TypeMapper.toSpark(Decimal(None, None)) == DecimalType(38, 18))
    assert(TypeMapper.toSpark(Float4) == FloatType)
    assert(TypeMapper.toSpark(Double8) == DoubleType)
    assert(TypeMapper.toSpark(Date) == DateType)
    assert(TypeMapper.toSpark(Time) == LongType)
    assert(TypeMapper.toSpark(Timestamp) == TimestampNTZType)
    assert(TypeMapper.toSpark(TimestampTz) == TimestampType)
    assert(TypeMapper.toSpark(Boolean1) == BooleanType)
  }

  test("Spark -> canonical round trip is stable for scalar types") {
    val scalars: Seq[DataType] = Seq(StringType, BinaryType, ByteType,
      ShortType, IntegerType, LongType, DecimalType(12, 4), FloatType,
      DoubleType, DateType, TimestampNTZType, TimestampType, BooleanType)
    scalars.foreach { dt =>
      assert(TypeMapper.toSpark(TypeMapper.fromSpark(dt)) == dt, s"for $dt")
    }
  }

  test("decimal(38,0) canonicalises to INTEGER_38") {
    assert(TypeMapper.fromSpark(DecimalType(38, 0)) == Integer38)
  }

  test("nested types degrade to LARGE_STRING with unsafe mapping") {
    val cols = TypeMapper.fromStructType(StructType(Seq(
      StructField("a", IntegerType),
      StructField("v", ArrayType(FloatType)))))
    assert(cols(0).safeMapping)
    assert(cols(1).ctype == LargeString)
    assert(!cols(1).safeMapping)
  }

  test("safe-mapping merge rule: any unsafe makes the merge unsafe") {
    val safe = CanonicalColumn("c", Integer4)
    val unsafe = CanonicalColumn("c", Integer4, safeMapping = false)
    assert(!safe.merge(unsafe).safeMapping)
    assert(safe.merge(safe).safeMapping)
  }

  test("classification predicates") {
    assert(CanonicalColumn("c", Decimal(Some(10), Some(2))).isNumberBased)
    assert(CanonicalColumn("c", Timestamp).isDateBased)
    assert(CanonicalColumn("c", Timestamp).hasTimeElement)
    assert(!CanonicalColumn("c", Date).hasTimeElement)
    assert(CanonicalColumn("c", Double8).isNanCapable)
    assert(CanonicalColumn("c", LargeString).isStringBased)
  }

  test("synthetic partition naming round-trips") {
    val info = PartitionInfo("l_shipdate", "M")
    val name = PartitionInfo.syntheticName(info)
    assert(name == "goe_part_m_l_shipdate")
    assert(PartitionInfo.decodeName(name).contains(("m", "l_shipdate")))
  }
}
