package graft.types

import org.scalatest.funsuite.AnyFunSuite

class FrontendTypesSpec extends AnyFunSuite {
  import CanonicalType._
  import FrontendTypes.FrontendCol

  private def td(t: String, p: Option[Int] = None, s: Option[Int] = None) =
    FrontendTypes.teradata(FrontendCol("c", t, p, s))
  private def ms(t: String, p: Option[Int] = None, s: Option[Int] = None) =
    FrontendTypes.mssql(FrontendCol("c", t, p, s))

  test("teradata scalar matrix") {
    val cases: Seq[(String, CanonicalType)] = Seq(
      "BIGINT" -> Integer8, "BYTEINT" -> Integer1, "SMALLINT" -> Integer2,
      "INTEGER" -> Integer4, "INT" -> Integer4,
      "BLOB" -> LargeBinary, "BYTE" -> Binary, "VARBYTE" -> Binary,
      "CHAR" -> FixedString, "CLOB" -> LargeString,
      "VARCHAR" -> VariableString, "LONG VARCHAR" -> VariableString,
      "DATE" -> Date, "TIME" -> Time, "TIMESTAMP" -> Timestamp,
      "TIMESTAMP WITH TIME ZONE" -> TimestampTz,
      // one 8-byte float family, three spellings
      "DOUBLE PRECISION" -> Double8, "FLOAT" -> Double8, "REAL" -> Double8)
    cases.foreach { case (n, want) => assert(td(n).ctype == want, n) }
    // case-insensitive
    assert(td("varchar").ctype == VariableString)
  }

  test("teradata interval variants collapse to the two canonical intervals") {
    Seq("INTERVAL YEAR", "INTERVAL YEAR TO MONTH", "INTERVAL MONTH")
      .foreach(n => assert(td(n).ctype == IntervalYm, n))
    Seq("INTERVAL DAY", "INTERVAL DAY TO SECOND", "INTERVAL HOUR TO MINUTE",
      "INTERVAL MINUTE", "INTERVAL SECOND")
      .foreach(n => assert(td(n).ctype == IntervalDs, n))
  }

  test("teradata number path narrows scale-0 and flags bare NUMBER unsafe") {
    assert(td("DECIMAL", Some(5), Some(0)).ctype == Integer4)
    assert(td("NUMBER", Some(18), Some(0)).ctype == Integer8)
    assert(td("NUMERIC", Some(38), Some(0)).ctype == Integer38)
    assert(td("DECIMAL", Some(12), Some(2)).ctype == Decimal(Some(12), Some(2)))
    val bare = td("NUMBER")
    assert(bare.ctype == Decimal(None, None) && !bare.safeMapping)
    intercept[IllegalArgumentException] { td("GEOMETRY") }
  }

  test("mssql scalar matrix incl. unicode semantics and float/real widths") {
    assert(ms("bit").ctype == Boolean1)
    assert(ms("tinyint").ctype == Integer2 && ms("smallint").ctype == Integer2)
    assert(ms("int").ctype == Integer4 && ms("bigint").ctype == Integer8)
    // MSSQL float is 8-byte, real is 4-byte — opposite of Teradata naming
    assert(ms("float").ctype == Double8 && ms("real").ctype == Float4)
    assert(ms("date").ctype == Date && ms("time").ctype == Time)
    Seq("smalldatetime", "datetime", "datetime2")
      .foreach(n => assert(ms(n).ctype == Timestamp, n))
    assert(ms("datetimeoffset").ctype == TimestampTz)
    assert(ms("uniqueidentifier").ctype == VariableString)
    Seq("binary", "varbinary", "image")
      .foreach(n => assert(ms(n).ctype == Binary, n))
    // n-prefixed character types carry unicode semantics
    assert(ms("nchar").charSemantics.contains(CharSemantics.Unicode))
    assert(ms("nvarchar").charSemantics.contains(CharSemantics.Unicode))
    assert(ms("ntext").charSemantics.contains(CharSemantics.Unicode))
    assert(ms("char").charSemantics.isEmpty)
  }

  test("mssql number path normalizes edge cases like the reference") {
    // scale > precision widens precision to scale
    assert(ms("numeric", Some(3), Some(5)).ctype == Decimal(Some(5), Some(5)))
    // negative scale clamps to 0 then narrows to integral
    assert(ms("decimal", Some(10), Some(-5)).ctype == Integer8)
    assert(ms("money", Some(19), Some(4)).ctype == Decimal(Some(19), Some(4)))
    assert(ms("decimal", Some(2), Some(0)).ctype == Integer1)
    intercept[IllegalArgumentException] { ms("geography") }
  }

  test("frontend output feeds TypeMapper like any canonical column") {
    import org.apache.spark.sql.types._
    assert(TypeMapper.toSpark(ms("datetime2").ctype) == TimestampNTZType)
    assert(TypeMapper.toSpark(td("BIGINT").ctype) == LongType)
    assert(TypeMapper.toSpark(td("DECIMAL", Some(12), Some(2)).ctype) ==
      DecimalType(12, 2))
  }
}
