package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** SafeCasts must be BIT-IDENTICAL to try_cast for every input — the
  * guards may only claim rows whose outcome is provable and must route
  * everything else to the real try_cast. */
class SafeCastsSpec extends SparkSpec {
  import spark.implicits._

  private def intParity(inputs: Seq[String]): Unit = {
    val df = inputs.toDF("s")
    val got = df.select(
        col("s"),
        SafeCasts.tryStringToInt(col("s")).as("safe"),
        col("s").try_cast("int").as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"tryStringToInt('${r.get(0)}') = ${r.get(1)} != try_cast ${r.get(2)}")
    }
  }

  test("tryStringToInt: torture corners equal try_cast") {
    intParity(Seq(
      "1-URGENT", "2-HIGH", "123", " 123 ", "+12", "-12", "1.5", "1.0",
      "", " ", "  ", "123456789012", "2147483647", "2147483648",
      "-2147483648", "-2147483649", "\t12\n", "12a", "a12", "0x10",
      "1e3", "00012", "+", "-", "+-1", "--1", "1 2",
      "\u0663",            // ARABIC-INDIC DIGIT THREE (non-ASCII digit)
      "\uff11\uff12",      // FULLWIDTH digits
      "\u00a012",          // NO-BREAK SPACE prefix (NOT trimmable)
      "12\u00a0",          // NO-BREAK SPACE suffix
      "\u200912",          // THIN SPACE prefix (trimmable whitespace)
      "\u300012\u3000",    // IDEOGRAPHIC SPACE (trimmable)
      "\u000012",          // NUL prefix (ISO control, trimmable)
      "12\u007f",          // DEL suffix (ISO control, trimmable)
      "12\u0085",          // C1 NEL (ISO control, trimmable)
      "42\u001c",          // FILE SEPARATOR (whitespace per isWhitespace)
      "+0000000012", "9999999999999999999999", "-00",
      null))
  }

  test("tryStringToInt: seeded random strings equal try_cast") {
    val charGen = Gen.frequency(
      6 -> Gen.numChar,
      1 -> Gen.oneOf('+', '-', ' ', '\t', '\u00a0', '\u2009',
        '\u3000', '\u0085', 'a', '.', '\u0663'))
    val strGen = Gen.chooseNum(0, 14)
      .flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
    val cases = (0 until 400).flatMap(i =>
      strGen.apply(Gen.Parameters.default, Seed(i.toLong)))
    intParity(cases)
  }

  test("tryNarrowDecimalSameScale: boundary sweep equals try_cast") {
    val vals = Seq("999.99", "1000.00", "-999.99", "-1000.00", "0.00",
      "999.994", "0.01", "-0.01", "12345678.90", null)
    val df = vals.toDF("raw")
      .select(col("raw").cast("decimal(12,2)").as("d"))
    val got = df.select(
        col("d"),
        SafeCasts.tryNarrowDecimalSameScale(col("d"), 5, 2).as("safe"),
        col("d").try_cast("decimal(5,2)").as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"tryNarrowDecimalSameScale(${r.get(0)}) = ${r.get(1)} != ${r.get(2)}")
    }
  }

  test("q18 rewrite: counts equal the plain try_cast formulation") {
    val o = graft.Tables.load(spark, sf("sf0.001"), "orders")
    val ref = o.select(
        col("o_orderpriority").try_cast("int").as("a"),
        substring(col("o_orderpriority"), 1, 1).try_cast("int").as("b"),
        col("o_totalprice").cast("decimal(12,2)").try_cast("decimal(5,2)")
          .as("c"))
      .agg(count(col("a")), count(col("b")), count(col("c")))
      .collect()(0)
    val safe = o.select(
        SafeCasts.tryStringToInt(col("o_orderpriority")).as("a"),
        SafeCasts.tryStringToInt(substring(col("o_orderpriority"), 1, 1))
          .as("b"),
        SafeCasts.tryNarrowDecimalSameScale(
          col("o_totalprice").cast("decimal(12,2)"), 5, 2).as("c"))
      .agg(count(col("a")), count(col("b")), count(col("c")))
      .collect()(0)
    assert(ref == safe)
  }
}
