package graft.source

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.types.{CanonicalColumn, CanonicalType}

/** Sampling-based type inference.
  *
  * The reference infers precision/scale for numeric columns that lack
  * catalog metadata by ONE aggregate query over a block sample: per-column
  * max integral magnitude, max scale, and a scientific-notation marker
  * (`src/goe/offload/offload_source_table.py:668-916`). Spark-native: a
  * single `df.sample(...).agg(...)` with the same magnitude/scale pyramid —
  * one job, no per-column scans, which is what makes inference affordable on
  * a 100 TB source (sample fraction is the cost knob, exactly like the
  * reference's `--data-sample-percent`).
  */
object Sampling {

  final case class NumericProfile(
      column: String,
      maxIntegralDigits: Int,
      maxScale: Int,
      nullable: Boolean)

  /** Integral-digit count of a numeric column value. */
  private def integralDigits(c: String) =
    length(abs(col(c)).cast(DecimalType(38, 0)).cast("string"))

  /** Digits after the decimal point (0 for integral values), computed
    * exactly on a decimal cast — never on float formatting, which is
    * engine-dependent. */
  private def scaleOf(c: String, maxScale: Int) = {
    val dec = col(c).cast(DecimalType(38, math.min(maxScale, 18)))
    // strip trailing zeros via repeated comparison against coarser casts:
    // scale s is the smallest s with cast(x, dec(38,s)) == x
    val candidates = (0 to math.min(maxScale, 18)).map { s =>
      when(dec === dec.cast(DecimalType(38, s)).cast(DecimalType(38, math.min(maxScale, 18))), lit(s))
    }
    coalesce(least(candidates: _*), lit(maxScale))
  }

  /** Profile numeric columns with one aggregate job over a sample. */
  def profileNumerics(df: DataFrame, columns: Seq[String],
                      sampleFraction: Double = 1.0,
                      maxScale: Int = 18): Seq[NumericProfile] = {
    require(columns.nonEmpty)
    val sampled =
      if (sampleFraction >= 1.0) df
      else df.sample(withReplacement = false, sampleFraction, seed = 42L)
    val aggs = columns.flatMap { c =>
      Seq(
        max(integralDigits(c)).as(s"${c}__digits"),
        max(scaleOf(c, maxScale)).as(s"${c}__scale"),
        max(col(c).isNull.cast("int")).as(s"${c}__nulls"))
    }
    val row: Row = sampled.agg(aggs.head, aggs.tail: _*).head()
    columns.map { c =>
      def get(suffix: String): Int = {
        val i = row.fieldIndex(s"${c}__$suffix")
        if (row.isNullAt(i)) 0 else row.getInt(i)
      }
      NumericProfile(c, get("digits"), get("scale"), get("nulls") > 0)
    }
  }

  /** Map a profile to a canonical column, mirroring the reference's rules:
    * scale 0 + digits ≤ 18 → sized integer; digits ≤ 38 → DECIMAL with
    * sampled p/s but `safeMapping = false` (sampling can under-observe —
    * reference marks sampled mappings unsafe so loads use try_cast). */
  def toCanonical(p: NumericProfile): CanonicalColumn = {
    import CanonicalType._
    val ctype =
      if (p.maxScale == 0) {
        if (p.maxIntegralDigits <= 2) Integer1
        else if (p.maxIntegralDigits <= 4) Integer2
        else if (p.maxIntegralDigits <= 9) Integer4
        else if (p.maxIntegralDigits <= 18) Integer8
        else Integer38
      } else {
        val precision = math.min(p.maxIntegralDigits + p.maxScale, 38)
        Decimal(Some(precision), Some(p.maxScale))
      }
    CanonicalColumn(p.column, ctype, nullable = p.nullable,
      safeMapping = false)
  }
}
