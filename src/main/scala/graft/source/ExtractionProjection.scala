package graft.source

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.types.{CanonicalColumn, CanonicalType}

/** Extraction projection: per-column normalisation applied at the source
  * boundary, before staging.
  *
  * Re-expression of the reference's RDBMS cast list
  * (`offload_transport.py:1228-1296`,
  * `oracle_offload_transport_rdbms_api.py:348-423`): most of its casts exist
  * because rows had to survive a text/Avro hop — under Spark the JDBC reader
  * returns typed rows, so only the semantic normalisations remain:
  *
  *  - NaN/±Inf → NULL for float columns unless the target is NaN-capable
  *    (`--allow-floating-point-conversions` policy);
  *  - TIMESTAMP WITH LOCAL TIME ZONE instants normalised to UTC (the
  *    reference's `CONCAT(CAST(.. AS VARCHAR2), ' UTC')` trick becomes a
  *    session-timezone-stable `to_utc_timestamp`);
  *  - intervals carried as ANSI interval types (Spark-native) — no TO_CHAR.
  */
object ExtractionProjection {

  final case class Policy(
      allowFloatingPointConversions: Boolean = false,
      sourceTimeZone: String = "UTC")

  def columnExpr(c: CanonicalColumn, policy: Policy): Column = {
    val base = col(c.name)
    c.ctype match {
      case CanonicalType.Float4 | CanonicalType.Double8
          if !policy.allowFloatingPointConversions =>
        graft.sink.StagedLoad.nanToNull(base).as(c.name)
      case CanonicalType.TimestampTz if policy.sourceTimeZone != "UTC" =>
        to_utc_timestamp(base, policy.sourceTimeZone).as(c.name)
      case _ => base.as(c.name)
    }
  }

  def apply(df: DataFrame, cols: Seq[CanonicalColumn],
            policy: Policy = Policy()): DataFrame =
    df.select(cols.map(columnExpr(_, policy)): _*)
}
