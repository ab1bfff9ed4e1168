package graft.types

import org.apache.spark.sql.types._

/** Canonical scalar type system — the engine-internal schema IR.
  *
  * Mirrors the 20-type canonical model of the reference
  * (`src/goe/offload/column_metadata.py:38-80`) re-expressed as a Scala ADT
  * that maps 1:1 onto Spark `DataType`s. The canonical layer exists so that
  * frontend (JDBC) types, staging (Avro/Parquet) types and backend types are
  * all derived from ONE declaration per column, with `safeMapping` tracking
  * whether a hop can lose information (drives `try_cast` vs `cast` at load
  * time — reference `column_metadata.py:194-205`).
  */
sealed abstract class CanonicalType(val name: String)

object CanonicalType {
  case object FixedString    extends CanonicalType("FIXED_STRING")
  case object VariableString extends CanonicalType("VARIABLE_STRING")
  case object LargeString    extends CanonicalType("LARGE_STRING")
  case object Binary         extends CanonicalType("BINARY")
  case object LargeBinary    extends CanonicalType("LARGE_BINARY")
  case object Integer1       extends CanonicalType("INTEGER_1")
  case object Integer2       extends CanonicalType("INTEGER_2")
  case object Integer4       extends CanonicalType("INTEGER_4")
  case object Integer8       extends CanonicalType("INTEGER_8")
  case object Integer38      extends CanonicalType("INTEGER_38")
  case class  Decimal(precision: Option[Int], scale: Option[Int])
      extends CanonicalType("DECIMAL")
  case object Float4         extends CanonicalType("FLOAT")
  case object Double8        extends CanonicalType("DOUBLE")
  case object Date           extends CanonicalType("DATE")
  case object Time           extends CanonicalType("TIME")
  case object Timestamp      extends CanonicalType("TIMESTAMP")
  case object TimestampTz    extends CanonicalType("TIMESTAMP_TZ")
  case object IntervalDs     extends CanonicalType("INTERVAL_DS")
  case object IntervalYm     extends CanonicalType("INTERVAL_YM")
  case object Boolean1       extends CanonicalType("BOOLEAN")

  val all: Seq[String] = Seq(
    "FIXED_STRING", "VARIABLE_STRING", "LARGE_STRING", "BINARY",
    "LARGE_BINARY", "INTEGER_1", "INTEGER_2", "INTEGER_4", "INTEGER_8",
    "INTEGER_38", "DECIMAL", "FLOAT", "DOUBLE", "DATE", "TIME", "TIMESTAMP",
    "TIMESTAMP_TZ", "INTERVAL_DS", "INTERVAL_YM", "BOOLEAN")
}

/** Character-length semantics of the source column (reference
  * `column_metadata.py:126-128`). */
sealed trait CharSemantics
object CharSemantics {
  case object Byte    extends CharSemantics
  case object Char    extends CharSemantics
  case object Unicode extends CharSemantics
}

/** One canonical column: name + canonical type + lossiness flag.
  *
  * `safeMapping = false` means some hop could not prove losslessness (e.g. a
  * NUMBER with unknown precision sampled into DECIMAL) — loads must use
  * `try_cast` + violation probes rather than plain `cast`
  * (reference `column_metadata.py:400-434`).
  */
final case class CanonicalColumn(
    name: String,
    ctype: CanonicalType,
    nullable: Boolean = true,
    safeMapping: Boolean = true,
    charSemantics: Option[CharSemantics] = None,
    partitionInfo: Option[PartitionInfo] = None) {

  def isNumberBased: Boolean = ctype match {
    case CanonicalType.Integer1 | CanonicalType.Integer2 |
         CanonicalType.Integer4 | CanonicalType.Integer8 |
         CanonicalType.Integer38 | CanonicalType.Float4 |
         CanonicalType.Double8 => true
    case _: CanonicalType.Decimal => true
    case _ => false
  }
  def isDateBased: Boolean = ctype match {
    case CanonicalType.Date | CanonicalType.Timestamp |
         CanonicalType.TimestampTz => true
    case _ => false
  }
  def isStringBased: Boolean = ctype match {
    case CanonicalType.FixedString | CanonicalType.VariableString |
         CanonicalType.LargeString => true
    case _ => false
  }
  def hasTimeElement: Boolean = ctype match {
    case CanonicalType.Timestamp | CanonicalType.TimestampTz |
         CanonicalType.Time => true
    case _ => false
  }
  def isNanCapable: Boolean =
    ctype == CanonicalType.Float4 || ctype == CanonicalType.Double8

  /** Merge rule when combining evidence about the same column: a mapping is
    * only safe if every contributing mapping was safe
    * (reference `column_metadata.py:194-205`). */
  def merge(other: CanonicalColumn): CanonicalColumn =
    copy(safeMapping = safeMapping && other.safeMapping,
         nullable = nullable || other.nullable)
}

/** Synthetic partition-column descriptor: how a backend partition key is
  * derived from a source column (reference `column_metadata.py:131-136`).
  * `granularity` is "Y"/"M"/"D" for dates, a positive number for numeric
  * ranges, or a prefix length for strings. */
final case class PartitionInfo(
    sourceColumn: String,
    granularity: String,
    digits: Int = 15,
    position: Int = 0)

object PartitionInfo {
  /** Synthetic column naming scheme `GOE_PART_{granularity}_{source}` with a
    * decoder (reference `column_metadata.py:311-386`). */
  def syntheticName(info: PartitionInfo): String =
    s"goe_part_${info.granularity.toLowerCase}_${info.sourceColumn.toLowerCase}"

  private val NamePattern = "goe_part_([a-z0-9]+)_(.+)".r
  def decodeName(n: String): Option[(String, String)] = n.toLowerCase match {
    case NamePattern(gran, src) => Some((gran, src))
    case _ => None
  }
}
