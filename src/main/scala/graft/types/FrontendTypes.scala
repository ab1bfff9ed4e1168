package graft.types

/** Frontend (source-RDBMS) type-name → canonical mappings for the partial
  * frontends the reference ships beyond Oracle: Teradata
  * (`teradata/teradata_offload_source_table.py:960-1080`,
  * `teradata_column.py:30-66`) and MSSQL/Synapse
  * (`microsoft/mssql_offload_source_table.py` `to_canonical_column`,
  * `mssql_column.py:28-54`). Together with `TypeOverrides.oracleNumber`
  * (the Oracle NUMBER path) these complete the frontend hop of the
  * three-hop type pipeline for every source family the reference names.
  *
  * Input is the catalog's declared SQL type name (case-insensitive) plus
  * precision/scale where the type carries them; output is the canonical
  * column the rest of the engine consumes (`TypeMapper.toSpark` takes it
  * to a Spark type). `safeMapping=false` marks hops that could lose
  * information — the load then routes through `try_cast` + violation
  * probes (`StagedLoad`).
  */
object FrontendTypes {
  import CanonicalType._

  final case class FrontendCol(
      name: String,
      dataType: String,
      precision: Option[Int] = None,
      scale: Option[Int] = None,
      nullable: Boolean = true)

  /** Scale-0 decimals narrow to the smallest proven integer; fractional or
    * unknown stay DECIMAL (both-unknown additionally unsafe — drives
    * sampling, like Oracle's bare NUMBER). */
  private def numberBased(c: FrontendCol,
                          normalize: Boolean): CanonicalColumn = {
    val (p, s) =
      if (!normalize) (c.precision, c.scale)
      else (c.precision, c.scale) match {
        case (Some(p0), Some(s0)) if s0 > p0 => (Some(s0), Some(s0))
        case (Some(p0), Some(s0)) if s0 < 0  => (Some(p0), Some(0))
        case other => other
      }
    TypeOverrides.decimalToIntegral(p, s) match {
      case Some(t) => CanonicalColumn(c.name, t, c.nullable)
      case None => CanonicalColumn(c.name, Decimal(p, s), c.nullable,
        safeMapping = !(c.precision.isEmpty && c.scale.isEmpty))
    }
  }

  /** Teradata declared type → canonical. Accepts the SQL names
    * (`TERADATA_TYPE_TO_SQL_NAME_MAP`); FLOAT/REAL/DOUBLE PRECISION are one
    * 8-byte type in Teradata, and every day/hour/minute/second interval
    * variant collapses to INTERVAL_DS like the reference's DY..SC codes. */
  def teradata(c: FrontendCol): CanonicalColumn = {
    val t = c.dataType.trim.toUpperCase
    t match {
      case "BIGINT" => CanonicalColumn(c.name, Integer8, c.nullable)
      case "BLOB" => CanonicalColumn(c.name, LargeBinary, c.nullable)
      case "BYTE" | "VARBYTE" => CanonicalColumn(c.name, Binary, c.nullable)
      case "BYTEINT" => CanonicalColumn(c.name, Integer1, c.nullable)
      case "CHAR" | "CHARACTER" =>
        CanonicalColumn(c.name, FixedString, c.nullable)
      case "CLOB" => CanonicalColumn(c.name, LargeString, c.nullable)
      case "DATE" => CanonicalColumn(c.name, Date, c.nullable)
      case "DECIMAL" | "NUMERIC" | "NUMBER" =>
        numberBased(c, normalize = false)
      case "DOUBLE PRECISION" | "DOUBLE" | "FLOAT" | "REAL" =>
        CanonicalColumn(c.name, Double8, c.nullable)
      case "INTEGER" | "INT" => CanonicalColumn(c.name, Integer4, c.nullable)
      case "SMALLINT" => CanonicalColumn(c.name, Integer2, c.nullable)
      case "TIME" => CanonicalColumn(c.name, Time, c.nullable)
      case "TIMESTAMP" => CanonicalColumn(c.name, Timestamp, c.nullable)
      case "TIMESTAMP WITH TIME ZONE" =>
        CanonicalColumn(c.name, TimestampTz, c.nullable)
      case "VARCHAR" | "CHAR VARYING" | "LONG VARCHAR" =>
        CanonicalColumn(c.name, VariableString, c.nullable)
      case iv if iv.startsWith("INTERVAL YEAR") ||
                 iv.startsWith("INTERVAL MONTH") =>
        CanonicalColumn(c.name, IntervalYm, c.nullable)
      case iv if iv.startsWith("INTERVAL DAY") ||
                 iv.startsWith("INTERVAL HOUR") ||
                 iv.startsWith("INTERVAL MINUTE") ||
                 iv.startsWith("INTERVAL SECOND") =>
        CanonicalColumn(c.name, IntervalDs, c.nullable)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported Teradata type for ${c.name}: $other")
    }
  }

  /** MSSQL/Synapse declared type → canonical. `n*` character types carry
    * Unicode semantics (they render as `N'...'` literals downstream);
    * money/smallmoney ride the decimal path; MSSQL `float` is 8-byte and
    * `real` 4-byte — the opposite naming of Teradata. */
  def mssql(c: FrontendCol): CanonicalColumn = {
    val t = c.dataType.trim.toLowerCase
    def uni(cc: CanonicalColumn) =
      cc.copy(charSemantics = Some(CharSemantics.Unicode))
    t match {
      case "bit" => CanonicalColumn(c.name, Boolean1, c.nullable)
      case "char" => CanonicalColumn(c.name, FixedString, c.nullable)
      case "nchar" => uni(CanonicalColumn(c.name, FixedString, c.nullable))
      case "text" => CanonicalColumn(c.name, LargeString, c.nullable)
      case "ntext" => uni(CanonicalColumn(c.name, LargeString, c.nullable))
      case "varchar" | "uniqueidentifier" =>
        CanonicalColumn(c.name, VariableString, c.nullable)
      case "nvarchar" =>
        uni(CanonicalColumn(c.name, VariableString, c.nullable))
      case "binary" | "varbinary" | "image" =>
        CanonicalColumn(c.name, Binary, c.nullable)
      case "tinyint" | "smallint" =>
        CanonicalColumn(c.name, Integer2, c.nullable)
      case "int" => CanonicalColumn(c.name, Integer4, c.nullable)
      case "bigint" => CanonicalColumn(c.name, Integer8, c.nullable)
      case "float" => CanonicalColumn(c.name, Double8, c.nullable)
      case "real" => CanonicalColumn(c.name, Float4, c.nullable)
      case "decimal" | "numeric" | "money" | "smallmoney" =>
        numberBased(c, normalize = true)
      case "date" => CanonicalColumn(c.name, Date, c.nullable)
      case "time" => CanonicalColumn(c.name, Time, c.nullable)
      case "smalldatetime" | "datetime" | "datetime2" =>
        CanonicalColumn(c.name, Timestamp, c.nullable)
      case "datetimeoffset" => CanonicalColumn(c.name, TimestampTz, c.nullable)
      case other =>
        throw new IllegalArgumentException(
          s"unsupported MSSQL type for ${c.name}: $other")
    }
  }
}
