package graft.sink

import graft.types.{CanonicalColumn, CanonicalType, TypeMapper}

/** DDL-file generation: render the canonical schema as CREATE TABLE text
  * instead of executing it — the reference's `--ddl-file` path
  * (`src/goe/offload/operation/ddl_file.py`, `offload.py:66-87`), kept
  * because change-controlled environments apply DDL out-of-band.
  */
object DdlRenderer {

  sealed trait Dialect
  object Dialect {
    case object SparkSql extends Dialect
    case object BigQuery extends Dialect
  }

  private def sparkType(c: CanonicalColumn): String =
    TypeMapper.toSpark(c.ctype).sql

  private def bigqueryType(c: CanonicalColumn): String = {
    import CanonicalType._
    c.ctype match {
      case FixedString | VariableString | LargeString => "STRING"
      case Binary | LargeBinary => "BYTES"
      case Integer1 | Integer2 | Integer4 | Integer8 => "INT64"
      case Integer38 => "BIGNUMERIC(38, 0)"
      case Decimal(p, s) =>
        // NUMERIC covers (p-s) <= 29 integral digits and scale <= 9, else
        // BIGNUMERIC (reference bigquery_backend_api.py:2344-2503)
        val prec = p.getOrElse(38)
        val sc = s.getOrElse(9)
        if (prec - sc <= 29 && sc <= 9) s"NUMERIC($prec, $sc)"
        else s"BIGNUMERIC($prec, $sc)"
      case Float4 | Double8 => "FLOAT64"
      case Date => "DATE"
      case Time => "TIME"
      case Timestamp => "DATETIME"
      case TimestampTz => "TIMESTAMP"
      case IntervalDs | IntervalYm => "STRING"
      case Boolean1 => "BOOL"
    }
  }

  /** Public type-rendering seam (also the q77 contract surface). */
  def renderType(c: CanonicalColumn, dialect: Dialect): String =
    dialect match {
      case Dialect.SparkSql => sparkType(c)
      case Dialect.BigQuery => bigqueryType(c)
    }

  def createTable(
      table: String,
      cols: Seq[CanonicalColumn],
      dialect: Dialect,
      partitionBy: Seq[String] = Nil,
      clusterBy: Seq[String] = Nil): String = {
    val typeOf: CanonicalColumn => String = dialect match {
      case Dialect.SparkSql => sparkType
      case Dialect.BigQuery => bigqueryType
    }
    val colDefs = cols.map { c =>
      val nn = if (c.nullable) "" else " NOT NULL"
      s"  ${c.name} ${typeOf(c)}$nn"
    }.mkString(",\n")
    dialect match {
      case Dialect.SparkSql =>
        val part =
          if (partitionBy.isEmpty) ""
          else s"\nPARTITIONED BY (${partitionBy.mkString(", ")})"
        val clust =
          if (clusterBy.isEmpty) ""
          else s"\nCLUSTERED BY (${clusterBy.mkString(", ")}) INTO 32 BUCKETS"
        s"CREATE TABLE $table (\n$colDefs\n) USING parquet$part$clust;"
      case Dialect.BigQuery =>
        val part =
          if (partitionBy.isEmpty) ""
          else s"\nPARTITION BY ${partitionBy.head}"
        val clust =
          if (clusterBy.isEmpty) ""
          // BigQuery caps clustering at 4 columns (backend_api max,
          // operation/sort_columns.py)
          else s"\nCLUSTER BY ${clusterBy.take(4).mkString(", ")}"
        s"CREATE TABLE $table (\n$colDefs\n)$part$clust;"
    }
  }
}
