package graft.sink

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row}

import graft.types.PartitionInfo

/** BigQuery final-table sink — the writer path behind BASELINE's north-star
  * backend (reference `bigquery_backend_table.py`), assembled as
  * spark-bigquery-connector options (the connector's public option surface:
  * `table`/`project`/`dataset`, `writeMethod` direct|indirect,
  * `temporaryGcsBucket`, `partitionField`/`partitionType`,
  * `clusteredFields`, `createDisposition`/`writeDisposition`).
  *
  * The sandbox has no connector jar and no egress, so EXECUTION is gated
  * behind `spark.graft.bigquery.execute=true`; the option assembly — the
  * part the engine owns — is a total, testable function. Partitioning maps
  * the synthetic-partition granularity (Y/M/D) to BigQuery's native
  * YEAR/MONTH/DAY time partitioning; clustering reuses the sort-column
  * model with the same 4-column cap as [[DdlRenderer]].
  */
object BigQuerySink {

  /** Conf flag that allows `.save()` to actually run (default: assemble
    * only). */
  val ExecuteFlag = "spark.graft.bigquery.execute"

  final case class Config(
      dataset: String,
      table: String,
      project: Option[String] = None,
      writeMethod: String = "indirect", // "direct" = Storage Write API
      temporaryGcsBucket: Option[String] = None, // required for indirect
      partitionInfo: Option[PartitionInfo] = None,
      clusterBy: Seq[String] = Nil,
      createDisposition: String = "CREATE_IF_NEEDED") {
    require(writeMethod == "direct" || writeMethod == "indirect",
      s"writeMethod must be direct|indirect: $writeMethod")
    require(writeMethod == "direct" || temporaryGcsBucket.nonEmpty,
      "indirect writeMethod stages via GCS: temporaryGcsBucket is required")
  }

  /** Y/M/D synthetic granularity → BigQuery time-partitioning type. Numeric
    * and string granularities have no native BQ analogue — those stay
    * synthetic columns (integer-range partitioning is a DDL-time concern,
    * `DdlRenderer`). */
  def partitionType(granularity: String): Option[String] =
    granularity.toUpperCase match {
      case "Y" => Some("YEAR")
      case "M" => Some("MONTH")
      case "D" => Some("DAY")
      case _ => None
    }

  /** The assembled connector options — pure and inspectable. */
  def writerOptions(c: Config): Map[String, String] = {
    val base = Map(
      "table" -> s"${c.dataset}.${c.table}",
      "writeMethod" -> c.writeMethod,
      "createDisposition" -> c.createDisposition)
    val proj = c.project.map("project" -> _)
    val bucket = c.temporaryGcsBucket.map("temporaryGcsBucket" -> _)
    val part = c.partitionInfo.flatMap { pi =>
      partitionType(pi.granularity).map { pt =>
        Map("partitionField" -> pi.sourceColumn, "partitionType" -> pt)
      }
    }.getOrElse(Map.empty)
    val clust =
      if (c.clusterBy.isEmpty) Map.empty[String, String]
      else Map("clusteredFields" -> c.clusterBy.take(4).mkString(","))
    base ++ proj ++ bucket ++ part ++ clust
  }

  /** Configure (but do not run) the writer: `format("bigquery")` + the
    * assembled options. Callers `.save()` only where the connector exists;
    * [[load]] enforces the gate. */
  def writer(df: DataFrame, c: Config, mode: String = "overwrite")
      : DataFrameWriter[Row] =
    df.write.format("bigquery").mode(mode).options(writerOptions(c))

  /** Gated load: assembles always, executes only when
    * `spark.graft.bigquery.execute=true`. Returns the assembled options so
    * orchestration can audit what would run. */
  def load(df: DataFrame, c: Config, mode: String = "overwrite")
      : Map[String, String] = {
    val opts = writerOptions(c)
    val execute = df.sparkSession.conf
      .getOption(ExecuteFlag).contains("true")
    if (execute) writer(df, c, mode).save()
    opts
  }
}
