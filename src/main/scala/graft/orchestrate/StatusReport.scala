package graft.orchestrate

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.meta.MetadataStore

/** Offload status report — inventory of offloaded tables with their
  * incremental state (the reference's `offload_status_report.py:175+`
  * HTML/csv report reduced to a DataFrame: render however you like). */
object StatusReport {

  final case class StatusRow(
      source_table: String,
      backend_table: String,
      offload_type: String,
      incremental_key: String,
      incremental_high_value: String,
      predicate_type: String,
      backend_rows: Long,
      backend_bytes: Long)

  def report(spark: SparkSession, metadataDir: String): DataFrame = {
    import spark.implicits._
    val dir = Paths.get(metadataDir)
    val metas =
      if (!Files.isDirectory(dir)) Nil
      else Files.list(dir).iterator().asScala
        .filter(_.toString.endsWith(".json"))
        .flatMap { p =>
          val name = p.getFileName.toString.stripSuffix(".json")
          MetadataStore.load(metadataDir, name)
        }.toSeq
    val rows = metas.map { m =>
      val (rowCount, bytes) =
        if (Files.exists(Paths.get(m.backendTable))) {
          val df = spark.read.parquet(m.backendTable)
          val sz = Files.walk(Paths.get(m.backendTable)).iterator().asScala
            .filter(Files.isRegularFile(_)).map(Files.size).sum
          (df.count(), sz)
        } else (0L, 0L)
      StatusRow(m.sourceTable, m.backendTable, m.offloadType,
        m.incrementalKey.mkString(","), m.incrementalHighValue.mkString(","),
        m.incrementalPredicateType.getOrElse(""), rowCount, bytes)
    }
    rows.toDF()
  }
}
