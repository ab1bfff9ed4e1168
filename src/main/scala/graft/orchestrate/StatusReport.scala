package graft.orchestrate

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.meta.{MetadataStore, OffloadMetadata}
import graft.plan.{Boundary, PartitionPlanner, SourcePartition}

/** Offload status report — inventory, retention and reclaim analysis.
  *
  * Re-expression of the reference's `offload_status_report.py` (the
  * `OFFLOADED_* / RETAINED_* / RECLAIMABLE_*` model at `:88-160`, the
  * reclaimability rules at `:720-800`, the summary/detail levels and the
  * CSV/HTML renderings at `:2786+/:3537+`) as a DataFrame + pure renderers.
  *
  * Retention analysis is METADATA-ONLY — it consumes the partition catalog
  * (the same [[graft.plan.SourcePartition]] model the planners use, fed by
  * copied stats) and never scans data, exactly like the reference reading
  * `dba_tab_partitions`. Reclaim rules ported from `:726-749`:
  *   - FULL offload, no incremental key → every source partition is
  *     reclaimable (the backend holds the whole table);
  *   - INCREMENTAL (RANGE-like) → partitions at or below the HWM are
  *     reclaimable, the rest are retained;
  *   - PREDICATE-type offloads → nothing reclaimable (no partition-level
  *     containment can be proven for predicate slices).
  */
object StatusReport {

  final case class StatusRow(
      source_table: String,
      backend_table: String,
      offload_type: String,
      incremental_key: String,
      incremental_high_value: String,
      predicate_type: String,
      backend_exists: Boolean,
      offloaded_parts: Long,
      offloaded_rows: Long,
      offloaded_bytes: Long,
      retained_parts: Long,
      retained_rows: Long,
      retained_bytes: Long,
      reclaimable_parts: Long,
      reclaimable_rows: Long,
      reclaimable_bytes: Long)

  final case class Summary(
      offloaded_tables: Long,
      offloaded_parts: Long,
      offloaded_rows: Long,
      offloaded_bytes: Long,
      retained_parts: Long,
      retained_rows: Long,
      retained_bytes: Long,
      reclaimable_parts: Long,
      reclaimable_rows: Long,
      reclaimable_bytes: Long)

  /** Normalise a rendered HWM literal and a catalog value into the same
    * comparable domain (the reference decodes both sides to python values —
    * `_decode_metadata_incremental_high_values`). */
  private def parseLiteral(s: String): Any = {
    val t = s.trim
    t.toLongOption.getOrElse(
      t.toDoubleOption.getOrElse(t): Any)
  }

  private def hvLessOrEqual(hv: Seq[Boundary.Bound],
                            hwm: Seq[String]): Boolean = {
    if (hv.length != hwm.length) return false
    val parsedHwm = hwm.map(parseLiteral)
    val parsedHv = hv.map {
      case Boundary.Value(v) => parseLiteral(String.valueOf(v))
      case Boundary.MaxValue => return false // MAXVALUE part is never below
    }
    // lexicographic hv <= hwm
    parsedHv.zip(parsedHwm).foreach { case (a, b) =>
      val c = PartitionPlanner.compareAny(a, b)
      if (c != 0) return c < 0
    }
    true
  }

  /** Per-table retention/reclaim split of a source partition catalog. */
  def reclaim(meta: OffloadMetadata, catalog: Seq[SourcePartition])
      : (Seq[SourcePartition], Seq[SourcePartition]) = { // (reclaimable, retained)
    val predicateOffload = meta.incrementalPredicateType.contains("PREDICATE")
    if (predicateOffload) (Nil, catalog)
    else if (meta.offloadType == "FULL" && meta.incrementalHighValue.isEmpty)
      (catalog, Nil)
    else if (meta.incrementalHighValue.nonEmpty)
      catalog.partition(p => hvLessOrEqual(p.highValues,
        meta.incrementalHighValue))
    else (Nil, catalog)
  }

  /** Inventory + retention report over every table in the metadata store.
    * `sourceCatalogs` supplies the per-table partition catalog (from copied
    * stats); tables without one report zero retention columns. Backend
    * rows/bytes are read from the backend parquet footprint. */
  def report(spark: SparkSession, metadataDir: String,
             sourceCatalogs: Map[String, Seq[SourcePartition]] = Map.empty)
      : DataFrame = {
    import spark.implicits._
    rows(spark, metadataDir, sourceCatalogs).toDF()
  }

  def rows(spark: SparkSession, metadataDir: String,
           sourceCatalogs: Map[String, Seq[SourcePartition]] = Map.empty)
      : Seq[StatusRow] = {
    val metas = MetadataStore.listTables(metadataDir)
      .flatMap(MetadataStore.load(metadataDir, _))
      .sortBy(_.sourceTable)
    metas.map { m =>
      val backendPath = Paths.get(m.backendTable)
      val exists = Files.exists(backendPath)
      val (rowCount, bytes, parts) =
        if (exists) {
          val df = spark.read.parquet(m.backendTable)
          val sz = Files.walk(backendPath).iterator().asScala
            .filter(Files.isRegularFile(_)).map(Files.size).sum
          val partDirs = Files.list(backendPath).iterator().asScala
            .count(p => Files.isDirectory(p) &&
              p.getFileName.toString.contains("="))
          (df.count(), sz, math.max(partDirs.toLong, 1L))
        } else (0L, 0L, 0L)
      val catalog = sourceCatalogs.getOrElse(m.sourceTable, Nil)
      val (reclaimable, retained) = reclaim(m, catalog)
      StatusRow(
        m.sourceTable, m.backendTable, m.offloadType,
        m.incrementalKey.mkString(","),
        m.incrementalHighValue.mkString(","),
        m.incrementalPredicateType.getOrElse(""),
        exists, parts, rowCount, bytes,
        retained.length, retained.map(_.rows).sum,
        retained.map(_.bytes).sum,
        reclaimable.length, reclaimable.map(_.rows).sum,
        reclaimable.map(_.bytes).sum)
    }
  }

  /** Persisted run history (the reference reports command executions from
    * its repo tables; here they come from the metadata store's command
    * audit). One row per command execution, newest first. */
  final case class RunRow(
      execution_id: String, command_type: String, command_input: String,
      status: String, start_ts: Long, end_ts: Long,
      steps: Long, failed_steps: Long, chunks: Long, rows_written: Long)

  def runHistory(metadataDir: String): Seq[RunRow] =
    graft.meta.CommandAudit.open(metadataDir).runs().map { r =>
      RunRow(r.executionId, r.commandType, r.commandInput, r.status,
        r.startTs, r.endTs.getOrElse(-1L),
        steps = r.steps.length,
        failed_steps =
          r.steps.count(_.status == graft.meta.CommandAudit.Error),
        chunks = r.chunks.length,
        rows_written = r.chunks.flatMap(_.rowCount).sum)
    }

  /** Fleet totals (the reference's SUMMARY_KEYS block). */
  def summary(rows: Seq[StatusRow]): Summary =
    Summary(
      offloaded_tables = rows.count(_.backend_exists),
      offloaded_parts = rows.map(_.offloaded_parts).sum,
      offloaded_rows = rows.map(_.offloaded_rows).sum,
      offloaded_bytes = rows.map(_.offloaded_bytes).sum,
      retained_parts = rows.map(_.retained_parts).sum,
      retained_rows = rows.map(_.retained_rows).sum,
      retained_bytes = rows.map(_.retained_bytes).sum,
      reclaimable_parts = rows.map(_.reclaimable_parts).sum,
      reclaimable_rows = rows.map(_.reclaimable_rows).sum,
      reclaimable_bytes = rows.map(_.reclaimable_bytes).sum)

  private val csvHeader = Seq(
    "source_table", "backend_table", "offload_type", "incremental_key",
    "incremental_high_value", "predicate_type", "backend_exists",
    "offloaded_parts", "offloaded_rows", "offloaded_bytes",
    "retained_parts", "retained_rows", "retained_bytes",
    "reclaimable_parts", "reclaimable_rows", "reclaimable_bytes")

  private def csvCell(s: String): String =
    if (s.exists(c => c == ',' || c == '"' || c == '\n'))
      "\"" + s.replace("\"", "\"\"") + "\""
    else s

  /** CSV rendering (`_gen_csv_report`). */
  def toCsv(rows: Seq[StatusRow]): String = {
    val lines = rows.map { r =>
      Seq(r.source_table, r.backend_table, r.offload_type, r.incremental_key,
        r.incremental_high_value, r.predicate_type,
        r.backend_exists.toString,
        r.offloaded_parts, r.offloaded_rows, r.offloaded_bytes,
        r.retained_parts, r.retained_rows, r.retained_bytes,
        r.reclaimable_parts, r.reclaimable_rows, r.reclaimable_bytes)
        .map(v => csvCell(String.valueOf(v))).mkString(",")
    }
    (csvHeader.mkString(",") +: lines).mkString("\n") + "\n"
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Self-contained HTML rendering mirroring the reference's status-report
    * template (`offload_status_report.py` `_gen_html_report` +
    * `templates/offload_status_report/`): one document, inline style, no
    * external assets — a summary block plus the per-table detail grid with
    * exactly [[toCsv]]'s columns and rows (parity is spec-asserted, and
    * the output is well-formed XML so any DOM consumer can ingest it). */
  def toHtml(rows: Seq[StatusRow], title: String = "Offload Status Report")
      : String = {
    val s = summary(rows)
    val summaryHtml =
      s"""<table class="summary">
         |<tr><th>Offloaded tables</th><td>${s.offloaded_tables}</td></tr>
         |<tr><th>Offloaded rows</th><td>${s.offloaded_rows}</td></tr>
         |<tr><th>Offloaded bytes</th><td>${s.offloaded_bytes}</td></tr>
         |<tr><th>Retained rows</th><td>${s.retained_rows}</td></tr>
         |<tr><th>Reclaimable rows</th><td>${s.reclaimable_rows}</td></tr>
         |<tr><th>Reclaimable bytes</th><td>${s.reclaimable_bytes}</td></tr>
         |</table>""".stripMargin
    val header = csvHeader.map(h => s"<th>${esc(h)}</th>").mkString
    val detail = rows.map { r =>
      val cells = Seq(r.source_table, r.backend_table, r.offload_type,
        r.incremental_key, r.incremental_high_value, r.predicate_type,
        r.backend_exists.toString,
        r.offloaded_parts.toString, r.offloaded_rows.toString,
        r.offloaded_bytes.toString,
        r.retained_parts.toString, r.retained_rows.toString,
        r.retained_bytes.toString,
        r.reclaimable_parts.toString, r.reclaimable_rows.toString,
        r.reclaimable_bytes.toString)
      cells.map(c => s"<td>${esc(c)}</td>").mkString("<tr>", "", "</tr>")
    }.mkString("\n")
    val style =
      """body { font-family: sans-serif; margin: 2em; }
        |table { border-collapse: collapse; margin-bottom: 1.5em; }
        |th, td { border: 1px solid #999; padding: 4px 8px; text-align: left; }
        |table.summary th { background: #eee; }
        |table.detail tr:nth-child(odd) td { background: #f6f6f6; }""".stripMargin
    s"""<html><head><title>${esc(title)}</title>
       |<style>$style</style></head><body>
       |<h1>${esc(title)}</h1>
       |$summaryHtml
       |<table class="detail"><tr>$header</tr>
       |$detail
       |</table></body></html>""".stripMargin
  }
}
