package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Offload orchestration metadata — the persisted per-table state machine.
  *
  * Mirrors `OrchestrationMetadata`
  * (`src/goe/persistence/orchestration_metadata.py:56-113`): backend
  * identity, offload type, incremental key + high-water-mark, predicate
  * state, bucket/sort columns, snapshot id. The reference persists to Oracle
  * repo tables; here it is a JSON document per table on the metadata path —
  * swap-in point for a JDBC/Delta-backed store, same interface. Writes are
  * atomic (temp file + move) because the metadata IS the incremental
  * correctness contract: a torn HWM would re- or under-offload a slice.
  */
final case class OffloadMetadata(
    sourceTable: String,
    backendTable: String,
    offloadType: String,                  // FULL | INCREMENTAL
    incrementalKey: Seq[String] = Nil,
    incrementalHighValue: Seq[String] = Nil, // rendered literals, in key order
    incrementalPredicateType: Option[String] = None,
    incrementalPredicateValue: Seq[String] = Nil,
    bucketColumns: Seq[String] = Nil,
    sortColumns: Seq[String] = Nil,
    snapshotId: Option[Long] = None,
    // In-flight chunk marker: written BEFORE a chunk's final-table append,
    // cleared by the same save that commits its HWM. A retry that finds a
    // marker reconciles against the final table instead of re-appending —
    // closes the append-committed-but-HWM-write-died duplication window.
    pendingChunkKeys: Seq[String] = Nil,
    pendingChunkHwm: Seq[String] = Nil,
    // Session timezone the table was WRITTEN under. Synthetic date keys on
    // instant-typed columns are rendered in the writer's session TZ, so a
    // reader under a different TZ would mis-derive injected partition-key
    // literals (see SyntheticPartitionPruning's timezone contract) — the
    // guard in graft.plans.TimeZoneGuard enforces the match.
    writerTimeZone: Option[String] = None)

object MetadataStore {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
  private def arr(xs: Seq[String]): String =
    xs.map(x => "\"" + esc(x) + "\"").mkString("[", ",", "]")

  // Array-of-strings codec shared with the JDBC backend (multi-column
  // incremental keys / HWM tuples ride one repo column, same shape as
  // the reference's delimited offload_key / offload_high_value).
  private[meta] def renderArr(xs: Seq[String]): String = arr(xs)
  private[meta] def parseArr(s: String): Seq[String] =
    arrField("{\"a\": " + s + "}", "a")

  def toJson(m: OffloadMetadata): String = {
    val fields = Seq(
      "source_table" -> ("\"" + esc(m.sourceTable) + "\""),
      "backend_table" -> ("\"" + esc(m.backendTable) + "\""),
      "offload_type" -> ("\"" + esc(m.offloadType) + "\""),
      "incremental_key" -> arr(m.incrementalKey),
      "incremental_high_value" -> arr(m.incrementalHighValue),
      "incremental_predicate_type" ->
        m.incrementalPredicateType.map(v => "\"" + esc(v) + "\"").getOrElse("null"),
      "incremental_predicate_value" -> arr(m.incrementalPredicateValue),
      "bucket_columns" -> arr(m.bucketColumns),
      "sort_columns" -> arr(m.sortColumns),
      "snapshot_id" -> m.snapshotId.map(_.toString).getOrElse("null"),
      "pending_chunk_keys" -> arr(m.pendingChunkKeys),
      "pending_chunk_hwm" -> arr(m.pendingChunkHwm),
      "writer_time_zone" ->
        m.writerTimeZone.map(v => "\"" + esc(v) + "\"").getOrElse("null"))
    fields.map { case (k, v) => "\"" + k + "\": " + v }
      .mkString("{", ", ", "}")
  }

  // Minimal JSON reader for the fixed schema above (no external deps).
  private def strField(js: String, key: String): Option[String] = {
    val m = ("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    m.findFirstMatchIn(js).map(g => unescape(g.group(1)))
  }
  private def arrField(js: String, key: String): Seq[String] = {
    val m = ("\"" + key + "\"\\s*:\\s*\\[(.*?)\\]").r
    m.findFirstMatchIn(js).map { g =>
      val body = g.group(1).trim
      if (body.isEmpty) Nil
      else "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(body)
        .map(x => unescape(x.group(1))).toSeq
    }.getOrElse(Nil)
  }
  private def longField(js: String, key: String): Option[Long] = {
    val m = ("\"" + key + "\"\\s*:\\s*(\\d+)").r
    m.findFirstMatchIn(js).map(_.group(1).toLong)
  }
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s(i) == '\\' && i + 1 < s.length) {
        s(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'u' =>
            sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
            i += 6
          case c => sb += c; i += 2
        }
      } else { sb += s(i); i += 1 }
    }
    sb.toString
  }

  def fromJson(js: String): OffloadMetadata =
    OffloadMetadata(
      sourceTable = strField(js, "source_table").getOrElse(""),
      backendTable = strField(js, "backend_table").getOrElse(""),
      offloadType = strField(js, "offload_type").getOrElse("FULL"),
      incrementalKey = arrField(js, "incremental_key"),
      incrementalHighValue = arrField(js, "incremental_high_value"),
      incrementalPredicateType = strField(js, "incremental_predicate_type"),
      incrementalPredicateValue = arrField(js, "incremental_predicate_value"),
      bucketColumns = arrField(js, "bucket_columns"),
      sortColumns = arrField(js, "sort_columns"),
      snapshotId = longField(js, "snapshot_id"),
      pendingChunkKeys = arrField(js, "pending_chunk_keys"),
      pendingChunkHwm = arrField(js, "pending_chunk_hwm"),
      writerTimeZone = strField(js, "writer_time_zone"))

  private def fileFor(dir: String, table: String) =
    Paths.get(dir, table.replaceAll("[^A-Za-z0-9_.]", "_") + ".json")

  /** Persist one table's offload metadata. `dir` selects the backend:
    * a filesystem path → one atomically-renamed JSON document per table;
    * a `jdbc:` URL → the transactional repository ([[JdbcMetaRepo]],
    * the reference's OFFLOAD_METADATA table) where the HWM commit is a
    * single-row transaction shared safely by multiple driver processes. */
  def save(dir: String, m: OffloadMetadata): Unit =
    if (JdbcMetaRepo.isJdbc(dir)) JdbcMetaRepo.forUrl(dir).saveMetadata(m)
    else {
      Files.createDirectories(Paths.get(dir))
      val target = fileFor(dir, m.sourceTable)
      val tmp = Paths.get(target.toString + ".tmp")
      Files.write(tmp, toJson(m).getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }

  def load(dir: String, table: String): Option[OffloadMetadata] =
    if (JdbcMetaRepo.isJdbc(dir)) JdbcMetaRepo.forUrl(dir).loadMetadata(table)
    else {
      val p = fileFor(dir, table)
      if (Files.exists(p))
        Some(fromJson(
          new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
      else None
    }

  /** Every table with persisted offload metadata, sorted — the listener
    * and status-report inventory, backend-dispatched like save/load
    * (a repo query on `jdbc:`, a directory listing otherwise). */
  def listTables(dir: String): Seq[String] =
    if (JdbcMetaRepo.isJdbc(dir)) JdbcMetaRepo.forUrl(dir).listTables()
    else {
      val d = Paths.get(dir)
      if (!Files.isDirectory(d)) Nil
      else {
        val s = Files.list(d)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .map(_.getFileName.toString)
            .filter(n => n.endsWith(".json") && !n.endsWith(".stats.json"))
            .map(_.stripSuffix(".json")).toSeq.sorted
        } finally s.close()
      }
    }
}
