package graft.orchestrate

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession

import graft.meta.{MetadataStore, StatsStore}

/** Orchestration REST listener — the reference's `src/goe/listener/`
  * (FastAPI + token auth) re-expressed on the JDK's built-in HTTP server
  * (zero new dependencies; the engine is a library, not a web stack).
  *
  * Endpoint surface mirrors the reference's routers
  * (`api/routes/system.py`, `api/routes/orchestration.py`):
  *   - `GET /api/system/status/` — liveness + inventory counts
  *   - `GET /api/system/schemas/{table}/columns/` — copied column stats
  *   - `GET /api/system/schemas/{table}/partitions/` — copied partition stats
  *   - `GET /api/system/views/{table}/` — hybrid/conversion view info:
  *     view names plus the offloaded/residual boundary clauses derived from
  *     the incremental HWM (the reference's hybrid-view service,
  *     `conductor/hybrid_view_service.py:1-334`)
  *   - `GET /api/orchestration/offloads/` — offload metadata inventory
  *   - `GET /api/orchestration/offloads/{table}/` — one table's metadata
  *   - `POST /api/orchestration/offload/` — run an offload (JSON body:
  *     `source`, `final`, `meta`, optional `table`/`staging`/`predicate`/
  *     `incremental_key`)
  * Auth mirrors `Security(valid_api_token)`: when a token is configured,
  * every request must carry it in `x-api-token`.
  *
  * The server executes offloads on the caller's thread pool while Spark
  * remains the single driver-side session — the listener is a control
  * plane, not a data plane.
  */
object Listener {

  final case class Server(http: HttpServer) {
    def port: Int = http.getAddress.getPort
    def stop(): Unit = http.stop(0)
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
  private def q(s: String): String = "\"" + esc(s) + "\""

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  // minimal flat-JSON field reader (same contract as MetadataStore's)
  private def strField(js: String, key: String): Option[String] =
    ("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      .findFirstMatchIn(js).map(_.group(1)
        .replace("\\\"", "\"").replace("\\\\", "\\"))

  private def listTables(metadataDir: String): Seq[String] = {
    val dir = java.nio.file.Paths.get(metadataDir)
    if (!java.nio.file.Files.isDirectory(dir)) Nil
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.endsWith(".json") && !n.endsWith(".stats.json"))
        .map(_.stripSuffix(".json")).toSeq.sorted
    }
  }

  def start(spark: SparkSession, metadataDir: String, port: Int = 0,
            token: Option[String] = None): Server = {
    val http = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

    def authed(ex: HttpExchange): Boolean =
      token.forall(t =>
        Option(ex.getRequestHeaders.getFirst("x-api-token")).contains(t))

    def handle(ex: HttpExchange): Unit = try {
      if (!authed(ex)) { respond(ex, 401, """{"detail": "unauthorized"}"""); return }
      val path = ex.getRequestURI.getPath.stripSuffix("/")
      val method = ex.getRequestMethod
      (method, path.split('/').toList.filter(_.nonEmpty)) match {
        case ("GET", List("api", "system", "status")) =>
          val tables = listTables(metadataDir)
          respond(ex, 200,
            s"""{"status": "ok", "offloaded_tables": ${tables.length}}""")

        case ("GET", List("api", "system", "schemas", table, "columns")) =>
          StatsStore.load(metadataDir, table) match {
            case Some(rec) =>
              val cols = rec.columns.map(c =>
                s"""{"name": ${q(c.name)}, "ndv": ${c.ndv}, """ +
                s""""num_nulls": ${c.numNulls}, "low_value": ${q(c.lowValue)}, """ +
                s""""high_value": ${q(c.highValue)}}""").mkString("[", ", ", "]")
              respond(ex, 200, cols)
            case None => respond(ex, 404, """{"detail": "no stats"}""")
          }

        case ("GET", List("api", "system", "schemas", table, "partitions")) =>
          StatsStore.load(metadataDir, table) match {
            case Some(rec) =>
              val parts = rec.partitions.map(p =>
                s"""{"name": ${q(p.name)}, "high_value": ${q(p.highValue)}, """ +
                s""""rows": ${p.rows}, "bytes": ${p.bytes}}""").mkString("[", ", ", "]")
              respond(ex, 200, parts)
            case None => respond(ex, 404, """{"detail": "no stats"}""")
          }

        case ("GET", List("api", "system", "views", table)) =>
          MetadataStore.load(metadataDir, table) match {
            case Some(m) =>
              // Hybrid-view semantics: residual rows live where the key is
              // ABOVE the HWM; offloaded rows are the complement. NULL
              // keys make BOTH k>hwm and NOT(k>hwm) non-true, so they are
              // explicitly assigned to the residual side — the two clauses
              // must partition the table (offloaded UNION residual =
              // source). A predicate-based offload's clause is its stored
              // predicate (residual keeps predicate-NULL rows the same
              // way); a FULL offload has no residual at all.
              val (offloaded, residual) =
                if (m.incrementalKey.nonEmpty &&
                    m.incrementalHighValue.nonEmpty) {
                  val gt = graft.plan.Boundary.Sql.greaterThanLiterals(
                    m.incrementalKey, m.incrementalHighValue)
                  val k0 = m.incrementalKey.head
                  (s"NOT ($gt) AND $k0 IS NOT NULL",
                   s"($gt) OR $k0 IS NULL")
                } else if (m.incrementalPredicateValue.nonEmpty) {
                  val p = m.incrementalPredicateValue
                    .map(v => s"(${graft.predicate.OffloadPredicate.toSql(
                      graft.predicate.OffloadPredicate.parseUnsafe(v))})")
                    .mkString(" OR ")
                  (p, s"NOT COALESCE($p, FALSE)")
                } else ("TRUE", "FALSE")
              respond(ex, 200,
                s"""{"source_table": ${q(m.sourceTable)}, """ +
                s""""backend_table": ${q(m.backendTable)}, """ +
                s""""hybrid_view": ${q(m.sourceTable + "_hv")}, """ +
                s""""conversion_view": ${q(m.sourceTable + "_conv")}, """ +
                s""""offload_type": ${q(m.offloadType)}, """ +
                s""""incremental_key": ${m.incrementalKey.map(q)
                  .mkString("[", ", ", "]")}, """ +
                s""""offloaded_clause": ${q(offloaded)}, """ +
                s""""residual_clause": ${q(residual)}}""")
            case None => respond(ex, 404, """{"detail": "not offloaded"}""")
          }

        case ("GET", List("api", "orchestration", "offloads")) =>
          val all = listTables(metadataDir)
            .flatMap(t => MetadataStore.load(metadataDir, t))
            .map(MetadataStore.toJson).mkString("[", ", ", "]")
          respond(ex, 200, all)

        case ("GET", List("api", "orchestration", "offloads", table)) =>
          MetadataStore.load(metadataDir, table) match {
            case Some(m) => respond(ex, 200, MetadataStore.toJson(m))
            case None => respond(ex, 404, """{"detail": "not offloaded"}""")
          }

        case ("POST", List("api", "orchestration", "offload")) =>
          val body = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          (strField(body, "source"), strField(body, "final")) match {
            case (Some(source), Some(finalPath)) =>
              val cfg = OffloadRunner.OffloadConfig(
                sourceTable = strField(body, "table").getOrElse(
                  source.split('/').last.stripSuffix(".parquet")),
                sourcePath = source,
                stagingPath = strField(body, "staging")
                  .getOrElse(finalPath + "_staging"),
                finalPath = finalPath,
                metadataDir = strField(body, "meta").getOrElse(metadataDir),
                predicateDsl = strField(body, "predicate"),
                incrementalKey = strField(body, "incremental_key")
                  .map(_.split(',').toSeq).getOrElse(Nil))
              val steps = OffloadRunner.offload(spark, cfg)
              val js = steps.map(s =>
                s"""{"step": ${q(s.name)}, "ok": ${s.ok}, """ +
                s""""detail": ${q(s.detail)}, "millis": ${s.millis}}""")
                .mkString("[", ", ", "]")
              respond(ex, if (steps.forall(_.ok)) 200 else 500, js)
            case _ =>
              respond(ex, 422, """{"detail": "source and final required"}""")
          }

        case _ => respond(ex, 404, """{"detail": "not found"}""")
      }
    } catch {
      case e: Exception =>
        respond(ex, 500, s"""{"detail": ${q(String.valueOf(e.getMessage))}}""")
    } finally ex.close()

    http.createContext("/", handle(_))
    http.start()
    Server(http)
  }
}
