package graft.source

/** Oracle extraction-session shaping presets.
  *
  * The reference initialises every transport cursor's RDBMS session with a
  * fixed preset before reading: `DBMS_APPLICATION_INFO.SET_MODULE` tagging,
  * deterministic NLS formats (so staged strings parse identically whatever
  * the server defaults are), UTC time zone, serial direct reads, and — on
  * smart-scan-unsafe server versions — cell offload disabled
  * (`src/goe/offload/oracle/oracle_offload_transport_rdbms_api.py:168-200,
  * 445-535`). It also renders the same parameters as an `OPT_PARAM` hint
  * with `NO_PARALLEL` (parallelism belongs to the transport's splits, so
  * source queries must stay serial).
  *
  * Spark-native restatement: everything funnels into the JDBC reader's
  * `sessionInitStatement` option — Spark executes it once per task
  * connection, i.e. exactly once per split cursor, which is the reference's
  * per-session contract — plus `fetchsize`/`customSchema` as typed knobs.
  * Rendering is pure (no Oracle needed); `JdbcSplitLiveSpec` proves the
  * per-cursor execution mechanics against in-process Derby.
  */
object OracleSession {

  /** `FRONTEND_TRACE_ID` (`src/goe/offload/frontend_api.py:63`). */
  val TraceId = "GOE"

  final case class Preset(
      module: String = TraceId,
      action: String = "OFFLOAD",
      /** Custom session parameters (the reference's
        * `offload_transport_rdbms_session_parameters` JSON knob). */
      custom: Map[String, String] = Map.empty,
      /** Max timestamp fractional-second scale of the columns being moved;
        * None renders `FF` with no digit (server default). */
      tsScale: Option[Int] = None,
      /** Server version needs `CELL_OFFLOAD_PROCESSING=FALSE` (GOE-1375). */
      smartScanUnsafe: Boolean = false,
      /** JDBC cursor fetch size (rows per round trip). The reference tunes
        * the equivalent per transport; 5000 mirrors its Spark default. */
      fetchSize: Int = 5000,
      /** Spark `customSchema` override (e.g. force NUMBER(38) → DECIMAL). */
      customSchema: Option[String] = None) {
    require(tsScale.forall(s => s >= 0 && s <= 9),
      s"timestamp scale must be 0..9, got $tsScale")
  }

  private def ffScale(tsScale: Option[Int]): String =
    tsScale.map(_.toString).getOrElse("")

  /** The fixed parameter set every transport session gets — matches
    * Sqoop/OraOop so staged strings stay format-stable
    * (`oracle_offload_transport_rdbms_api.py:180-191`). Ordered map:
    * statements render sorted by key like the reference. */
  def fixedSqoopParameters(tsScale: Option[Int]): Map[String, String] = {
    val ff = ffScale(tsScale)
    Map(
      "TRACEFILE_IDENTIFIER" -> s"'$TraceId'",
      "TIME_ZONE" -> "'UTC'",
      "NLS_TIMESTAMP_TZ_FORMAT" -> s"'YYYY-MM-DD HH24:MI:SS.FF$ff TZH:TZM'",
      "NLS_TIMESTAMP_FORMAT" -> s"'YYYY-MM-DD HH24:MI:SS.FF$ff'",
      "NLS_DATE_FORMAT" -> "'YYYY-MM-DD HH24:MI:SS'",
      "\"_SERIAL_DIRECT_READ\"" -> "TRUE")
  }

  /** GOE-1375: disable smart scan on versions where it corrupts reads. */
  def fixedGoeParameters(smartScanUnsafe: Boolean): Map[String, String] =
    if (smartScanUnsafe) Map("CELL_OFFLOAD_PROCESSING" -> "FALSE") else Map.empty

  /** `ALTER SESSION SET k=v` per parameter, sorted by key
    * (`oracle_offload_transport_rdbms_api.py:201-227`). */
  def alterSessionStatements(params: Map[String, String]): Seq[String] =
    params.toSeq.sortBy(_._1).map { case (k, v) => s"ALTER SESSION SET $k=$v" }

  /** The full ordered command list: module/action tagging first, then fixed
    * Sqoop, fixed GOE, custom parameters
    * (`oracle_offload_transport_rdbms_api.py:445-496`). */
  def setupCommands(p: Preset): Seq[String] =
    s"BEGIN DBMS_APPLICATION_INFO.SET_MODULE('${p.module}','${p.action}'); END;" +:
      (alterSessionStatements(fixedSqoopParameters(p.tsScale)) ++
        alterSessionStatements(fixedGoeParameters(p.smartScanUnsafe)) ++
        alterSessionStatements(p.custom))

  /** One anonymous PL/SQL block wrapping every setup command — the shape
    * Spark's `sessionInitStatement` needs (a single statement per cursor).
    * ALTER SESSION is DDL inside PL/SQL, hence EXECUTE IMMEDIATE with the
    * reference's q-quote (`oracle_offload_transport_rdbms_api.py:214-217`). */
  def sessionInitStatement(p: Preset): String = {
    val body = setupCommands(p).map {
      case s if s.startsWith("BEGIN ") => // module tag is already PL/SQL
        s.stripPrefix("BEGIN ").stripSuffix(" END;")
      case alter => s"EXECUTE IMMEDIATE q'!$alter!';"
    }
    s"BEGIN ${body.mkString(" ")} END;"
  }

  /** `/*+ NO_PARALLEL OPT_PARAM(...) */` mirror of the session parameters
    * for statements that cannot ALTER SESSION
    * (`oracle_offload_transport_rdbms_api.py:498-535`): NLS_* and the other
    * fixed Sqoop keys are session-only (not optimizer parameters), with the
    * reference's documented exception that the quoted
    * `"_SERIAL_DIRECT_READ"` key survives its own key-set filter. */
  def setupHint(p: Preset): String = {
    val fixedKeys = fixedSqoopParameters(None).keySet
    def enquote(x: String): String =
      if (x.contains("\"") || x.contains("'")) x else s"'$x'"
    def validHintParam(k: String): Boolean = {
      val norm = k.toUpperCase.stripPrefix("\"").stripSuffix("\"")
        .stripPrefix("'").stripSuffix("'")
      norm.nonEmpty && !norm.startsWith("NLS_") && !fixedKeys.contains(norm)
    }
    def optParams(kv: Map[String, String]): Seq[String] =
      kv.toSeq.sortBy(_._1).collect {
        case (k, v) if validHintParam(k) =>
          s"OPT_PARAM(${enquote(k)}, ${enquote(v)})"
      }
    val hints = (optParams(fixedSqoopParameters(p.tsScale)) ++
      optParams(fixedGoeParameters(p.smartScanUnsafe)) ++
      optParams(p.custom)).mkString(" ")
    s"/*+ NO_PARALLEL $hints */".replace("  */", " */")
  }

  /** The Spark JDBC reader options this preset compiles to. */
  def readOptions(p: Preset): Map[String, String] =
    Map(
      "sessionInitStatement" -> sessionInitStatement(p),
      "fetchsize" -> p.fetchSize.toString) ++
      p.customSchema.map("customSchema" -> _)
}
