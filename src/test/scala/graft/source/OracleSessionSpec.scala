package graft.source

import org.scalatest.funsuite.AnyFunSuite

/** Golden-string matrices for the Oracle session-shaping preset —
  * `oracle_offload_transport_rdbms_api.py:168-227,445-535` re-expressed.
  * The live per-cursor execution proof is in `JdbcSplitLiveSpec`
  * ("sessionInitStatement runs once per split cursor"). */
class OracleSessionSpec extends AnyFunSuite {

  import OracleSession._

  test("fixed Sqoop parameters pin NLS formats, UTC, serial direct read") {
    val p = fixedSqoopParameters(Some(6))
    assert(p("TRACEFILE_IDENTIFIER") == "'GOE'")
    assert(p("TIME_ZONE") == "'UTC'")
    assert(p("NLS_TIMESTAMP_FORMAT") == "'YYYY-MM-DD HH24:MI:SS.FF6'")
    assert(p("NLS_TIMESTAMP_TZ_FORMAT") ==
      "'YYYY-MM-DD HH24:MI:SS.FF6 TZH:TZM'")
    assert(p("NLS_DATE_FORMAT") == "'YYYY-MM-DD HH24:MI:SS'")
    assert(p("\"_SERIAL_DIRECT_READ\"") == "TRUE")
    // no scale → bare FF (server default scale)
    assert(fixedSqoopParameters(None)("NLS_TIMESTAMP_FORMAT") ==
      "'YYYY-MM-DD HH24:MI:SS.FF'")
  }

  test("setup commands: module tag first, then sorted ALTER SESSIONs") {
    val cmds = setupCommands(Preset(action = "IU", tsScale = Some(3),
      smartScanUnsafe = true, custom = Map("OPTIMIZER_MODE" -> "FIRST_ROWS")))
    assert(cmds.head ==
      "BEGIN DBMS_APPLICATION_INFO.SET_MODULE('GOE','IU'); END;")
    val alters = cmds.tail
    assert(alters.forall(_.startsWith("ALTER SESSION SET ")))
    // fixed sqoop block is sorted by key ("_SERIAL_DIRECT_READ" quoted sorts
    // first), then the GOE block, then custom
    assert(alters.head == "ALTER SESSION SET \"_SERIAL_DIRECT_READ\"=TRUE")
    assert(alters.contains(
      "ALTER SESSION SET NLS_TIMESTAMP_FORMAT='YYYY-MM-DD HH24:MI:SS.FF3'"))
    assert(alters(alters.length - 2) ==
      "ALTER SESSION SET CELL_OFFLOAD_PROCESSING=FALSE")
    assert(alters.last == "ALTER SESSION SET OPTIMIZER_MODE=FIRST_ROWS")
  }

  test("sessionInitStatement is one PL/SQL block with EXECUTE IMMEDIATE") {
    val s = sessionInitStatement(Preset(tsScale = Some(6)))
    assert(s.startsWith(
      "BEGIN DBMS_APPLICATION_INFO.SET_MODULE('GOE','OFFLOAD');"))
    assert(s.endsWith(" END;"))
    assert(s.contains("EXECUTE IMMEDIATE q'!ALTER SESSION SET " +
      "NLS_DATE_FORMAT='YYYY-MM-DD HH24:MI:SS'!';"))
    // exactly one outer block: BEGIN...END; wrapping only EXECUTE IMMEDIATEs
    assert(s.indexOf("BEGIN") == s.lastIndexOf("BEGIN"))
  }

  test("setup hint: NO_PARALLEL always; NLS/session-only keys filtered; " +
    "quoted _SERIAL_DIRECT_READ survives (reference quirk)") {
    val h = setupHint(Preset(tsScale = Some(6), smartScanUnsafe = true,
      custom = Map("OPTIMIZER_MODE" -> "FIRST_ROWS",
        "NLS_SORT" -> "BINARY")))
    assert(h.startsWith("/*+ NO_PARALLEL "))
    assert(h.endsWith(" */"))
    assert(!h.contains("NLS_"))
    assert(!h.contains("TIME_ZONE") && !h.contains("TRACEFILE"))
    assert(h.contains("OPT_PARAM(\"_SERIAL_DIRECT_READ\", 'TRUE')"))
    assert(h.contains("OPT_PARAM('CELL_OFFLOAD_PROCESSING', 'FALSE')"))
    assert(h.contains("OPT_PARAM('OPTIMIZER_MODE', 'FIRST_ROWS')"))
  }

  test("readOptions compile the preset to Spark JDBC options") {
    val o = readOptions(Preset(fetchSize = 10000,
      customSchema = Some("ID DECIMAL(38,0)")))
    assert(o("fetchsize") == "10000")
    assert(o("customSchema") == "ID DECIMAL(38,0)")
    assert(o("sessionInitStatement").startsWith("BEGIN "))
    assert(readOptions(Preset()).get("customSchema").isEmpty)
  }

  test("preset rejects out-of-range timestamp scale") {
    intercept[IllegalArgumentException](Preset(tsScale = Some(10)))
  }
}
