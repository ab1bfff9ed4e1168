package graft.source

import org.scalatest.funsuite.AnyFunSuite

/** Golden-SQL matrices for the Teradata/MSSQL source-table planning
  * surface — partition introspection, sampling, catalog and split SQL
  * pinned as exact text, plus the pure choosers, composed with the
  * FrontendTypes and DialectRenderers layers they plan for. */
class SourcePlanningSpec extends AnyFunSuite {
  import TeradataPlanning._

  // ------------------------------------------------- RANGE_N parsing

  test("teradata: monthly date RANGE_N constraint parses") {
    val text = "CHECK (/*02 02 01*/ RANGE_N(\"SALE_DATE\" BETWEEN " +
      "DATE '2012-01-01' AND DATE '2012-12-31' EACH INTERVAL '1' MONTH, " +
      "NO RANGE OR UNKNOWN) IS NOT NULL)"
    val RangeN(col, pseudo, ranges) =
      parsePartitionExpression(text): @unchecked
    assert(col == "SALE_DATE" && pseudo == "PARTITION#L1")
    assert(ranges == Seq(RangeSpec("DATE '2012-01-01'", "DATE '2012-12-31'",
      "INTERVAL '1' MONTH", datetime = true)))
  }

  test("teradata: numeric RANGE_N in parentheses with BETWEEN end parses") {
    val text = "CHECK ((RANGE_N(PROD_ID BETWEEN 1 AND 1000 EACH 100)) " +
      "BETWEEN 1 AND 11)"
    val RangeN(col, pseudo, ranges) =
      parsePartitionExpression(text): @unchecked
    assert(col == "PROD_ID" && pseudo == "PARTITION#L1")
    assert(ranges ==
      Seq(RangeSpec("1", "1000", "100", datetime = false)))
  }

  test("teradata: multi-arm timestamp RANGE_N parses both arms") {
    val text = "CHECK (RANGE_N(\"TS\" BETWEEN " +
      "TIMESTAMP '2020-01-01 00:00:00' AND TIMESTAMP '2020-06-30 23:59:59' " +
      "EACH INTERVAL '1' MONTH, " +
      "TIMESTAMP '2020-07-01 00:00:00' AND TIMESTAMP '2020-12-31 23:59:59' " +
      "EACH INTERVAL '1' DAY, NO RANGE) IS NOT NULL)"
    val RangeN(_, _, ranges) = parsePartitionExpression(text): @unchecked
    assert(ranges.length == 2)
    assert(ranges.head.each == "INTERVAL '1' MONTH")
    assert(ranges(1).each == "INTERVAL '1' DAY")
  }

  test("teradata: columnar level shifts the RANGE_N pseudo column") {
    val text = "CHECK (PARTITION#L1 /*02 01 03*/ =1 AND " +
      "RANGE_N(\"D\" BETWEEN DATE '2020-01-01' AND DATE '2020-12-31' " +
      "EACH INTERVAL '1' MONTH) IS NOT NULL)"
    val RangeN(_, pseudo, _) = parsePartitionExpression(text): @unchecked
    assert(pseudo == "PARTITION#L2")
  }

  test("teradata: columnar-only parses to Columnar; CASE_N raises") {
    assert(parsePartitionExpression(
      "CHECK (PARTITION#L1 /*02 01 03*/ =1)") == Columnar)
    intercept[UnsupportedPartitionExpression] {
      parsePartitionExpression(
        "CHECK ((CASE_N(COL1 < 10, COL1 < 100, UNKNOWN)) BETWEEN 1 AND 4)")
    }
    intercept[UnsupportedPartitionExpression] {
      parsePartitionExpression("CHECK (SOMETHING_ELSE(X))")
    }
  }

  // -------------------------------------------- partition enumeration

  test("teradata: date period CTE expands via SYS_CALENDAR, golden text") {
    val r = RangeSpec("DATE '2012-01-01'", "DATE '2012-12-31'",
      "INTERVAL '1' MONTH", datetime = true)
    assert(datetimePeriodsCteBranch(r, timestamp = false) ==
      """SELECT END(pd) AS period_end
        |FROM   SYS_CALENDAR.CALENDAR
        |WHERE  calendar_date = DATE '2012-01-01'
        |EXPAND ON PERIOD( DATE '2012-01-01', DATE '2012-12-31' + 1 ) AS pd BY INTERVAL '1' MONTH""".stripMargin)
    // timestamp margin closes the last period with a whole day
    val ts = RangeSpec("TIMESTAMP '2020-01-01 00:00:00'",
      "TIMESTAMP '2020-12-31 23:59:59'", "INTERVAL '1' MONTH",
      datetime = true)
    assert(datetimePeriodsCteBranch(ts, timestamp = true)
      .contains("+ INTERVAL '1' DAY )"))
  }

  test("teradata: numeric period CTE uses STRTOK, chunked over the limit") {
    val r = RangeSpec("0", "1000", "100", datetime = false)
    assert(numericIntervalCountSql(r) == "SELECT (1000-0)/100 AS n")
    val one = numericPeriodsCteBranches(r, 10)
    assert(one.length == 1)
    assert(one.head ==
      """SELECT 0 + (100 * CAST(d.token AS INTEGER)) AS period_end
        |FROM TABLE (STRTOK_SPLIT_TO_TABLE(1, '1,2,3,4,5,6,7,8,9,10', ',')
        |     RETURNS (outkey INTEGER, tokennum INTEGER, token VARCHAR(64) CHARACTER SET UNICODE)
        |) AS d""".stripMargin)
    // 10000 tokens ≈ 49 kB CSV > 31 kB: sub-CSVs of at most 2000 items
    val many = numericPeriodsCteBranches(
      RangeSpec("0", "1000000", "100", datetime = false), 10000)
    assert(many.length == 5)
    assert(many.head.contains("'1,2,") && many.last.contains(",10000'"))
  }

  test("teradata: populated-partitions introspection SQL, golden text") {
    val sql = populatedPartitionsSql("\"SH\".\"SALES\"", "PARTITION#L1",
      Seq("SELECT 1 AS period_end"))
    assert(sql ==
      """WITH range_n_periods AS (
        |SELECT 1 AS period_end),
        |partition_range_metadata AS (
        |    SELECT ROW_NUMBER() OVER (ORDER BY period_end) AS partition_no
        |    ,      period_end                              AS high_value
        |    FROM   range_n_periods),
        |populated_partitions AS (
        |    SELECT DISTINCT PARTITION#L1 AS partition_no
        |    FROM   "SH"."SALES")
        |SELECT pp.partition_no
        |,      prm.high_value
        |,      CASE WHEN prm.partition_no IS NULL THEN 'Y' END AS out_of_range
        |FROM   populated_partitions pp
        |LEFT OUTER JOIN partition_range_metadata prm
        |ON (prm.partition_no = pp.partition_no)
        |ORDER BY pp.partition_no DESC""".stripMargin)
  }

  // ------------------------------------------------------ catalog SQL

  test("teradata: catalog SQL matrix pins the DBC sources") {
    val matrix = Map(
      partitionConstraintSql -> Seq("DBC.PartitioningConstraintsV",
        "ConstraintType = 'Q'"),
      tableDetailsSql -> Seq("DBC.StatsV", "DBC.TablesV",
        "QUALIFY ROW_NUMBER() OVER (ORDER BY LastCollectTimeStamp, RowCount DESC) = 1",
        "PartitioningLevels"),
      tableSizeSql -> Seq("SUM(CurrentPerm)", "DBC.TablesizeV"),
      primaryIndexColumnsSql -> Seq("DBC.IndicesV", "IndexType IN ('P', 'Q')"),
      primaryKeyColumnsSql -> Seq("DBC.IndicesV", "IndexType = 'K'",
        "ORDER BY ColumnPosition"),
      columnsSql -> Seq("DBC.ColumnsV", "DecimalTotalDigits",
        "ORDER BY ColumnId ASC"),
      aggValidateSampleColumnsSql -> Seq(
        "ROW_NUMBER() OVER (ORDER BY s.UniqueValueCount DESC) AS ndv_rank",
        "ColumnId IN (first_column_id, last_column_id)", "ndv_rank <= ?"),
      schemaExistsSql -> Seq("DBC.Databases2V"),
      tableExistsSql -> Seq("TableKind = 'T'"),
      viewExistsSql -> Seq("TableKind = 'V'"),
      versionSql -> Seq("DBC.DBCInfoV", "InfoKey = 'VERSION'"),
      tableAmpsSql -> Seq("Vproc", "ORDER BY CurrentPerm DESC"))
    matrix.foreach { case (sql, markers) =>
      markers.foreach(m => assert(sql.contains(m), s"missing [$m] in:\n$sql"))
    }
    assert(showDdlSql("TABLE", "SH", "SALES") == "SHOW TABLE SH.SALES")
    assert(currentUserSql == "SELECT CURRENT_USER")
  }

  // --------------------------------------------------------- sampling

  test("teradata: SAMPLE fraction clamps to the open (0,1) interval") {
    assert(sampleFraction(-5) == SampleMinFraction)
    assert(sampleFraction(100) == SampleMaxFraction)
    assert(sampleFraction(250) == SampleMaxFraction)
    assert(sampleFraction(1) == 0.01)
    assert(sampleClause(1) == "SAMPLE 0.01")
    assert(sampleClause(100) == "SAMPLE 0.999999")
    assert(lowHighValuesSql("sale_ts", "\"SH\".\"SALES\"", 1) ==
      """SELECT MIN(SALE_TS)
        |,      MAX(SALE_TS)
        |FROM   "SH"."SALES"
        |SAMPLE 0.01""".stripMargin)
  }

  test("teradata: TOP-1 probes and id-range bounds, golden text") {
    assert(partitionHasRowsSql("\"SH\".\"SALES\"", 7) ==
      "SELECT TOP 1 1 FROM \"SH\".\"SALES\" WHERE PARTITION = 7")
    assert(predicateHasRowsSql("\"SH\".\"SALES\"", "SALE_ID > 5") ==
      "SELECT TOP 1 1 FROM \"SH\".\"SALES\" WHERE (SALE_ID > 5)")
    assert(idRangeSql("SALE_ID", "\"SH\".\"SALES\"", Some("PARTITION = 3")) ==
      "SELECT MIN(SALE_ID), MAX(SALE_ID) FROM \"SH\".\"SALES\" WHERE PARTITION = 3")
  }

  // --------------------------------------------------- split planning

  test("teradata: split-type ladder matches the reference decisions") {
    import SplitType._
    // 1: plenty of partitions
    assert(chooseSplitType(64, 16, 32, hasPrimaryIndex = true,
      hasPredicate = false, idSplitNumeric = true) == ((Partition, 16)))
    // 2: filtered + PI + enough AMPs
    assert(chooseSplitType(4, 16, 32, hasPrimaryIndex = true,
      hasPredicate = false, idSplitNumeric = false) == ((HashAmp, 16)))
    // 3: numeric PK, no filter
    assert(chooseSplitType(0, 16, 32, hasPrimaryIndex = true,
      hasPredicate = false, idSplitNumeric = true) == ((IdRange, 16)))
    assert(chooseSplitType(0, 16, 32, hasPrimaryIndex = true,
      hasPredicate = false, idSplitNumeric = true,
      nativeRangeAvailable = true) == ((NativeRange, 16)))
    // 4: filtered + PI but few AMPs: parallelism tunes down
    assert(chooseSplitType(0, 16, 8, hasPrimaryIndex = true,
      hasPredicate = true, idSplitNumeric = false) == ((HashAmp, 8)))
    // 5: unfiltered, no PK: whole-AMP scan
    assert(chooseSplitType(0, 16, 8, hasPrimaryIndex = false,
      hasPredicate = false, idSplitNumeric = false) == ((Amp, 8)))
    // 6: few partitions, nothing better
    assert(chooseSplitType(4, 16, 8, hasPrimaryIndex = false,
      hasPredicate = true, idSplitNumeric = false) == ((Partition, 4)))
  }

  test("teradata: id-range and round-robin splitters") {
    assert(splitRangesForIdRange(BigDecimal(1), BigDecimal(10), 2) ==
      Seq((BigDecimal(1), BigDecimal(6)), (BigDecimal(6), BigDecimal(11))))
    assert(splitListsRoundRobin(Seq("8", "4", "1", "3", "6", "9"), 2) ==
      Seq("8,1,6", "4,3,9"))
    assert(splitListsRoundRobin(Seq("1", "2"), 4) == Seq("1", "2"))
  }

  test("teradata: row-source queries, golden text per split type") {
    val t = "\"SH\".\"SALES\""
    assert(rowSourceQuery(SplitType.Partition, t, 2,
      partitionNumbers = Seq(1, 2, 3, 4)) ==
      s"SELECT g.*, 0 AS goe_offload_batch FROM $t g WHERE PARTITION#L1 IN (1,3)" +
      " UNION ALL " +
      s"SELECT g.*, 1 AS goe_offload_batch FROM $t g WHERE PARTITION#L1 IN (2,4)")
    assert(rowSourceQuery(SplitType.IdRange, t, 2,
      idSplitColumn = Some("SALE_ID"), idMin = 1, idMax = 10,
      predicate = Some("SALE_TYPE = 'X'")) ==
      s"SELECT g.*, 0 AS goe_offload_batch FROM $t g WHERE SALE_ID >= 1 AND SALE_ID < 6 AND (SALE_TYPE = 'X')" +
      " UNION ALL " +
      s"SELECT g.*, 1 AS goe_offload_batch FROM $t g WHERE SALE_ID >= 6 AND SALE_ID < 11 AND (SALE_TYPE = 'X')")
    assert(rowSourceQuery(SplitType.NativeRange, t, 4,
      idSplitColumn = Some("SALE_ID")) ==
      s"SELECT g.*, SALE_ID AS goe_offload_batch FROM $t g")
    assert(rowSourceQuery(SplitType.Amp, t, 2, ampIds = Seq(0, 1, 2, 3)) ==
      s"SELECT g.*, 0 AS goe_offload_batch FROM TDAMPCOPY(ON $t USING AMPList(0,2)) AS g" +
      " UNION ALL " +
      s"SELECT g.*, 1 AS goe_offload_batch FROM TDAMPCOPY(ON $t USING AMPList(1,3)) AS g")
    assert(rowSourceQuery(SplitType.HashAmp, t, 2, ampIds = Seq(0, 1, 2, 3),
      primaryIndexColumns = Seq("SALE_ID", "SALE_TS"),
      partitionNumbers = Seq(5, 6)) ==
      s"SELECT g.*, 0 AS goe_offload_batch FROM $t g WHERE HASHAMP(HASHBUCKET(HASHROW(SALE_ID,SALE_TS))) IN (0,2) AND PARTITION#L1 IN (5,6)" +
      " UNION ALL " +
      s"SELECT g.*, 1 AS goe_offload_batch FROM $t g WHERE HASHAMP(HASHBUCKET(HASHROW(SALE_ID,SALE_TS))) IN (1,3) AND PARTITION#L1 IN (5,6)")
  }

  test("teradata: composes with the predicate DSL and type mapper") {
    import graft.predicate.{DialectRenderers, OffloadPredicate}
    val pred = OffloadPredicate.parseUnsafe(
      "(column(SALE_DATE) < datetime(2020-01-01))")
    val where = DialectRenderers.teradata(pred)
    val sql = rowSourceQuery(SplitType.NativeRange, "\"SH\".\"SALES\"", 4,
      idSplitColumn = Some("SALE_ID"), predicate = Some(where))
    assert(sql.contains("WHERE (") && sql.contains("SALE_DATE"))
    // DBC.ColumnsV rows land in canonical types via FrontendTypes
    import graft.types.{CanonicalType, FrontendTypes}
    val c = FrontendTypes.teradata(
      FrontendTypes.FrontendCol("SALE_DATE", "DATE"))
    assert(c.ctype == CanonicalType.Date)
  }

  // ------------------------------------------------------------ MSSQL

  test("mssql: catalog SQL matrix pins the sys.* sources") {
    val matrix = Map(
      MssqlPlanning.tableDetailsSql -> Seq("sys.tables", "sys.partitions",
        "sys.schemas", "MAX(partition_number) > 1", "SUM(rows)"),
      MssqlPlanning.primaryKeyColumnsSql -> Seq(
        "COL_NAME(ic.object_id, ic.column_id)", "sys.index_columns",
        "i.is_primary_key = 1", "ORDER BY ic.column_id"),
      MssqlPlanning.columnsSql -> Seq("information_schema.columns",
        "COALESCE(numeric_precision, datetime_precision)",
        "ordinal_position"))
    matrix.foreach { case (sql, markers) =>
      markers.foreach(m => assert(sql.contains(m), s"missing [$m] in:\n$sql"))
    }
    assert(MssqlPlanning.canarySql == "SELECT 1")
    assert(MssqlPlanning.versionSql == "SELECT @@VERSION")
  }

  test("mssql: statistics-driven hash bucket choice") {
    assert(MssqlPlanning.autostatsSql("sh", "sales") ==
      "SP_AUTOSTATS \"sh.sales\"")
    assert(MssqlPlanning.densityVectorSql("sh", "sales", "stats_col4") ==
      "DBCC SHOW_STATISTICS (\"sh.sales\", stats_col4) WITH DENSITY_VECTOR")
    // lowest single-column density wins; composite stats are skipped
    assert(MssqlPlanning.chooseHashBucket(Seq(
      (0.5, 8.0, "col_a"),
      (0.0001, 8.0, "col_a,col_b"),
      (0.02, 8.0, "col_c"))) == Some("col_c"))
    assert(MssqlPlanning.chooseHashBucket(Nil).isEmpty)
  }

  test("mssql: TOP-N sampling and mod-split predicates") {
    assert(MssqlPlanning.sampleClause == "")
    assert(MssqlPlanning.topNSampleSql("*", "[sh].[sales]", 5000) ==
      "SELECT TOP(5000) * FROM [sh].[sales]")
    assert(MssqlPlanning.predicateHasRowsSql("[sh].[sales]", "sale_id > 5") ==
      "SELECT TOP 1 1 FROM [sh].[sales] WHERE (sale_id > 5)")
    assert(MssqlPlanning.modSplitPredicates("sale_id", 4) == Seq(
      "ABS(sale_id) % 4 = 0", "ABS(sale_id) % 4 = 1",
      "ABS(sale_id) % 4 = 2", "ABS(sale_id) % 4 = 3"))
    // a mod split renders straight into the generic JDBC splitter
    assert(JdbcSplit.capPredicates(
      MssqlPlanning.modSplitPredicates("sale_id", 4)).length == 4)
    // and columns map through the MSSQL type layer
    import graft.types.{CanonicalType, FrontendTypes}
    val c = FrontendTypes.mssql(
      FrontendTypes.FrontendCol("sale_ts", "datetime2"))
    assert(c.ctype == CanonicalType.Timestamp)
  }
}
