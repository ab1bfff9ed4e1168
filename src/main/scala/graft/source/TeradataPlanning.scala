package graft.source

import scala.util.parsing.combinator.RegexParsers

/** Teradata source-table planning surface: partition introspection,
  * sampling SQL and transport-split SQL as renderable text.
  *
  * Re-expresses the reference's Teradata planning layer —
  * `teradata/teradata_offload_source_table.py:269-401` (RANGE_N period
  * expansion + populated-partition introspection),
  * `teradata/teradata_partition_expression.py:42-205` (constraint-text
  * grammar), `teradata/teradata_frontend_api.py:73-911` (DBC catalog
  * queries) and `teradata/teradata_offload_transport_rdbms_api.py:131-560`
  * (split-type ladder + row-source UNION ALL queries).
  *
  * Everything here is a pure function from table metadata to SQL text (with
  * `?` positional binds where the reference binds) — the Spark side then
  * executes the row-source branches via the JDBC split reader
  * ([[JdbcSplit]]), so a Teradata frontend plugs into the same offload
  * pipeline as the Oracle path. Column typing composes with
  * [[graft.types.FrontendTypes.teradata]]; predicate text with
  * [[graft.predicate.DialectRenderers]] (`Teradata` dialect).
  */
object TeradataPlanning {

  /** `goe_offload_batch` — the synthetic split column every row-source
    * query adds (`offload_transport_rdbms_api.py:53`). */
  val BatchColumn = "goe_offload_batch"

  /** Teradata SAMPLE accepts a fraction strictly between 0 and 1
    * (`teradata_offload_source_table.py:110-112`). */
  val SampleMinFraction = 0.000001
  val SampleMaxFraction = 0.999999

  /** STRTOK_SPLIT_TO_TABLE literal limits
    * (`teradata_offload_source_table.py:124-125`). */
  val StrtokMaxCsvLength = 31000
  val StrtokMaxSubCsvItems = 2000

  // ------------------------------------------------------------ partition
  // expression: DBC.PartitioningConstraintsV.ConstraintText → typed scheme

  /** One RANGE_N `BETWEEN start AND end EACH step` arm; literals keep
    * their SQL spelling so they can be re-rendered verbatim. */
  final case class RangeSpec(start: String, end: String, each: String,
                             datetime: Boolean)

  sealed trait PartitionScheme
  /** Offloadable top-level RANGE_N scheme. `pseudoColumn` is the
    * `PARTITION#Ln` level the scheme occupies in the check constraint. */
  final case class RangeN(column: String, pseudoColumn: String,
                          ranges: Seq[RangeSpec]) extends PartitionScheme
  /** Columnar-only partitioning — treated as non-partitioned. */
  case object Columnar extends PartitionScheme

  final case class UnsupportedPartitionExpression(msg: String)
      extends IllegalArgumentException(msg)

  /** The constraint source (`teradata_frontend_api.py:82-87`). */
  val partitionConstraintSql: String =
    """SELECT ConstraintText
      |FROM   DBC.PartitioningConstraintsV
      |WHERE  ConstraintType = 'Q'
      |AND    DatabaseName = ?
      |AND    TableName = ?""".stripMargin

  private sealed trait Check
  private final case class RangeCheck(column: String,
                                      ranges: Seq[RangeSpec]) extends Check
  private case object ColumnarCheck extends Check

  private object P extends RegexParsers {
    private def comment: Parser[String] = """/\*[^*]*(\*[^/][^*]*)*\*/""".r
    private def columnName: Parser[String] =
      "\"" ~> """[A-Za-z0-9.$#_]+""".r <~ "\"" | """[A-Za-z0-9.$#_]+""".r
    private def dtLit: Parser[String] =
      """DATE '\d{4}-\d{2}-\d{2}'""".r |
      ("""TIMESTAMP '\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}""" +
        """(\.\d{1,9})?([+-]\d{2}:\d{2})?'""").r
    private def intervalLit: Parser[String] =
      """INTERVAL '\d+' (MONTH|DAY|HOUR)""".r
    private def int: Parser[String] = """\d+""".r

    private def dtRange: Parser[RangeSpec] =
      dtLit ~ ("AND" ~> dtLit) ~ ("EACH" ~> intervalLit) ^^ {
        case s ~ e ~ i => RangeSpec(s, e, i, datetime = true) }
    private def numRange: Parser[RangeSpec] =
      int ~ ("AND" ~> int) ~ ("EACH" ~> int) ^^ {
        case s ~ e ~ i => RangeSpec(s, e, i, datetime = false) }
    private def ranges: Parser[Seq[RangeSpec]] =
      rep1sep(dtRange, ",") | rep1sep(numRange, ",")
    private def noRange: Parser[Any] =
      ("NO" ~ "RANGE" ~ opt(("OR" | ",") ~ "UNKNOWN")) | "UNKNOWN"
    private def rangeNEnd: Parser[Any] =
      ("IS" ~ "NOT" ~ "NULL") | ("BETWEEN" ~ int ~ "AND" ~ int)

    private def rangeN: Parser[Check] =
      "RANGE_N" ~> "(" ~> columnName ~ ("BETWEEN" ~> ranges) <~
        opt("," ~ noRange) <~ ")" ^^ {
          case c ~ rs => RangeCheck(c, rs) }
    private def rangeNCheck: Parser[Check] =
      (rangeN | "(" ~> rangeN <~ ")") <~ opt(comment) <~ opt(rangeNEnd)
    private def columnarCheck: Parser[Check] =
      """PARTITION#L[1-5]""".r ~ opt(comment) ~ "=" ~ "1" ^^^ ColumnarCheck
    private def check: Parser[Check] = rangeNCheck | columnarCheck

    private def constraint: Parser[Seq[Check]] =
      "CHECK" ~> "(" ~> opt(comment) ~> rep1sep(check, "AND") <~ ")"

    def parseConstraint(text: String): Seq[Check] =
      parseAll(constraint, text) match {
        case Success(cs, _) => cs
        case f: NoSuccess =>
          throw UnsupportedPartitionExpression(
            s"Unsupported partition expression: $text (${f.msg})")
      }
  }

  /** Parse a partitioning check constraint. Only top-level RANGE_N
    * (optionally combined with columnar) is offloadable — CASE_N raises,
    * like the reference (`teradata_partition_expression.py:159-176`).
    * Columnar-only parses to [[Columnar]] (caller treats the table as
    * non-partitioned). */
  def parsePartitionExpression(constraintText: String): PartitionScheme = {
    if (constraintText.toUpperCase.contains("CASE_N"))
      throw UnsupportedPartitionExpression(
        s"CASE_N partition expressions are not supported: $constraintText")
    val checks = P.parseConstraint(constraintText)
    checks.zipWithIndex.collectFirst {
      case (RangeCheck(col, rs), i) =>
        RangeN(col, s"PARTITION#L${i + 1}", rs)
    }.getOrElse(Columnar)
  }

  // ------------------------------------------------- partition enumeration

  /** Period-expansion CTE branch for one DATE/TIMESTAMP range arm: EXPAND
    * ON generates one row per period end without touching the table
    * (`teradata_offload_source_table.py:289-303`). TIMESTAMP ranges pad
    * the end by a day (the margin keeps the last period closed). */
  def datetimePeriodsCteBranch(r: RangeSpec, timestamp: Boolean): String = {
    require(r.datetime, s"not a datetime range: $r")
    val margin = if (timestamp) "INTERVAL '1' DAY" else "1"
    s"""SELECT END(pd) AS period_end
       |FROM   SYS_CALENDAR.CALENDAR
       |WHERE  calendar_date = ${r.start}
       |EXPAND ON PERIOD( ${r.start}, ${r.end} + $margin ) AS pd BY ${r.each}""".stripMargin
  }

  /** SQL that asks Teradata how many periods a numeric arm spans, so the
    * step literal never needs client-side interpretation
    * (`teradata_offload_source_table.py:305-308`). */
  def numericIntervalCountSql(r: RangeSpec): String =
    s"SELECT (${r.end}-${r.start})/${r.each} AS n"

  /** Period CTE branches for one numeric arm given the interval count:
    * STRTOK_SPLIT_TO_TABLE fabricates the period index rows; counts large
    * enough to overflow the 31 kB literal limit split into sub-CSVs of at
    * most 2000 items (`teradata_offload_source_table.py:309-330`). */
  def numericPeriodsCteBranches(r: RangeSpec, intervalCount: Int): Seq[String] = {
    require(!r.datetime, s"not a numeric range: $r")
    val tokens = (1 to intervalCount).map(_.toString)
    val oneCsv = tokens.mkString(",")
    val csvs =
      if (oneCsv.length <= StrtokMaxCsvLength) Seq(oneCsv)
      else tokens.grouped(StrtokMaxSubCsvItems).map(_.mkString(",")).toSeq
    csvs.map { csv =>
      s"""SELECT ${r.start} + (${r.each} * CAST(d.token AS INTEGER)) AS period_end
         |FROM TABLE (STRTOK_SPLIT_TO_TABLE(1, '$csv', ',')
         |     RETURNS (outkey INTEGER, tokennum INTEGER, token VARCHAR(64) CHARACTER SET UNICODE)
         |) AS d""".stripMargin
    }
  }

  /** The partition introspection query: number the declared periods, then
    * LEFT JOIN from `SELECT DISTINCT PARTITION#Ln` (a cylinder-index scan,
    * not a row scan) so only POPULATED partitions come back, high values
    * descending; rows outside the declared ranges flag `out_of_range`
    * (`teradata_offload_source_table.py:336-365`). */
  def populatedPartitionsSql(ownerTable: String, pseudoColumn: String,
                             periodsCteBranches: Seq[String]): String = {
    require(periodsCteBranches.nonEmpty)
    val cte = periodsCteBranches.mkString("\nUNION ALL\n")
    s"""WITH range_n_periods AS (
       |$cte),
       |partition_range_metadata AS (
       |    SELECT ROW_NUMBER() OVER (ORDER BY period_end) AS partition_no
       |    ,      period_end                              AS high_value
       |    FROM   range_n_periods),
       |populated_partitions AS (
       |    SELECT DISTINCT $pseudoColumn AS partition_no
       |    FROM   $ownerTable)
       |SELECT pp.partition_no
       |,      prm.high_value
       |,      CASE WHEN prm.partition_no IS NULL THEN 'Y' END AS out_of_range
       |FROM   populated_partitions pp
       |LEFT OUTER JOIN partition_range_metadata prm
       |ON (prm.partition_no = pp.partition_no)
       |ORDER BY pp.partition_no DESC""".stripMargin
  }

  // --------------------------------------------------------- catalog SQL

  /** Table existence + partitioning levels + newest stats row count
    * (`teradata_offload_source_table.py:429-450`). Binds: owner, table,
    * owner, table. */
  val tableDetailsSql: String =
    """WITH s AS
      |(   SELECT RowCount
      |    FROM   DBC.StatsV
      |    WHERE  DatabaseName = ?
      |    AND    TableName = ?
      |    QUALIFY ROW_NUMBER() OVER (ORDER BY LastCollectTimeStamp, RowCount DESC) = 1)
      |SELECT PartitioningLevels
      |,      (SELECT MAX(RowCount) FROM s) num_rows
      |FROM   DBC.TablesV
      |WHERE  DatabaseName = ?
      |AND    TableName = ?""".stripMargin

  /** Permanent size across AMPs (`teradata_frontend_api.py:830-841`). */
  val tableSizeSql: String =
    """SELECT SUM(CurrentPerm)
      |FROM   DBC.TablesizeV
      |WHERE  DatabaseName = ?
      |AND    TableName = ?""".stripMargin

  /** Primary-index columns — split keys for HASHROW
    * (`teradata_offload_source_table.py:403-415`). */
  val primaryIndexColumnsSql: String =
    """SELECT IndexName, ColumnName
      |FROM   DBC.IndicesV
      |WHERE  DatabaseName = ?
      |AND    TableName = ?
      |AND    IndexType IN ('P', 'Q')""".stripMargin

  /** Primary-key columns — id-range split candidates
    * (`teradata_frontend_api.py:771-783`). */
  val primaryKeyColumnsSql: String =
    """SELECT ColumnName
      |FROM   DBC.IndicesV
      |WHERE  DatabaseName = ?
      |AND    TableName = ?
      |AND    IndexType = 'K'
      |ORDER BY ColumnPosition""".stripMargin

  /** Column catalog, ordinal order (`teradata_frontend_api.py:637-652`);
    * rows feed [[graft.types.FrontendTypes.teradata]]. */
  val columnsSql: String =
    """SELECT ColumnId
      |,      ColumnName
      |,      Nullable
      |,      ColumnType
      |,      DecimalTotalDigits
      |,      DecimalFractionalDigits
      |,      ColumnLength
      |,      DefaultValue
      |FROM   DBC.ColumnsV
      |WHERE  DatabaseName = ?
      |AND    TableName = ?
      |ORDER BY ColumnId ASC""".stripMargin

  /** First + last columns plus the top-NDV columns by collected stats —
    * the aggregate-validation sample set
    * (`teradata_frontend_api.py:560-585`). Binds: owner, table, n. */
  val aggValidateSampleColumnsSql: String =
    """SELECT ColumnName
      |FROM  (
      |       SELECT c.ColumnName
      |       ,      c.ColumnId
      |       ,      MIN(c.ColumnId) OVER () AS first_column_id
      |       ,      MAX(c.ColumnId) OVER () AS last_column_id
      |       ,      ROW_NUMBER() OVER (ORDER BY s.UniqueValueCount DESC) AS ndv_rank
      |       FROM   DBC.ColumnsV AS c
      |       LEFT OUTER JOIN DBC.StatsV AS s ON (c.DatabaseName = s.DatabaseName
      |                                           AND c.TableName = s.TableName
      |                                           AND c.ColumnName = s.ColumnName)
      |       WHERE  c.DatabaseName = ?
      |       AND    c.TableName = ?
      |      ) AS v
      |WHERE  ColumnId IN (first_column_id, last_column_id)
      |OR     ndv_rank <= ?""".stripMargin

  /** Existence probes (`teradata_frontend_api.py:864-911`). */
  val schemaExistsSql: String =
    "SELECT DatabaseName FROM DBC.Databases2V WHERE DatabaseName = ?"
  val tableExistsSql: String =
    "SELECT TableName FROM DBC.TablesV WHERE DatabaseName = ? AND TableName = ? AND TableKind = 'T'"
  val viewExistsSql: String =
    "SELECT TableName FROM DBC.TablesV WHERE DatabaseName = ? AND TableName = ? AND TableKind = 'V'"
  val versionSql: String =
    "SELECT InfoData FROM DBC.DBCInfoV WHERE InfoKey = 'VERSION'"
  val currentUserSql: String = "SELECT CURRENT_USER"

  /** DDL retrieval is a statement, not a catalog query, on Teradata
    * (`teradata_frontend_api.py:686-717`). */
  def showDdlSql(objectType: String, schema: String, name: String): String =
    s"SHOW $objectType $schema.$name"

  /** AMP inventory for a table, busiest first
    * (`teradata_offload_transport_rdbms_api.py:131-137`). */
  val tableAmpsSql: String =
    "SELECT Vproc FROM DBC.TableSizeV WHERE DatabaseName = ? AND TableName = ? ORDER BY CurrentPerm DESC"

  // ------------------------------------------------------------ sampling

  /** Clamp a human percentage (0-100) to Teradata's open (0,1) SAMPLE
    * fraction (`teradata_offload_source_table.py:482-508`). */
  def sampleFraction(pct: Double): Double =
    if (pct < 0) SampleMinFraction
    else if (pct >= 100) SampleMaxFraction
    else pct / 100

  /** `SAMPLE f` rides at the end of the query — Teradata samples rows,
    * where the MSSQL family would TOP-N instead
    * (`teradata_offload_source_table.py:519-520`). */
  def sampleClause(pct: Double): String = {
    val f = BigDecimal(sampleFraction(pct)).underlying.stripTrailingZeros
    s"SAMPLE ${f.toPlainString}"
  }

  /** Sampled column bounds — drives decimal precision/scale inference when
    * stats are absent (`teradata_offload_source_table.py:191-225`). */
  def lowHighValuesSql(column: String, ownerTable: String,
                       pct: Double): String =
    s"""SELECT MIN(${column.toUpperCase})
       |,      MAX(${column.toUpperCase})
       |FROM   $ownerTable
       |${sampleClause(pct)}""".stripMargin

  /** TOP-1 existence probes — partition and predicate
    * (`teradata_offload_source_table.py:849-871`). */
  def partitionHasRowsSql(ownerTable: String, partitionNo: Int): String =
    s"SELECT TOP 1 1 FROM $ownerTable WHERE PARTITION = $partitionNo"
  def predicateHasRowsSql(ownerTable: String, whereClause: String): String =
    s"SELECT TOP 1 1 FROM $ownerTable WHERE ($whereClause)"

  /** Column min/max for id-range splitting
    * (`teradata_offload_transport_rdbms_api.py:151-197`). */
  def idRangeSql(column: String, ownerTable: String,
                 predicate: Option[String]): String = {
    val where = predicate.map(p => s" WHERE $p").getOrElse("")
    s"SELECT MIN($column), MAX($column) FROM $ownerTable$where"
  }

  // ------------------------------------------------------ split planning

  sealed trait SplitType { def name: String }
  object SplitType {
    case object Partition extends SplitType { val name = "partition" }
    case object IdRange extends SplitType { val name = "id_range" }
    case object NativeRange extends SplitType { val name = "native_range" }
    case object Amp extends SplitType { val name = "amp" }
    case object HashAmp extends SplitType { val name = "hashamp" }
  }

  /** The split-type decision ladder
    * (`teradata_offload_transport_rdbms_api.py:301-405`):
    * 1. enough partitions to feed every thread → split by partition;
    * 2. a partition/predicate filter + a primary index + enough AMPs →
    *    HASHAMP (an AMP filter can't combine with a WHERE, HASHROW can);
    * 3. single numeric/date PK → id ranges (native ranges when the
    *    transport supports them);
    * 4. filter + primary index but few AMPs → HASHAMP, parallelism tuned
    *    down to the AMP count;
    * 5. unfiltered, no PK → whole-AMP scan via TDAMPCOPY, tuned down;
    * 6. otherwise partition split with parallelism = partition count.
    * Returns (splitType, tunedParallelism). */
  def chooseSplitType(partitionCount: Int, parallelism: Int, ampCount: Int,
                      hasPrimaryIndex: Boolean, hasPredicate: Boolean,
                      idSplitNumeric: Boolean,
                      nativeRangeAvailable: Boolean = false)
      : (SplitType, Int) = {
    val hashAmpAvailable =
      (partitionCount > 0 || hasPredicate) && hasPrimaryIndex
    if (partitionCount > 0 && partitionCount >= parallelism)
      (SplitType.Partition, parallelism)
    else if (hashAmpAvailable && ampCount >= parallelism)
      (SplitType.HashAmp, parallelism)
    else if (idSplitNumeric && nativeRangeAvailable)
      (SplitType.NativeRange, parallelism)
    else if (idSplitNumeric)
      (SplitType.IdRange, parallelism)
    else if (hashAmpAvailable)
      (SplitType.HashAmp, ampCount)
    else if (partitionCount == 0 && !hasPredicate)
      (SplitType.Amp, ampCount)
    else
      (SplitType.Partition, partitionCount)
  }

  /** Non-overlapping `[low, high)` id ranges covering [min, max]
    * (`offload_transport_functions.py:408-428`); BigDecimal end to end so
    * precision never truncates a boundary. */
  def splitRangesForIdRange(idMin: BigDecimal, idMax: BigDecimal,
                            parallelism: Int): Seq[(BigDecimal, BigDecimal)] = {
    require(parallelism > 0)
    val delta = (idMax - idMin + 1) / parallelism
    (0 until parallelism).map { i =>
      (idMin + delta * i, idMin + delta * i + delta)
    }
  }

  /** Round-robin a value list into `parallelism` CSV groups
    * (`offload_transport_functions.py:431-470`); empty groups drop. */
  def splitListsRoundRobin(values: Seq[String],
                           parallelism: Int): Seq[String] = {
    require(parallelism > 0)
    (0 until parallelism)
      .map(i => values.drop(i).grouped(parallelism).map(_.head).mkString(","))
      .filter(_.nonEmpty)
  }

  /** Render the transport row-source query: UNION ALL branches, one batch
    * id per thread, exactly the shapes of
    * `teradata_offload_transport_rdbms_api.py:407-560`. The result is a
    * single SELECT suitable for `JdbcSplit` predicate reads (each branch's
    * WHERE also stands alone as a split predicate). */
  def rowSourceQuery(split: SplitType, ownerTable: String, parallelism: Int,
                     pseudoColumn: String = "PARTITION#L1",
                     partitionNumbers: Seq[Int] = Nil,
                     idSplitColumn: Option[String] = None,
                     idMin: BigDecimal = 0, idMax: BigDecimal = 0,
                     ampIds: Seq[Int] = Nil,
                     primaryIndexColumns: Seq[String] = Nil,
                     predicate: Option[String] = None): String = {
    val unionAll = " UNION ALL "
    def partitionFilter(op: String): String =
      if (partitionNumbers.nonEmpty)
        s" $op $pseudoColumn IN (${partitionNumbers.mkString(",")})"
      else ""
    def predFilter: String =
      predicate.map(p => s" AND ($p)").getOrElse("")
    split match {
      case SplitType.Partition =>
        val csvs = splitListsRoundRobin(
          partitionNumbers.map(_.toString), parallelism)
        csvs.zipWithIndex.map { case (csv, i) =>
          s"SELECT g.*, ${i % parallelism} AS $BatchColumn FROM $ownerTable g" +
            s" WHERE $pseudoColumn IN ($csv)"
        }.mkString(unionAll)
      case SplitType.NativeRange =>
        val col = idSplitColumn.getOrElse(
          throw new IllegalArgumentException("native_range needs an id column"))
        s"SELECT g.*, $col AS $BatchColumn FROM $ownerTable g" +
          predicate.map(p => s" WHERE ($p)").getOrElse("")
      case SplitType.IdRange =>
        val col = idSplitColumn.getOrElse(
          throw new IllegalArgumentException("id_range needs an id column"))
        splitRangesForIdRange(idMin, idMax, parallelism).zipWithIndex.map {
          case ((lo, hi), i) =>
            s"SELECT g.*, ${i % parallelism} AS $BatchColumn FROM $ownerTable g" +
              s" WHERE $col >= $lo AND $col < $hi" +
              partitionFilter("AND") + predFilter
        }.mkString(unionAll)
      case SplitType.Amp =>
        val csvs = splitListsRoundRobin(ampIds.map(_.toString), parallelism)
        csvs.zipWithIndex.map { case (csv, i) =>
          s"SELECT g.*, ${i % parallelism} AS $BatchColumn" +
            s" FROM TDAMPCOPY(ON $ownerTable USING AMPList($csv)) AS g"
        }.mkString(unionAll)
      case SplitType.HashAmp =>
        // the reference's template compares HASHAMP(...) to the batch id,
        // which strands rows on AMPs >= parallelism; rendering the batch's
        // whole round-robin AMP group as an IN-list keeps the same split
        // shape with full coverage
        require(primaryIndexColumns.nonEmpty, "hashamp needs PI columns")
        val piCsv = primaryIndexColumns.mkString(",")
        val csvs = splitListsRoundRobin(ampIds.map(_.toString), parallelism)
        csvs.zipWithIndex.map { case (csv, i) =>
          s"SELECT g.*, ${i % parallelism} AS $BatchColumn FROM $ownerTable g" +
            s" WHERE HASHAMP(HASHBUCKET(HASHROW($piCsv))) IN ($csv)" +
            partitionFilter("AND") + predFilter
        }.mkString(unionAll)
    }
  }
}
