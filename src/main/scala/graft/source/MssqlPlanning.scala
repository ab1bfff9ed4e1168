package graft.source

/** SQL Server source-table planning surface: partition/row-count
  * introspection over `sys.*` catalogs, statistics-driven hash-bucket
  * choice and TOP-N probes as renderable SQL text.
  *
  * Re-expresses the reference's MSSQL planning layer —
  * `microsoft/mssql_offload_source_table.py:177-330` (table details +
  * density-vector hash-bucket candidate) and
  * `microsoft/mssql_frontend_api.py:364-655` (catalog queries). Where the
  * reference raises NotImplementedError (partition enumeration, sampling
  * clause, transport splits), this object documents the same boundary
  * rather than inventing behavior the reference never had: MSSQL tables
  * plan as single-partition sources whose splits come from the generic
  * [[JdbcSplit]] MOD/id-range machinery, and row sampling is TOP-N
  * (`SELECT TOP n`) because T-SQL's TABLESAMPLE is page-level and
  * non-uniform — the "TOP-N vs SAMPLE" split against Teradata.
  *
  * Column typing composes with [[graft.types.FrontendTypes.mssql]];
  * predicate text with [[graft.predicate.DialectRenderers]] (`Synapse`
  * dialect — same T-SQL surface).
  */
object MssqlPlanning {

  /** Partition count + row count from `sys.partitions`
    * (`mssql_offload_source_table.py:180-205`). Binds: schema, table. */
  val tableDetailsSql: String =
    """WITH partitions AS (
      |    SELECT DISTINCT partition_number
      |    ,      rows
      |    FROM   sys.tables       t
      |           INNER JOIN
      |           sys.partitions   p
      |           ON (p.object_id = t.object_id)
      |           INNER JOIN
      |           sys.schemas      s
      |           ON (t.schema_id = s.schema_id)
      |    WHERE  s.name = ?
      |    AND    t.name = ?
      |    )
      |SELECT NULL             AS iot_type
      |,      SUM(rows)        AS num_rows
      |,      CASE
      |         WHEN MAX(partition_number) > 1
      |         THEN 'YES'
      |         ELSE 'NO'
      |       END              AS partitioned
      |,      NULL             AS partitioning_type
      |FROM partitions""".stripMargin

  /** Primary-key columns — id-range split candidates
    * (`mssql_frontend_api.py:518-539`). Binds: schema, table. */
  val primaryKeyColumnsSql: String =
    """SELECT COL_NAME(ic.object_id, ic.column_id) AS column_name
      |FROM   sys.tables           t
      |       INNER JOIN
      |       sys.indexes          i
      |       ON (t.object_id = i.object_id)
      |       INNER JOIN
      |       sys.index_columns    ic
      |       ON (     i.object_id = ic.object_id
      |           AND  i.index_id  = ic.index_id)
      |       INNER JOIN
      |       sys.schemas          s
      |       ON (t.schema_id    = s.schema_id)
      |WHERE  s.name = ?
      |AND    t.name = ?
      |AND    i.is_primary_key = 1
      |ORDER BY ic.column_id""".stripMargin

  /** Column catalog, ordinal order (`mssql_frontend_api.py:430-455`);
    * rows feed [[graft.types.FrontendTypes.mssql]]. Binds: schema,
    * table. */
  val columnsSql: String =
    """SELECT column_name
      |,      ordinal_position                                 AS column_id
      |,      is_nullable                                      AS nullable
      |,      data_type
      |,      COALESCE(numeric_precision, datetime_precision)  AS data_precision
      |,      numeric_scale                                    AS data_scale
      |,      character_octet_length                           AS byte_length
      |,      column_default                                   AS data_default
      |,      NULL                                             AS hidden_columns
      |,      character_maximum_length                         AS char_length
      |FROM   information_schema.columns
      |WHERE  table_schema = ?
      |AND    table_name   = ?
      |ORDER BY
      |       ordinal_position""".stripMargin

  /** Statistics objects on a table — first leg of the hash-bucket choice
    * (`mssql_offload_source_table.py:227-246`). */
  def autostatsSql(schema: String, table: String): String =
    s"""SP_AUTOSTATS "$schema.$table""""

  /** Density vector for one statistics object — second leg; the "All
    * density" value closest to 0 wins
    * (`mssql_offload_source_table.py:246-268`). */
  def densityVectorSql(schema: String, table: String,
                       statsName: String): String =
    s"""DBCC SHOW_STATISTICS ("$schema.$table", $statsName) WITH DENSITY_VECTOR"""

  /** Pick the bucket column from density-vector rows of
    * `(density, avgLength, columnsCsv)`: single-column statistics only,
    * lowest density (0 = unique, 1 = constant); None when no statistics
    * exist and the caller falls back to the first table column —
    * the reference's exact selection loop
    * (`mssql_offload_source_table.py:246-268`). */
  def chooseHashBucket(
      densityRows: Seq[(Double, Double, String)]): Option[String] =
    densityRows
      .filter(r => !r._3.contains(","))
      .minByOption(_._1)
      .map(_._3)

  /** Existence/liveness probes. T-SQL row limiting is TOP-N syntax —
    * MSSQL has no row-uniform SAMPLE clause
    * (`mssql_offload_transport_rdbms_api.py:171-172`,
    * `mssql_offload_source_table.py:317-318` returns an empty sample
    * clause). */
  val canarySql: String = "SELECT 1"
  val versionSql: String = "SELECT @@VERSION"
  def predicateHasRowsSql(ownerTable: String, whereClause: String): String =
    s"SELECT TOP 1 1 FROM $ownerTable WHERE ($whereClause)"

  /** The sampling clause is empty on MSSQL — sampling happens by TOP-N
    * projection instead (see [[topNSampleSql]]). */
  val sampleClause: String = ""

  /** TOP-N row sample for type inference: deterministic-enough uniform
    * prefix, the MSSQL stand-in for Teradata's `SAMPLE f`. */
  def topNSampleSql(projection: String, ownerTable: String, n: Long): String =
    graft.predicate.DialectRenderers.limitSelect(
      graft.predicate.DialectRenderers.Synapse,
      projection, ownerTable, None, n)

  /** Column min/max for id-range splitting — the generic splitter's probe
    * shape over the T-SQL dialect. */
  def idRangeSql(column: String, ownerTable: String,
                 predicate: Option[String]): String = {
    val where = predicate.map(p => s" WHERE $p").getOrElse("")
    s"SELECT MIN($column), MAX($column) FROM $ownerTable$where"
  }

  /** MOD-split branch predicates for the generic [[JdbcSplit.ModHash]]
    * path rendered in T-SQL (`%` operator; ABS guards signed keys):
    * MSSQL has no partition/AMP transport splits in the reference, so
    * hash-mod on a key column is the parallel-extraction shape. */
  def modSplitPredicates(column: String, buckets: Int): Seq[String] = {
    require(buckets > 0)
    (0 until buckets).map(b => s"ABS($column) % $buckets = $b")
  }
}
