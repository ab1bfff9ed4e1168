package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsExtras, CurationExtras, DsShapes, ExtraQueries, GoeQueries, GraphQueries, PipelineQueries, TpchShapes}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator inventory (one entry per implemented
  * operator from SURVEY §2 plus the pipeline extensions); `oracleSql` holds
  * the DuckDB-runnable equivalent for each SQL-expressible query. Queries
  * without an oracle entry (multimodal stub pipeline, offload E2E) get the
  * driver's rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    GoeQueries.defs ++ PipelineQueries.defs ++ ExtraQueries.defs ++
      TpchShapes.defs ++ CurationExtras.defs ++ AnalyticsExtras.defs ++
      DsShapes.defs ++ DsShapes.defs2 ++ GraphQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    GoeQueries.oracles ++ PipelineQueries.oracles ++ ExtraQueries.oracles ++
      TpchShapes.oracles ++ CurationExtras.oracles ++
      AnalyticsExtras.oracles ++ DsShapes.oracles ++ GraphQueries.oracles
}
