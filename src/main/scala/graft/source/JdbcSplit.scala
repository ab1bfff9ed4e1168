package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC extraction split planner.
  *
  * The reference parallelises RDBMS extraction by generating one of several
  * split shapes (partition branches, rowid-extent ranges, MOD-hash, id-range
  * — `src/goe/offload/oracle/oracle_offload_transport_rdbms_api.py:537-810`)
  * and feeding them to a generated PySpark `spark.read.jdbc` job
  * (`offload_transport.py:1522-1809`). Spark-native restatement: the chooser
  * emits either `partitionColumn/lowerBound/upperBound/numPartitions` options
  * or an explicit `predicates` array — both make each Spark task open its own
  * JDBC cursor, which is exactly the reference's parallel-slice model. This
  * is a *reader-options planner*, deliberately outside Catalyst: Catalyst
  * cannot choose JDBC splits (SURVEY §4).
  *
  * Scale note: split count bounds extraction parallelism at the source; the
  * reference caps UNION branches at 1024 (`MAX_UNION_ALL_SPLITS`,
  * `oracle_offload_transport_rdbms_api.py:75`) and we keep the same cap on
  * the predicates array so a 100k-partition table doesn't open 100k cursors.
  */
object JdbcSplit {

  val MaxSplits = 1024

  sealed trait SplitSpec
  /** Native numeric range split: Spark computes the stride. */
  final case class IdRange(column: String, lower: Long, upper: Long,
                           numPartitions: Int) extends SplitSpec
  /** One predicate per slice (partition names, rowid ranges, custom). */
  final case class Predicates(preds: Seq[String]) extends SplitSpec
  /** MOD-hash on a numeric column. */
  final case class ModHash(column: String, buckets: Int) extends SplitSpec
  /** No split (small table — single cursor). */
  case object Single extends SplitSpec

  /** Choose a split strategy from available metadata, in the reference's
    * preference order (partition-based > id-range > mod-hash > single;
    * `oracle_offload_transport_rdbms_api.py:537-634` + small-table threshold
    * `offload_transport.py:376-422`). */
  def choose(
      tableBytes: Long,
      smallTableThreshold: Long,
      partitionPredicates: Seq[String],
      numericKey: Option[(String, Long, Long)],
      parallelism: Int): SplitSpec = {
    if (tableBytes <= smallTableThreshold) Single
    else if (partitionPredicates.nonEmpty)
      Predicates(capPredicates(partitionPredicates))
    else numericKey match {
      case Some((c, lo, hi)) if hi > lo => IdRange(c, lo, hi, parallelism)
      case Some((c, _, _)) => ModHash(c, parallelism)
      case None => Single
    }
  }

  /** Coalesce an over-long predicate list by OR-ing adjacent slices —
    * the 1024-branch cap. */
  def capPredicates(preds: Seq[String], cap: Int = MaxSplits): Seq[String] =
    if (preds.length <= cap) preds
    else {
      val per = math.ceil(preds.length.toDouble / cap).toInt
      preds.grouped(per).map(_.map(p => s"($p)").mkString(" OR ")).toSeq
    }

  /** Apply the split spec to a JDBC read. `table` may be a subquery alias:
    * `"(SELECT ... ) t"`. Session-init (NLS formats etc.) and fetch size ride
    * along as plain options (`oracle_..._rdbms_api.py:168-227`). */
  def read(spark: SparkSession, url: String, table: String, spec: SplitSpec,
           props: Map[String, String] = Map.empty): DataFrame = {
    val base = new java.util.Properties()
    props.foreach { case (k, v) => base.setProperty(k, v) }
    spec match {
      case Single =>
        spark.read.jdbc(url, table, base)
      case IdRange(c, lo, hi, n) =>
        spark.read.jdbc(url, table, c, lo, hi, n, base)
      case Predicates(preds) =>
        spark.read.jdbc(url, table, preds.toArray, base)
      case ModHash(c, buckets) =>
        val preds = (0 until buckets).map(b => s"MOD(ABS($c), $buckets) = $b")
        spark.read.jdbc(url, table, preds.toArray, base)
    }
  }

  /** Preset-shaped read: the Oracle session preset compiles to
    * `sessionInitStatement`/`fetchsize`/`customSchema` reader options
    * (executed once per split cursor — `OracleSession` scaladoc), merged
    * under any explicit `props` so callers can still override. */
  def read(spark: SparkSession, url: String, table: String, spec: SplitSpec,
           preset: OracleSession.Preset, props: Map[String, String])
      : DataFrame =
    read(spark, url, table, spec, OracleSession.readOptions(preset) ++ props)

  /** Wrap a source query in a consistent-snapshot clause (Oracle flashback
    * `AS OF SCN`, captured once per offload —
    * `oracle_offload_transport_rdbms_api.py:636-645`). Kept as text because
    * it is necessarily source-dialect SQL. */
  def asOfScn(table: String, scn: Long): String =
    s"(SELECT * FROM $table AS OF SCN $scn) goe_snap"
}
