package graft.source

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table/partition statistics used by the planners (reference
  * `bigquery_backend_api.py:1678-1811` table stats fetch, stats-driven
  * decisions in `offload_source_table.py:774-858`): row counts, sizes, and
  * per-synthetic-partition profiles — each one aggregate job, no collect
  * loops. */
object TableStats {

  final case class Stats(rows: Long, bytes: Long, files: Int)

  /** File-level stats for a parquet path (cheap: filesystem metadata +
    * parquet footer row counts via count over the scan). */
  def forPath(spark: SparkSession, path: String): Stats = {
    val p = Paths.get(path)
    val files =
      if (Files.isDirectory(p))
        Files.walk(p).iterator().asScala
          .filter(f => Files.isRegularFile(f) &&
            !f.getFileName.toString.startsWith("_")).toSeq
      else Seq(p)
    val bytes = files.map(Files.size).sum
    // parquet count() is metadata-only (no data scan)
    val rows = spark.read.parquet(path).count()
    Stats(rows, bytes, files.length)
  }

  /** Per-partition-key profile: rows + an approximate byte share. Feeds the
    * chunker (`PartitionPlanner.chunk`) with real sizes. */
  def partitionProfile(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("rows"))
      .orderBy(col(keyCol))

  /** Equi-height quantile profile of a numeric column per key — the
    * histogram boundaries the reference's stats layer stops short of
    * (it gathers only low/high), and what chunk sizing and skew detection
    * actually want. `exact=true` uses `percentile` (sort-in-buffer, fine
    * at planning scale and oracle-matchable); at 100 TB pass
    * `exact=false` for `approx_percentile` — same call shape, map-side
    * sketch merge, no full sort. */
  def quantileProfile(df: DataFrame, valueCol: String, keyCol: String,
                      ps: Seq[Double] = Seq(0.25, 0.5, 0.75, 0.95),
                      exact: Boolean = true): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p < 1))
    val aggs = ps.map { p =>
      val label = s"p${(p * 100).round}"
      val c =
        if (exact) expr(s"percentile($valueCol, $p)")
        else expr(s"approx_percentile($valueCol, $p, 10000)")
      c.as(label)
    }
    val allAggs = count(lit(1)).as("n") +: aggs
    df.groupBy(col(keyCol))
      .agg(allAggs.head, allAggs.tail: _*)
      .orderBy(col(keyCol))
  }

  /** Collect the full copyable stats record in TWO aggregate jobs (one
    * table/column pyramid, one partition profile) — the Spark-native
    * restatement of the reference's stats gather
    * (`util/hive_table_stats.py`: `num_rows/num_bytes/avg_row_len` +
    * per-column `ndv/num_nulls/avg_col_len/low_val/high_val`). Partition
    * bytes are estimated as `rows × avg_row_len` exactly like the
    * reference's `num_bytes += num_rows * avg_col_len` derivation — stats
    * feed PLANNING (chunk sizing), not billing, so the estimate is the
    * right cost/accuracy trade. `partitionKey` maps the key column to its
    * rendered sortable literal (e.g. `date_format(c, "yyyy-MM")`). */
  def collectStats(df: DataFrame, table: String,
                   partitionKey: Option[org.apache.spark.sql.Column] = None,
                   approxNdv: Boolean = true)
      : graft.meta.TableStatsRecord = {
    import graft.meta.{ColumnStatsRec, PartitionStatsRec, TableStatsRecord}
    val cols = df.columns.toSeq
    val aggs = Seq(count(lit(1)).as("__rows")) ++ cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(
        (if (approxNdv) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"${c}__ndv"),
        sum(col(c).isNull.cast("long")).as(s"${c}__nulls"),
        avg(length(s)).as(s"${c}__len"),
        min(s).as(s"${c}__low"),
        max(s).as(s"${c}__high"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val numRows = row.getLong(row.fieldIndex("__rows"))
    def lng(n: String): Long =
      if (row.isNullAt(row.fieldIndex(n))) 0L
      else row.getLong(row.fieldIndex(n))
    def dbl(n: String): Double =
      if (row.isNullAt(row.fieldIndex(n))) 0.0
      else row.getDouble(row.fieldIndex(n))
    def str(n: String): String =
      if (row.isNullAt(row.fieldIndex(n))) ""
      else row.getString(row.fieldIndex(n))
    val colStats = cols.map { c =>
      ColumnStatsRec(c, lng(s"${c}__ndv"), lng(s"${c}__nulls"),
        dbl(s"${c}__len"), str(s"${c}__low"), str(s"${c}__high"))
    }
    val avgRowLen = colStats.map(_.avgColLen).sum
    val parts = partitionKey.map { key =>
      df.groupBy(key.cast("string").as("__pk"))
        .agg(count(lit(1)).as("__n"))
        .orderBy(col("__pk"))
        .collect()
        .map { r =>
          val k = r.getString(0)
          val n = r.getLong(1)
          PartitionStatsRec(s"p_$k", k, n, (n * avgRowLen).toLong)
        }.toSeq
    }.getOrElse(Nil)
    TableStatsRecord(table, numRows, (numRows * avgRowLen).toLong, avgRowLen,
      colStats, parts)
  }

  /** Pick the split/bucket column: highest NDV among candidates, one
    * aggregate job (reference `goe.py:2121-2154`). Exact NDV for small
    * candidate sets; `approx` flips to HLL for very wide scans. */
  def chooseBucketColumn(df: DataFrame, candidates: Seq[String],
                         approx: Boolean = false): String = {
    require(candidates.nonEmpty)
    val aggs = candidates.map { c =>
      (if (approx) approx_count_distinct(col(c))
       else countDistinct(col(c))).as(c)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    candidates.maxBy(c => row.getLong(row.fieldIndex(c)))
  }
}
