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
