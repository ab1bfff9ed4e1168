package graft.sink

import org.apache.spark.sql.DataFrame

/** Bucketed-table landing — the co-located-join primitive. Two tables
  * bucketed on their join key with the SAME bucket count join with NO
  * shuffle on either side: the bucket id IS the partition assignment, so
  * Spark's planner drops both Exchanges (and both Sorts, when `sortBy`
  * matches the join key). At 100 TB this converts every recurring
  * fact⋈fact join on a landed key from two full shuffles to zero — the
  * single biggest recurring-cost saving a warehouse layout decision buys.
  *
  * The reference picks bucket-hash columns by NDV (`TableStats`, SURVEY
  * §2.3) but delegates physical bucketing to its backends; here the
  * landing itself is expressed with Spark's native `bucketBy`, which
  * persists bucket metadata in the catalog so EVERY later reader benefits
  * without re-declaring anything. `BucketingSpec` machine-checks the
  * no-Exchange property.
  */
object Bucketing {

  /** Land `df` as a bucketed (optionally bucket-sorted) EXTERNAL table:
    * catalog entry `table`, files under `path`. Bucket count is a layout
    * contract — readers only get shuffle-free joins between tables that
    * agree on it, so fix it fleet-wide per key domain. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, buckets: Int,
                    sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }
}
