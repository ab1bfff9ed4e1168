package graft.plan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two key columns so
  * that sorting by the combined value gives file-level locality on BOTH
  * dimensions at once — the multi-dimensional generalisation of the
  * reference's single-column sort/cluster controls
  * (`offload/offload_transport.py` sort columns; BigQuery CLUSTER BY caps
  * at linear clustering).
  *
  * Why it matters at 100 TB: partitioning prunes on one axis; sort columns
  * prune row groups on a second, but only lexicographically — a filter on
  * the second sort column alone skips nothing. Z-ordering bounds BOTH
  * columns' min/max per file, so a box predicate (`a BETWEEN .. AND b
  * BETWEEN ..`) skips every file whose z-range misses the box, whichever
  * axis the filter uses.
  *
  * The interleave is the classic magic-number bit spread — five shift/mask
  * ops per column, pure codegen'd integer arithmetic (no loop, no UDF), and
  * the same five ops run verbatim in the DuckDB oracle.
  */
object ZOrder {

  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 32 bits of `c` into the even bit positions of a Long. */
  def spread(c: Column): Column =
    Masks.foldLeft(c.cast("long").bitwiseAND(lit(0xFFFFFFFFL))) {
      case (x, (s, m)) => (x.bitwiseOR(shiftleft(x, s))).bitwiseAND(lit(m))
    }

  /** SQL rendering of [[spread]] for cross-engine parity (DuckDB oracle). */
  def spreadSql(expr: String): String =
    Masks.foldLeft(s"($expr & ${0xFFFFFFFFL})") {
      case (x, (s, m)) => s"(($x | ($x << $s)) & $m)"
    }

  /** Morton code of two non-negative 32-bit keys: `a` in odd bit
    * positions, `b` in even. Monotone locality: nearby (a,b) points get
    * nearby z-values. */
  def zvalue2(a: Column, b: Column): Column =
    shiftleft(spread(a), 1).bitwiseOR(spread(b))

  def zvalue2Sql(a: String, b: String): String =
    s"((${spreadSql(a)} << 1) | ${spreadSql(b)})"

  /** Rewrite `df` into `numFiles` z-ordered files: range-partition on the
    * z-value (equal-frequency cuts via Spark's range partitioner sampling)
    * and sort inside each partition, so every output file covers a tight
    * z-range — tight min/max on BOTH key columns in the parquet footer.
    * One shuffle, standard write path. */
  def zorderWrite(df: DataFrame, a: String, b: String, path: String,
                  numFiles: Int): Unit = {
    val z = zvalue2(col(a), col(b)).as("_zorder_tmp")
    df.withColumn("_zorder_tmp", z)
      .repartitionByRange(numFiles, col("_zorder_tmp"))
      .sortWithinPartitions(col("_zorder_tmp"))
      .drop("_zorder_tmp")
      .write.mode("overwrite").parquet(path)
  }
}
