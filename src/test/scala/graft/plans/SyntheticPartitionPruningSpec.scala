package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plan.SyntheticPartition

class SyntheticPartitionPruningSpec extends SparkSpec {

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      Seq(SyntheticPartitionPruning)
    try body
    finally spark.experimental.extraOptimizations = Nil
  }

  /** Execute THIS dataframe's plan (collect, not count — count builds a new
    * plan whose metrics we can't see) and report partitions scanned. */
  private def scannedPartitions(df: DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    scans.map(_.metrics.get("numPartitions")
      .map(_.value).getOrElse(0L)).sum
  }

  private def partitionFilters(df: DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s.partitionFilters.map(_.sql)
    }.flatten

  private lazy val monthTablePath: String = {
    val base = Files.createTempDirectory("graft_prune_spec").toString
    graft.Tables.load(spark, sf("sf0.001"), "orders")
      .withColumn("goe_part_m_o_orderdate",
        SyntheticPartition.dateStringKey(col("o_orderdate"), "M"))
      .write.partitionBy("goe_part_m_o_orderdate").parquet(s"$base/orders")
    s"$base/orders"
  }

  test("filter on source date column prunes synthetic month partitions") {
    val table = spark.read.parquet(monthTablePath)
    val cut = lit("1999-06-15 00:00:00").cast("timestamp")

    val without = table.filter(col("o_orderdate") >= cut)
    val withoutCount = without.count()

    val (withCount, scanned, filters) = withRule {
      val pruned = table.filter(col("o_orderdate") >= cut)
      (pruned.count(), scannedPartitions(pruned), partitionFilters(pruned))
    }
    val total = scannedPartitions(without)
    assert(withCount == withoutCount)     // correctness: no rows lost
    assert(withCount > 0)
    assert(filters.exists(_.contains("goe_part_m_o_orderdate")),
      s"derived predicate missing from scan: $filters")
    assert(scanned < total,               // efficiency: partitions skipped
      s"expected pruning: scanned $scanned of $total partitions")
  }

  test("equality filter prunes to a single month") {
    val table = spark.read.parquet(monthTablePath)
    val day = lit("1997-03-03 00:00:00").cast("timestamp")
    withRule {
      val pruned = table.filter(col("o_orderdate") === day)
      val plain = graft.Tables.load(spark, sf("sf0.001"), "orders")
        .filter(col("o_orderdate") === day)
      assert(pruned.count() == plain.count())
      assert(scannedPartitions(pruned) <= 1)
    }
  }

  test("numeric range-bucket injection derives the bucket literal") {
    val base = Files.createTempDirectory("graft_prune_num").toString
    graft.Tables.load(spark, sf("sf0.001"), "orders")
      .withColumn("goe_part_50000_o_totalprice",
        SyntheticPartition.numericRangeKey(col("o_totalprice"), 50000L))
      .write.partitionBy("goe_part_50000_o_totalprice").parquet(s"$base/t")
    val table = spark.read.parquet(s"$base/t")
    withRule {
      val pruned = table.filter(col("o_totalprice") > 300000.0)
      val plain = graft.Tables.load(spark, sf("sf0.001"), "orders")
        .filter(col("o_totalprice") > 300000.0)
      assert(pruned.count() == plain.count())
      val all = table.count()
      assert(pruned.count() < all)
      assert(partitionFilters(pruned)
        .exists(_.contains("goe_part_50000_o_totalprice")))
      assert(scannedPartitions(pruned) <
        scannedPartitions(table.filter(col("o_totalprice") > 0.0)))
    }
  }

  test("timestamp literal conversion honors the session timezone") {
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val base = Files.createTempDirectory("graft_prune_tz").toString
      // 1710054000 = 2024-03-10 07:00 UTC = 2024-03-09 23:00 LA; the
      // physical date key (date_format, session TZ) is therefore
      // 2024-03-09 — a UTC-converted injected literal would say
      // 2024-03-10 and prune away the matching row.
      val df = spark.range(1)
        .select(timestamp_seconds(lit(1710054000L)).as("ts"),
          lit(1L).as("v"))
        .withColumn("goe_part_d_ts",
          SyntheticPartition.dateStringKey(col("ts"), "D"))
      df.write.partitionBy("goe_part_d_ts").parquet(s"$base/t")
      val table = spark.read.parquet(s"$base/t")
      withRule {
        val q = table.filter(
          col("ts") === timestamp_seconds(lit(1710054000L)))
        assert(q.count() == 1)
        assert(partitionFilters(q).exists(_.contains("2024-03-09")),
          s"expected session-TZ date key in: ${partitionFilters(q)}")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("rule is idempotent and ignores unrelated filters") {
    val table = spark.read.parquet(monthTablePath)
    withRule {
      val q = table.filter(col("o_custkey") > 10L)
      assert(q.count() > 0) // no source/synth match: must not rewrite
      val once = SyntheticPartitionPruning(q.queryExecution.analyzed)
      val twice = SyntheticPartitionPruning(once)
      assert(once.sameResult(twice))
    }
  }
}
