package graft.meta

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plan.PartitionPlanner
import graft.source.TableStats

class StatsStoreSpec extends SparkSpec {

  test("collected stats round-trip through the store") {
    val base = Files.createTempDirectory("graft_stats").toString
    val li = graft.Tables.load(spark, sf("sf0.001"), "lineitem")
    val rec = TableStats.collectStats(li, "lineitem",
      partitionKey = Some(date_format(col("l_shipdate"), "yyyy-MM")))
    assert(rec.numRows == li.count())
    assert(rec.columns.length == li.columns.length)
    assert(rec.partitions.nonEmpty)
    assert(rec.partitions.map(_.rows).sum == rec.numRows)
    val qty = rec.columns.find(_.name == "l_quantity").get
    assert(qty.ndv > 0 && qty.numNulls == 0 && qty.avgColLen > 0)
    assert(qty.lowValue.nonEmpty && qty.highValue.nonEmpty)
    StatsStore.save(base, rec)
    assert(StatsStore.load(base, "lineitem").contains(rec))
  }

  test("chunk planning consumes copied stats with no data scan") {
    val base = Files.createTempDirectory("graft_stats2").toString
    val li = graft.Tables.load(spark, sf("sf0.001"), "lineitem")
    val monthKey = date_format(col("l_shipdate"), "yyyy-MM")
    StatsStore.save(base, TableStats.collectStats(li, "lineitem",
      partitionKey = Some(monthKey)))

    // From here on: metadata only. The planner input comes from the store.
    val copied = StatsStore.load(base, "lineitem").get
    val chunks = StatsStore.chunkFromStats(copied,
      maxBytes = Long.MaxValue, maxCount = 12)
    assert(chunks.nonEmpty && chunks.forall(_.partitions.length <= 12))
    assert(chunks.map(_.rows).sum == copied.numRows)

    // parity with a live profile: same partition keys, same row counts —
    // the copy is a faithful substitute for the scan
    val live = li.groupBy(monthKey.as("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(copied.partitions.map(p => (p.highValue, p.rows)) == live)
    // row-capped chunking from stats matches chunking from the live profile
    val liveCatalog = live.zipWithIndex.map { case ((k, n), i) =>
      graft.plan.SourcePartition(s"p_$k", i,
        Seq(graft.plan.Boundary.Value(k)), bytes = n, rows = n)
    }
    val byRowsCopied = PartitionPlanner.chunk(
      StatsStore.toCatalog(copied).map(p => p.copy(bytes = p.rows)),
      maxBytes = 2000L, maxCount = Int.MaxValue)
    val byRowsLive = PartitionPlanner.chunk(liveCatalog.map(p =>
      p.copy(bytes = p.rows)), maxBytes = 2000L, maxCount = Int.MaxValue)
    assert(byRowsCopied.map(_.names) == byRowsLive.map(_.names))
  }

  test("additive merge accumulates an incremental append") {
    val base = TableStatsRecord("t", numRows = 100, numBytes = 1000,
      avgRowLen = 10.0,
      columns = Seq(ColumnStatsRec("k", 50, 2, 4.0, "a", "m")),
      partitions = Seq(
        PartitionStatsRec("p1", "1996-01", 60, 600),
        PartitionStatsRec("p2", "1996-02", 40, 400)))
    val delta = TableStatsRecord("t", numRows = 50, numBytes = 500,
      avgRowLen = 10.0,
      columns = Seq(ColumnStatsRec("k", 70, 1, 6.0, "c", "z")),
      partitions = Seq(
        PartitionStatsRec("p2", "1996-02", 10, 100), // existing part grows
        PartitionStatsRec("p3", "1996-03", 40, 400))) // new part appends
    val merged = StatsStore.additiveMerge(base, delta)
    assert(merged.numRows == 150 && merged.numBytes == 1500)
    assert(merged.partitions.map(p => (p.name, p.rows)) ==
      Seq(("p1", 60L), ("p2", 50L), ("p3", 40L)))
    val k = merged.columns.head
    assert(k.ndv == 70)          // widened, never shrunk
    assert(k.numNulls == 3)      // additive
    assert(k.lowValue == "a" && k.highValue == "z") // widened both ways
    assert(math.abs(k.avgColLen - (4.0 * 100 + 6.0 * 50) / 150) < 1e-9)
  }

  test("copied stats feed the status report's retention analysis") {
    val meta = OffloadMetadata("t", "/nope", "INCREMENTAL",
      incrementalKey = Seq("m"), incrementalHighValue = Seq("1996-02"))
    val rec = TableStatsRecord("t", 150, 1500, 10.0, Nil, Seq(
      PartitionStatsRec("p1", "1996-01", 60, 600),
      PartitionStatsRec("p2", "1996-02", 50, 500),
      PartitionStatsRec("p3", "1996-03", 40, 400)))
    val (reclaimable, retained) =
      graft.orchestrate.StatusReport.reclaim(meta, StatsStore.toCatalog(rec))
    assert(reclaimable.map(_.name) == Seq("p1", "p2"))
    assert(retained.map(_.name) == Seq("p3"))
  }
}
