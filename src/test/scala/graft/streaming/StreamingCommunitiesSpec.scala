package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Graph

/** The community view over StreamingRank's exactly-once edge store:
  * every refresh equals the batch LPA operator over the accumulated
  * committed edges (no warm-start law exists for LPA, so cold
  * equivalence IS the contract), and the labels relation follows the
  * SwapDir read/write discipline. */
class StreamingCommunitiesSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(base: String) = StreamingRank.Config(
    storeDir = s"$base/store", checkpointDir = s"$base/ckpt",
    buckets = 4)

  private def labelMap(c: StreamingRank.Config): Map[Long, Long] =
    StreamingCommunities.communities(spark, c).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def batchLpa(c: StreamingRank.Config,
      rounds: Int): Map[Long, Long] =
    Graph.labelPropagation(
      StreamingRank.edges(spark, c).select(col("a"), col("b")), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // two triangles bridged by one edge, delivered across two batches
  private val batch0 = Seq(Pair(1, 2), Pair(2, 3), Pair(1, 3))
  private val batch1 = Seq(Pair(4, 5), Pair(4, 6), Pair(5, 6),
    Pair(3, 4))

  test("every refresh equals batch LPA over the accumulated committed " +
      "edges; more batches re-derive, never drift") {
    val c = cfg(Files.createTempDirectory("scomm").toString)
    StreamingRank.ingestBatch(batch0.toDF(), 0L, c)
    StreamingCommunities.refresh(spark, c)
    assert(labelMap(c) === batchLpa(c, 4))
    // one triangle: a single community
    assert(labelMap(c).values.toSet.size === 1)
    StreamingRank.ingestBatch(batch1.toDF(), 1L, c)
    StreamingCommunities.refresh(spark, c)
    assert(labelMap(c) === batchLpa(c, 4))
    // bridged triangles: LPA keeps the two families apart
    val got = labelMap(c)
    assert(got.values.toSet.size === 2)
    assert(Set(got(1L), got(2L), got(3L)).size === 1)
    assert(Set(got(4L), got(5L), got(6L)).size === 1)
  }

  test("labels and ranks are two views over ONE edge store") {
    val c = cfg(Files.createTempDirectory("scomm_two").toString)
    StreamingRank.ingestBatch(batch0.toDF(), 0L, c)
    StreamingRank.ingestBatch(batch1.toDF(), 1L, c)
    StreamingRank.refreshRanks(spark, c)
    StreamingCommunities.refresh(spark, c)
    val ranked = StreamingRank.ranks(spark, c).collect()
      .map(_.getLong(0)).toSet
    assert(labelMap(c).keySet === ranked,
      "both views must cover exactly the stored graph's nodes")
  }

  test("reads are swap-tolerant without healing; the aside generation " +
      "survives the swap and the next refresh reclaims it") {
    val c = cfg(Files.createTempDirectory("scomm_swap").toString)
    StreamingRank.ingestBatch(batch0.toDF(), 0L, c)
    StreamingCommunities.refresh(spark, c)
    val before = labelMap(c)
    val curP = new org.apache.hadoop.fs.Path(s"${c.storeDir}/labels")
    val oldP = new org.apache.hadoop.fs.Path(s"${c.storeDir}/labels__old")
    val fs = curP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the mid-swap window
    assert(fs.rename(curP, oldP))
    assert(labelMap(c) === before, "aside must serve the read")
    assert(!fs.exists(curP) && fs.exists(oldP),
      "a reader must never rename the aside back")
    // the next WRITER heals, installs, and retains the new aside
    StreamingCommunities.refresh(spark, c)
    assert(fs.exists(curP) && fs.exists(oldP))
    assert(labelMap(c) === before) // same edges -> same cold result
  }

  test("empty store: communities read is empty, refresh is a no-op") {
    val c = cfg(Files.createTempDirectory("scomm_empty").toString)
    assert(StreamingCommunities.communities(spark, c).isEmpty)
    StreamingCommunities.refresh(spark, c) // must not throw or write
    assert(!new java.io.File(s"${c.storeDir}/labels").exists())
  }
}
