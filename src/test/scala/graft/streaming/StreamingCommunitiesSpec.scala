package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Graph

/** The community view over StreamingRank's exactly-once edge store:
  * every cold refresh equals the batch LPA operator over the
  * accumulated committed edges (no warm-start composition law exists
  * for LPA, so cold equivalence IS the default contract), the opt-in
  * warm start seeds from the previous generation (equal to cold on a
  * converged graph; fewer label flips on an incremental batch), and the
  * labels relation follows the SwapDir read/write discipline. */
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

  test("drift log: nothing after the first refresh, rand=1e6 for a " +
      "no-change refresh, < 1e6 when new edges reorganise the partition") {
    val c = cfg(Files.createTempDirectory("scomm_drift").toString)
    StreamingRank.ingestBatch(batch0.toDF(), 0L, c)
    StreamingCommunities.refresh(spark, c)
    // first refresh: no previous generation to compare against
    assert(StreamingCommunities.drift(spark, c).count() === 0L)
    // same edge set, refresh again: identical labels, perfect agreement
    StreamingCommunities.refresh(spark, c)
    val d1 = StreamingCommunities.drift(spark, c).collect()
    assert(d1.length === 1)
    assert(d1.head.getAs[Long]("refresh_seq") === 1L)
    assert(d1.head.getAs[Long]("rand_ppm") === 1000000L)
    assert(d1.head.getAs[Long]("n_nodes") === 3L)
    // HEAD columns (r14 ask #4): identical generations → every head
    // community shared, zero footrule, k = the community count (below
    // DriftK here)
    assert(d1.head.getAs[Long]("head_k") ===
      d1.head.getAs[Long]("head_overlap"))
    assert(d1.head.getAs[Long]("head_footrule") === 0L)
    // two separate families first (bridged triangles stay apart)...
    StreamingRank.ingestBatch(batch1.toDF(), 1L, c)
    StreamingCommunities.refresh(spark, c)
    val prevMap = labelMap(c)
    assert(prevMap.values.toSet.size === 2)
    // ...then dense cross edges fuse them: the partition of the six
    // SHARED nodes reorganises and the logged Rand index says so
    StreamingRank.ingestBatch(Seq(Pair(1, 4), Pair(1, 5), Pair(1, 6),
      Pair(2, 4), Pair(2, 5), Pair(2, 6), Pair(3, 5), Pair(3, 6))
      .toDF(), 2L, c)
    StreamingCommunities.refresh(spark, c)
    val newMap = labelMap(c)
    val last = StreamingCommunities.drift(spark, c).collect()
      .maxBy(_.getAs[Long]("refresh_seq"))
    assert(last.getAs[Long]("refresh_seq") === 3L)
    // drift is measured over the nodes present in BOTH generations
    val shared = (prevMap.keySet & newMap.keySet).toSeq.sorted
    assert(last.getAs[Long]("n_nodes") === shared.length.toLong)
    // the log is exactly the Rand index of the two generations
    val pairsAll = for {
      i <- shared.indices; j <- (i + 1) until shared.length
    } yield (shared(i), shared(j))
    val agree = pairsAll.count { case (x, y) =>
      (prevMap(x) == prevMap(y)) == (newMap(x) == newMap(y))
    }
    assert(last.getAs[Long]("rand_ppm") ===
      agree.toLong * 1000000L / pairsAll.length)
    // and it genuinely reports a reorganisation
    assert(last.getAs[Long]("rand_ppm") < 1000000L)
    // head columns on the reorganising refresh: the fused partition
    // has FEWER communities than the outgoing one, so the head ids
    // changed — overlap counts exactly the shared top-size ids and the
    // footrule is the exact Σ|position change| over them. Recompute
    // both from the label maps (size-desc, id-asc — the engine's
    // deterministic head order).
    def headIds(m: Map[Long, Long]): Seq[Long] =
      m.groupBy(_._2).view.mapValues(_.size).toSeq
        .sortBy { case (id, n) => (-n, id) }.map(_._1)
    val ph = headIds(prevMap)
    val nh = headIds(newMap)
    val sharedHeads = ph.toSet & nh.toSet
    assert(last.getAs[Long]("head_k") ===
      math.min(ph.length, nh.length).toLong)
    assert(last.getAs[Long]("head_overlap") ===
      sharedHeads.size.toLong)
    val pPos = ph.zipWithIndex.toMap
    val nPos = nh.zipWithIndex.toMap
    assert(last.getAs[Long]("head_footrule") ===
      sharedHeads.toSeq.map(c => math.abs(pPos(c) - nPos(c)).toLong)
        .sum)
  }

  test("a pre-head-columns drift store keeps working: legacy 6-column " +
      "rows render with zero heads beside new 9-column rows (r15 " +
      "review — no 500, no file-order lottery)") {
    import spark.implicits._
    val c = cfg(Files.createTempDirectory("scomm_legacy").toString)
    StreamingRank.ingestBatch(batch0.toDF(), 0L, c)
    StreamingCommunities.refresh(spark, c)
    // plant a LEGACY 6-column row the way the pre-r15 writer did
    Seq((1L, 3L, 1L, 1L, 3L, 1000000L))
      .toDF("refresh_seq", "n_nodes", "n_comm_prev", "n_comm_next",
        "same_same_pairs", "rand_ppm")
      .coalesce(1).write.mode("append")
      .parquet(c.storeDir + "/labels_drift")
    // a post-upgrade refresh appends a 9-column file into the same dir
    StreamingCommunities.refresh(spark, c)
    val rows = StreamingCommunities.drift(spark, c).collect()
    assert(rows.length === 2)
    val legacy = rows.find(_.getAs[Long]("refresh_seq") === 1L).get
    assert(legacy.getAs[Long]("rand_ppm") === 1000000L)
    assert(legacy.getAs[Long]("head_k") === 0L)
    assert(legacy.getAs[Long]("head_overlap") === 0L)
    assert(legacy.getAs[Long]("head_footrule") === 0L)
    val fresh = rows.find(_.getAs[Long]("refresh_seq") === 2L).get
    assert(fresh.getAs[Long]("head_k") > 0L)
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

  test("warm start: equal to cold on a converged graph; on an " +
      "incremental batch stable regions keep their labels (fewer flips " +
      "than cold) and the drift log reads stability") {
    val c = cfg(Files.createTempDirectory("scomm_warm").toString)
    // first refresh has no previous generation: warm degrades to cold
    StreamingRank.ingestBatch(
      Seq(Pair(10, 11), Pair(11, 12), Pair(10, 12)).toDF(), 0L, c)
    StreamingCommunities.refresh(spark, c, warmStart = true)
    assert(labelMap(c) === batchLpa(c, 4))
    val gen0 = labelMap(c)
    assert(gen0.values.toSet === Set(10L)) // triangle -> min-id label
    // (a) converged previous assignment: warm ≡ cold exactly (4 cold
    // rounds reach the fixed point on a triangle, so re-running seeded
    // from it must change nothing)
    StreamingCommunities.refresh(spark, c, warmStart = true)
    assert(labelMap(c) === gen0)
    assert(labelMap(c) === batchLpa(c, 4))
    // (b) incremental batch: node 1 joins the triangle (K4). COLD would
    // relabel the whole community to the new min id 1 — three flips
    // among previously-labelled nodes; WARM keeps the stable region's
    // literal label and only the new node moves.
    StreamingRank.ingestBatch(
      Seq(Pair(1, 10), Pair(1, 11), Pair(1, 12)).toDF(), 1L, c)
    val cold = batchLpa(c, 4)
    StreamingCommunities.refresh(spark, c, warmStart = true)
    val warm = labelMap(c)
    def flips(next: Map[Long, Long]): Int =
      gen0.count { case (n, l) => next.get(n).exists(_ != l) }
    assert(flips(warm) === 0, "stable region must keep its labels")
    assert(flips(cold) === 3, "cold relabels the whole fused community")
    assert(flips(warm) < flips(cold))
    // same partition STRUCTURE either way (one community of four)...
    assert(warm.values.toSet.size === 1 && cold.values.toSet.size === 1)
    assert(warm.keySet === cold.keySet)
    // ...and the drift log shows perfect agreement over shared nodes —
    // the label-id comparability warm start exists to preserve
    val last = StreamingCommunities.drift(spark, c).collect()
      .maxBy(_.getAs[Long]("refresh_seq"))
    assert(last.getAs[Long]("n_nodes") === 3L)
    assert(last.getAs[Long]("rand_ppm") === 1000000L)
  }

  test("empty store: communities read is empty, refresh is a no-op") {
    val c = cfg(Files.createTempDirectory("scomm_empty").toString)
    assert(StreamingCommunities.communities(spark, c).isEmpty)
    StreamingCommunities.refresh(spark, c) // must not throw or write
    assert(!new java.io.File(s"${c.storeDir}/labels").exists())
  }
}
