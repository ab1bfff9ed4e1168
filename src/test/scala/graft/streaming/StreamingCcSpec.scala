package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Dedup

/** StreamingCc: incremental labels ≡ batch connectedComponents over the
  * full pair history, idempotent replay, cross-batch component merges
  * via alias chains, bucket-pruned label reads, and closure compaction. */
class StreamingCcSpec extends SparkSpec {

  private def cfg() = StreamingCc.Config(
    storeDir = Files.createTempDirectory("ccstore").toString,
    checkpointDir = Files.createTempDirectory("ccckpt").toString,
    buckets = 4)

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    ps.toDF("id_a", "id_b")
  }

  /** Candidate pairs from the real LSH path at sf0.001. */
  private def corpusPairs: DataFrame = {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    Dedup.lshCandidates(Dedup.minhashSignatures(docs, 16), 16, 4)
  }

  test("incremental labels equal batch CC over the full pair history") {
    val c = cfg()
    val all = corpusPairs.persist()
    // Arbitrary (non-topological) batch split: merges must work in any
    // delivery order.
    val parts = Seq(
      all.filter(pmod(col("id_a") + col("id_b"), lit(3)) === 0),
      all.filter(pmod(col("id_a") + col("id_b"), lit(3)) === 1),
      all.filter(pmod(col("id_a") + col("id_b"), lit(3)) === 2))
    parts.foreach(StreamingCc.mergeBatch(_, c))
    val got = StreamingCc.resolved(spark, c)
      .select(col("node").as("doc_id"), col("root").as("cluster_id"))
    val want = Dedup.connectedComponents(all)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    all.unpersist()
  }

  test("replaying a batch changes nothing (semilattice, no HWM needed)") {
    val c = cfg()
    val all = corpusPairs.persist()
    val b0 = all.filter(col("id_a") % 2 === 0)
    val b1 = all.filter(col("id_a") % 2 === 1)
    StreamingCc.mergeBatch(b0, c)
    StreamingCc.mergeBatch(b1, c)
    val before = StreamingCc.resolved(spark, c).collect().toSet
    StreamingCc.mergeBatch(b0, c) // at-least-once replay
    val after = StreamingCc.resolved(spark, c).collect().toSet
    assert(after === before)
    all.unpersist()
  }

  test("cross-batch merges chase alias chains to the global minimum") {
    val c = cfg()
    // Components {3,4} and {1,2} merge via (2,3), then (0,1) re-roots
    // the merged component: resolution must chase 3 -> 1 -> 0.
    StreamingCc.mergeBatch(pairsDf(Seq((3L, 4L))), c)
    StreamingCc.mergeBatch(pairsDf(Seq((1L, 2L))), c)
    StreamingCc.mergeBatch(pairsDf(Seq((2L, 3L))), c)
    StreamingCc.mergeBatch(pairsDf(Seq((0L, 1L))), c)
    val got = StreamingCc.resolved(spark, c).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("a batch writes only the buckets its nodes live in") {
    val c = cfg()
    StreamingCc.mergeBatch(pairsDf(Seq((0L, 4L), (8L, 12L))), c) // bucket 0
    val fs = new Path(c.storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bucketFiles(b: Int): Long = {
      val p = new Path(s"${c.storeDir}/labels/bucket=$b")
      if (!fs.exists(p)) 0L
      else fs.listStatus(p)
        .count(_.getPath.getName.endsWith(".parquet")).toLong
    }
    assert(bucketFiles(0) > 0L)
    assert((1 to 3).map(bucketFiles).sum === 0L)
    // A second batch in bucket 1 leaves bucket 0's files untouched.
    val before0 = bucketFiles(0)
    StreamingCc.mergeBatch(pairsDf(Seq((1L, 5L))), c)
    assert(bucketFiles(0) === before0)
    assert(bucketFiles(1) > 0L)
  }

  test("continuous dedup: StreamingDedup pairs stream into StreamingCc") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val base = Files.createTempDirectory("ccpipe").toString
    val dcfg = StreamingDedup.Config(indexPath = s"$base/index",
      pairsPath = s"$base/pairs", checkpointDir = s"$base/dckpt")
    val c = StreamingCc.Config(storeDir = s"$base/cc",
      checkpointDir = s"$base/cckpt", buckets = 4)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    mem.addData(
      Doc(10, "alpha beta gamma delta epsilon zeta eta theta"),
      Doc(11, "alpha beta gamma delta epsilon zeta eta theta"),
      Doc(12, "unrelated words here that match nothing else"))
    StreamingDedup.start(mem.toDF(), dcfg).awaitTermination()
    mem.addData(
      Doc(13, "alpha beta gamma delta epsilon zeta eta theta"),
      Doc(14, "unrelated words here that match nothing else"))
    StreamingDedup.start(mem.toDF(), dcfg).awaitTermination()
    // The pairs TABLE is itself the stream feeding label maintenance —
    // the full continuous-dedup composition: docs → pairs → components.
    val pairsStream = spark.readStream
      .schema(spark.read.parquet(dcfg.pairsPath).schema)
      .parquet(dcfg.pairsPath)
    StreamingCc.start(pairsStream, c).awaitTermination()
    val got = StreamingCc.resolved(spark, c)
      .select(col("node").as("doc_id"), col("root").as("cluster_id"))
    val want = Dedup.connectedComponents(
      spark.read.parquet(dcfg.pairsPath))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // And the cluster content is right: the three copies share a root.
    val m = StreamingCc.resolved(spark, c).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(11L) === 10L && m(13L) === 10L)
    assert(m(14L) === 12L)
  }

  test("compact folds aliases into labels without changing resolution") {
    val c = cfg()
    StreamingCc.mergeBatch(pairsDf(Seq((3L, 4L))), c)
    StreamingCc.mergeBatch(pairsDf(Seq((1L, 2L))), c)
    StreamingCc.mergeBatch(pairsDf(Seq((2L, 3L), (0L, 1L))), c)
    val before = StreamingCc.resolved(spark, c).collect().toSet
    StreamingCc.compact(spark, c)
    val fs = new Path(c.storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new Path(c.storeDir, "aliases")))
    val after = StreamingCc.resolved(spark, c).collect().toSet
    assert(after === before)
    // And merging continues normally post-compaction.
    StreamingCc.mergeBatch(pairsDf(Seq((4L, 20L))), c)
    val m = StreamingCc.resolved(spark, c).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(20L) === 0L)
  }
}
