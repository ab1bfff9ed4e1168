package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

final case class Doc(doc_id: Long, text: String)

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(base: String) = StreamingDedup.Config(
    indexPath = s"$base/index", pairsPath = s"$base/pairs",
    checkpointDir = s"$base/ckpt")

  test("each batch probes the accumulated index, never re-pairs it") {
    val base = Files.createTempDirectory("sdedup").toString
    val c = cfg(base)
    val batch1 = Seq(
      Doc(1, "the quick brown fox jumps over the lazy dog"),
      Doc(2, "the quick brown fox jumps over the lazy dog"), // dup of 1
      Doc(3, "completely different text with no overlap at all")).toDF()
    StreamingDedup.processBatch(batch1, 0L, c)
    val p1 = spark.read.parquet(c.pairsPath).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("batch_id"))).toSet
    assert(p1 == Set((1L, 2L, 0L)))
    // batch 2: one more copy — pairs against BOTH stored dups, plus
    // nothing among the unrelated doc; the (1,2) pair is NOT re-emitted
    val batch2 = Seq(
      Doc(4, "the quick brown fox jumps over the lazy dog"),
      Doc(5, "yet another unrelated document body entirely")).toDF()
    StreamingDedup.processBatch(batch2, 1L, c)
    val p2 = spark.read.parquet(c.pairsPath).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("batch_id"))).toSet
    assert(p2 == Set((1L, 2L, 0L), (1L, 4L, 1L), (2L, 4L, 1L)))
    // the index accumulated all five signatures
    assert(spark.read.parquet(c.indexPath).count() == 5L)
  }

  test("streaming end-to-end over MemoryStream") {
    val base = Files.createTempDirectory("sdedup_e2e").toString
    val c = cfg(base)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    mem.addData(
      Doc(10, "alpha beta gamma delta epsilon zeta eta theta"),
      Doc(11, "alpha beta gamma delta epsilon zeta eta theta"),
      Doc(12, "unrelated words here that match nothing else"))
    val q = StreamingDedup.start(mem.toDF(), c)
    q.awaitTermination()
    val pairs = spark.read.parquet(c.pairsPath).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs == Set((10L, 11L)))
    assert(spark.read.parquet(c.indexPath).count() == 3L)
  }
}
