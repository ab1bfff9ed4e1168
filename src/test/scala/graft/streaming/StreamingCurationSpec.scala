package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(base: String) = StreamingCuration.Config(
    corpusPath = s"$base/corpus", rejectPath = s"$base/rejects",
    keyIndexPath = s"$base/keys", checkpointDir = s"$base/ckpt")

  /** 80 distinct words — long enough for the quality floor, zero
    * repetition. */
  private def words(p: String) = (1 to 80).map(i => s"$p$i").mkString(" ")

  test("quality/dup filters apply per batch; replays drop as seen_exact") {
    val base = Files.createTempDirectory("scur").toString
    val c = cfg(base)
    val batch1 = Seq(
      Doc(1, words("a")),
      Doc(2, words("a")),   // within-batch exact dup of 1
      Doc(3, "tiny")).toDF() // fails the length-driven quality floor
    StreamingCuration.processBatch(batch1, 0L, c)
    assert(spark.read.parquet(c.corpusPath).select("doc_id")
      .as[Long].collect().toSet == Set(1L))
    val r1 = spark.read.parquet(c.rejectPath).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("drop_reason"))
      .toMap
    assert(r1 == Map(2L -> "duplicate", 3L -> "low_quality"))
    // batch 2: a cross-batch copy of doc 1 drops via the index probe;
    // fresh content is kept
    val batch2 = Seq(Doc(4, words("a")), Doc(5, words("b"))).toDF()
    StreamingCuration.processBatch(batch2, 1L, c)
    assert(spark.read.parquet(c.corpusPath).select("doc_id")
      .as[Long].collect().toSet == Set(1L, 5L))
    val r2 = spark.read.parquet(c.rejectPath).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("drop_reason"))
      .toMap
    assert(r2(4L) == "seen_exact")
    // the key index is physically partitioned on the hash bucket and
    // holds one row per distinct kept key
    val idx = spark.read.parquet(c.keyIndexPath)
    assert(idx.columns.contains("bucket"))
    assert(idx.count() == 2L)
    // a full replay of batch 2 appends NOTHING to the corpus (idempotent
    // via the index probe)
    StreamingCuration.processBatch(batch2, 2L, c)
    assert(spark.read.parquet(c.corpusPath).count() == 2L)
  }

  test("replay is exactly-once: committed batch ids skip, a mid-crash " +
      "rerun rewrites its own partitions without losing the batch") {
    val base = Files.createTempDirectory("scur_replay").toString
    val c = cfg(base)
    StreamingCuration.processBatch(
      Seq(Doc(1, words("a")), Doc(2, "tiny")).toDF(), 0L, c)
    val b1 = Seq(Doc(5, words("b"))).toDF()
    StreamingCuration.processBatch(b1, 1L, c)
    def corpus() = spark.read.parquet(c.corpusPath).select("doc_id")
      .as[Long].collect().toSet
    def rejects() = spark.read.parquet(c.rejectPath).count()
    assert(corpus() == Set(1L, 5L) && rejects() == 1L)

    // committed replay (same id): skipped — no duplicate rows, and doc 5
    // is NOT quarantined as seen_exact
    StreamingCuration.processBatch(b1, 1L, c)
    assert(corpus() == Set(1L, 5L) && rejects() == 1L)

    // mid-crash replay: outputs landed but the HWM didn't — the rerun
    // must NOT see its own first-attempt hashes as "seen" (that would
    // overwrite its corpus partition with nothing, losing doc 5)
    val fs = new org.apache.hadoop.fs.Path(c.keyIndexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(c.keyIndexPath + "__hwm"),
      false)
    StreamingCuration.processBatch(b1, 1L, c)
    assert(corpus() == Set(1L, 5L), "mid-crash replay lost the batch")
    assert(rejects() == 1L, "mid-crash replay duplicated quarantine rows")
  }

  test("streaming end-to-end over MemoryStream") {
    val base = Files.createTempDirectory("scur_e2e").toString
    val c = cfg(base)
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    mem.addData(Doc(10, words("x")), Doc(11, words("x")), Doc(12, "no"))
    val q = StreamingCuration.start(mem.toDF(), c)
    q.awaitTermination()
    assert(spark.read.parquet(c.corpusPath).select("doc_id")
      .as[Long].collect().toSet == Set(10L))
    assert(spark.read.parquet(c.rejectPath).count() == 2L)
  }
}
