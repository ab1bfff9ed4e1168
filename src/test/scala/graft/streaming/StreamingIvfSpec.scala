package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.IvfIndex

final case class Emb(vec_id: Long, embedding: Seq[Float])

class StreamingIvfSpec extends SparkSpec {
  import spark.implicits._

  test("streamed batches append to the index; probes equal a one-shot build") {
    val emb = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
    val model = IvfIndex.train(emb, nlist = 8, dim = 64)
    val base = Files.createTempDirectory("sivf").toString
    IvfIndex.saveModel(spark, model, s"$base/model")
    val cfg = StreamingIvf.Config(
      indexPath = s"$base/index", checkpointDir = s"$base/ckpt",
      modelPath = s"$base/model", dim = 64)

    // two micro-batches covering the corpus, streamed via MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val rows = emb.select(col("vec_id"), col("embedding")).as[Emb]
      .collect().toSeq
    val (b1, b2) = rows.partition(_.vec_id % 2 == 0)
    val mem = MemoryStream[Emb]
    mem.addData(b1: _*)
    mem.addData(b2: _*)
    StreamingIvf.start(mem.toDF(), cfg).awaitTermination()

    val stored = IvfIndex.readIndex(spark, cfg.indexPath)
    assert(stored.count() == rows.size.toLong)
    // a probe over the streamed store equals the one-shot in-memory build
    val query = emb.filter(col("vec_id") === 0)
      .head().getSeq[Float](1).map(_.toDouble).toArray
    val streamed = IvfIndex.probe(stored.filter(col("vec_id") =!= 0),
        model, query, k = 5, nprobe = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val oneShot = IvfIndex.probe(
        IvfIndex.assign(emb, model, dim = 64).filter(col("vec_id") =!= 0),
        model, query, k = 5, nprobe = 4, dim = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(streamed == oneShot)
    // the store is physically partitioned by cell (pruning unit)
    assert(stored.columns.contains("ivf_cell"))
    assert(IvfIndex.readIndex(spark, cfg.indexPath)
      .inputFiles.forall(_.contains("ivf_cell=")))
  }

  test("replay is exactly-once: committed ids skip, a mid-crash rerun " +
      "rewrites its own partitions without duplicating vectors") {
    val emb = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
      .limit(40)
    val model = IvfIndex.train(emb, nlist = 4, dim = 64)
    val base = Files.createTempDirectory("sivf_replay").toString
    IvfIndex.saveModel(spark, model, s"$base/model")
    val cfg = StreamingIvf.Config(
      indexPath = s"$base/index", checkpointDir = s"$base/ckpt",
      modelPath = s"$base/model", dim = 64)
    StreamingIvf.processBatch(emb.filter(col("vec_id") < 20), 0L,
      model, cfg)
    StreamingIvf.processBatch(emb.filter(col("vec_id") >= 20), 1L,
      model, cfg)
    def stored() = IvfIndex.readIndex(spark, cfg.indexPath).count()
    val n = stored()
    assert(n === 40L)
    // committed replay: skipped via the HWM
    StreamingIvf.processBatch(emb.filter(col("vec_id") >= 20), 1L,
      model, cfg)
    assert(stored() === n)
    // mid-crash replay: data landed, HWM didn't — the rerun overwrites
    // batch 1's own partitions instead of appending duplicates
    val fs = new org.apache.hadoop.fs.Path(cfg.indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(cfg.indexPath + "__hwm"),
      false)
    StreamingIvf.processBatch(emb.filter(col("vec_id") >= 20), 1L,
      model, cfg)
    assert(stored() === n, "mid-crash replay duplicated vectors")

    // compaction folds the batch dimension, preserves cells + probes,
    // and the HWM survives so a replay of batch 1 still skips
    val res = StreamingIvf.compactIndex(spark, cfg)
    assert(res.filesAfter < res.filesBefore && res.rows === n)
    assert(stored() === n)
    assert(IvfIndex.readIndex(spark, cfg.indexPath)
      .inputFiles.forall(f => f.contains("ivf_cell=") &&
        f.contains("batch_id=-1")))
    StreamingIvf.processBatch(emb.filter(col("vec_id") >= 20), 1L,
      model, cfg)
    assert(stored() === n, "post-compaction replay duplicated vectors")
    // the reset guard runs BEFORE the empty short-circuit: a misbound
    // store fails loudly even when the offending batch carries no rows
    val exEmpty = intercept[IllegalStateException] {
      StreamingIvf.processBatch(emb.limit(0), 0L, model, cfg)
    }
    assert(exEmpty.getMessage.contains("below the committed HWM"))
  }

  test("compactIndex folds ONLY committed batches: a batch that crashed " +
      "before its HWM keeps its partition so the replay overwrites it") {
    val emb = graft.Tables.load(spark, sf("sf0.001"), "embeddings")
      .limit(40)
    val model = IvfIndex.train(emb, nlist = 4, dim = 64)
    val base = Files.createTempDirectory("sivf_fold_guard").toString
    IvfIndex.saveModel(spark, model, s"$base/model")
    val cfg = StreamingIvf.Config(
      indexPath = s"$base/index", checkpointDir = s"$base/ckpt",
      modelPath = s"$base/model", dim = 64)
    StreamingIvf.processBatch(emb.filter(col("vec_id") < 20), 0L,
      model, cfg)
    StreamingIvf.processBatch(emb.filter(col("vec_id") >= 20), 1L,
      model, cfg)
    // simulate the crash window: batch 1's data landed, HWM stayed at 0
    val hwmP = new org.apache.hadoop.fs.Path(cfg.indexPath + "__hwm")
    val fs = hwmP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Hwm.write(fs, hwmP, 0L)

    StreamingIvf.compactIndex(spark, cfg)

    val ids = IvfIndex.readIndex(spark, cfg.indexPath)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(-1L, 1L),
      s"fold swallowed the uncommitted batch: partitions $ids")
    // the replay rewrites batch 1's own partitions — no duplicates
    StreamingIvf.processBatch(emb.filter(col("vec_id") >= 20), 1L,
      model, cfg)
    assert(IvfIndex.readIndex(spark, cfg.indexPath).count() === 40L,
      "replay after fold double-counted the crashed batch")
  }
}
