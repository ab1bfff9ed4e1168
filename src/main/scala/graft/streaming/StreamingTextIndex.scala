package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.TextAnalysis

/** Continuously-maintained inverted index for lexical (BM25) serving —
  * the retrieval counterpart of [[StreamingDedup]]'s band index: each
  * micro-batch appends its postings `(term, doc_id, tf)` PARTITIONED BY
  * `bucket = hash(term) mod termBuckets`, its doc lengths, and a merged
  * one-row totals relation. A query then reads ONLY the buckets its
  * terms hash to — partition pruning keeps query cost proportional to
  * the query's term footprint, not the corpus (machine-checked by the
  * flat-file-reads spec, same scheme as the dedup index).
  *
  * [[query]] reproduces [[TextAnalysis.bm25Search]] digit-for-digit on
  * the same corpus (spec-pinned): document frequency comes from the
  * pruned postings, lengths from the doc-key join against candidates
  * only, and the integer BM25 arithmetic is shared.
  *
  * Replay semantics: postings/length appends are NOT idempotent, so the
  * high-water batch id is LOAD-BEARING here (as in [[StreamingSketch]],
  * unlike the max/union sketches) — a replayed batch is skipped before
  * any write; the totals swap is the aside-rename scheme, so a crash
  * leaves the old or the new totals, never a mix.
  */
object StreamingTextIndex {

  final case class Config(indexPath: String, lengthsPath: String,
                          totalsPath: String, checkpointDir: String,
                          termBuckets: Int = 64,
                          idCol: String = "doc_id",
                          textCol: String = "text")

  /** Stable bucket of a term — the postings partition column. */
  private[streaming] def bucketCol(buckets: Int) =
    pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int")

  /** The batch's postings with their index bucket attached. */
  private[streaming] def postings(batch: DataFrame,
                                  cfg: Config): DataFrame =
    batch.select(col(cfg.idCol).as("doc_id"),
        explode(TextAnalysis.tokens(lower(col(cfg.textCol)))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket", bucketCol(cfg.termBuckets))

  def start(docs: DataFrame, cfg: Config): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, cfg)
      }
      .start()

  private def hwmPath(cfg: Config) = new Path(cfg.totalsPath, "_hwm")

  private[streaming] def lastBatch(spark: SparkSession,
                                   cfg: Config): Long = {
    val fs = new Path(cfg.totalsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hwmPath(cfg))) -1L
    else {
      val in = fs.open(hwmPath(cfg))
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  private[streaming] def readTotals(spark: SparkSession,
                                    cfg: Config): (Long, Long) = {
    val fs = new Path(cfg.totalsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val t = new Path(cfg.totalsPath, "totals")
    if (!fs.exists(t)) (0L, 0L)
    else {
      val r = spark.read.parquet(t.toString).head()
      (r.getAs[Long]("n_docs"), r.getAs[Long]("corpus_len"))
    }
  }

  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
                                      cfg: Config): Unit = {
    val spark = batch.sparkSession
    if (batchId <= lastBatch(spark, cfg)) return // replay: load-bearing skip
    val fs = new Path(cfg.totalsPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!batch.isEmpty) {
      postings(batch, cfg)
        .write.mode("append").partitionBy("bucket").parquet(cfg.indexPath)
      val lengths = batch.select(col(cfg.idCol).as("doc_id"),
        TextAnalysis.tokenCount(col(cfg.textCol)).cast("long").as("dl"))
      lengths.write.mode("append").parquet(cfg.lengthsPath)
      val (n0, l0) = readTotals(spark, cfg)
      val agg = lengths.agg(count(lit(1)).as("n"), sum(col("dl")).as("l"))
        .head()
      import spark.implicits._
      val merged = Seq((n0 + agg.getLong(0),
        l0 + Option(agg.getAs[Long]("l")).getOrElse(0L)))
        .toDF("n_docs", "corpus_len")
      val tmp = new Path(cfg.totalsPath, "totals__tmp")
      fs.delete(tmp, true)
      merged.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val cur = new Path(cfg.totalsPath, "totals")
      val old = new Path(cfg.totalsPath, "totals__old")
      fs.delete(old, true)
      if (fs.exists(cur) && !fs.rename(cur, old))
        throw new IllegalStateException(s"totals swap: cannot move $cur")
      if (!fs.rename(tmp, cur)) {
        if (fs.exists(old)) fs.rename(old, cur) // roll back
        throw new IllegalStateException(s"totals swap: cannot install $tmp")
      }
      fs.delete(old, true)
    }
    val out = fs.create(hwmPath(cfg), true)
    try out.write(batchId.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Bucket-pruned postings for a query's terms. */
  private[streaming] def prunedPostings(spark: SparkSession, cfg: Config,
                                        terms: Seq[String]): DataFrame = {
    import spark.implicits._
    val buckets = terms.toDF("term").select(bucketCol(cfg.termBuckets))
      .distinct().collect().map(_.getInt(0)).toSeq
    spark.read.parquet(cfg.indexPath)
      .filter(col("bucket").isInCollection(buckets) &&
        col("term").isin(terms: _*))
  }

  /** BM25 top-k against the maintained index — digit-identical to
    * [[TextAnalysis.bm25Search]] over the same corpus; query cost is the
    * pruned postings + a candidate-only doc-length join, never a corpus
    * scan. */
  def query(spark: SparkSession, cfg: Config, queryTerms: Seq[String],
            k: Int): DataFrame = {
    require(queryTerms.nonEmpty && k > 0, "need query terms and k > 0")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val tf = prunedPostings(spark, cfg, terms)
      .select(col("doc_id"), col("term"), col("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val (nDocs, corpusLen) = readTotals(spark, cfg)
    val lens = spark.read.parquet(cfg.lengthsPath)
    tf.join(broadcast(dfreq), "term")
      .withColumn("n_docs", lit(nDocs))
      .withColumn("corpus_len", lit(corpusLen))
      .join(lens, "doc_id")
      .withColumn("idf_bits",
        length(bin(expr("n_docs div df"))).cast("long"))
      .withColumn("term_score_ppm", expr(
        """(cast(1000000 as decimal(38,0)) * idf_bits * 44 * tf * corpus_len)
           div
           (cast(20 as decimal(38,0)) * corpus_len * tf
             + cast(6 as decimal(38,0)) * corpus_len
             + cast(18 as decimal(38,0)) * dl * n_docs)"""))
      .groupBy(col("doc_id"))
      .agg(sum(col("term_score_ppm")).as("score_ppm"),
        count(lit(1)).as("n_terms_hit"))
      .orderBy(col("score_ppm").desc, col("doc_id").asc)
      .limit(k)
  }
}
