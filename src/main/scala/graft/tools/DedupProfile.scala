package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-by-stage timing of the dedup pipelines (dev tool). */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, dir, "documents")
    docs.count() // warm

    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val out = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      out
    }

    time("tokens only") {
      docs.select(size(graft.operators.TextAnalysis.tokens(col("text")))
        .as("n")).agg(sum("n")).collect()
    }
    time("shingles construct") {
      docs.select(size(Dedup.shingles(col("text"), 3)).as("n"))
        .agg(sum("n")).collect()
    }
    time("shingles + 1 md5 min") {
      docs.select(array_min(transform(Dedup.shingles(col("text"), 3),
        x => Dedup.seededHash(0, x))).as("m")).agg(max("m")).collect()
    }
    val sigs = time("signatures (16 seeds)") {
      val s = Dedup.minhashSignatures(docs, 16)
      s.count(); s
    }
    time("lsh candidates join") {
      Dedup.lshCandidates(sigs, 16, 4).count()
    }
    time("full q28 again (cached sigs)") {
      Dedup.lshCandidates(Dedup.minhashSignatures(docs, 16), 16, 4).count()
    }

    // Pigeonhole-vs-byte blocking fan-out: the join cost driver is
    // Σ_key count², so the max/mean docs-per-key bounds the pair blow-up.
    // 16-bit chunks spread the corpus over 65,536 keys per chunk (corpus-
    // driven occupancy); the single-byte block forces n/256 per key BY
    // CONSTRUCTION — at 1B docs that is ~10^13 candidate pairs per block.
    val sig64 = docs.select(col("doc_id"),
      Dedup.simhash64(col("text")).as("sig")).cache()
    sig64.count()
    for (j <- 0 until 4) {
      val stats = sig64
        .groupBy(shiftright(col("sig"), 16 * j).bitwiseAND(lit(65535L))
          .as("cv"))
        .agg(count(lit(1)).as("n"))
        .agg(count(lit(1)).as("keys"), max("n").as("max_per_key"),
          avg("n").as("mean_per_key"),
          sum(col("n") * col("n")).as("candidate_pairs_bound"))
        .head()
      println(f"chunk $j: keys=${stats.getLong(0)} " +
        f"max/key=${stats.getLong(1)} mean/key=${stats.getDouble(2)}%.1f " +
        f"pair-bound=${stats.getLong(3)}")
    }
    val byteStats = sig64
      .groupBy(col("sig").bitwiseAND(lit(255L)).as("block"))
      .agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("keys"), max("n").as("max_per_key"),
        sum(col("n") * col("n")).as("candidate_pairs_bound"))
      .head()
    println(s"byte-block: keys=${byteStats.getLong(0)} " +
      s"max/key=${byteStats.getLong(1)} pair-bound=${byteStats.getLong(2)}")
    sig64.unpersist()
    spark.stop()
  }
}
