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
    spark.stop()
  }
}
