package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style sweeps (fixed-seed random cases) over the deterministic
  * selection/partitioning family — the invariants that must hold for ANY
  * configuration, not just the oracle queries' fixed parameters. */
class SamplingPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260813L)

  test("chunkDocuments reconstructs every doc under random geometries") {
    val docs = (1L to 40L).map { id =>
      val n = 1 + rnd.nextInt(60)
      (id, (1 to n).map(i => s"t$i").mkString(" "))
    }.toDF("doc_id", "text")
    val originals = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for (_ <- 1 to 5) {
      val chunk = 2 + rnd.nextInt(20)
      val overlap = rnd.nextInt(chunk)
      val out = DatasetOps.chunkDocuments(docs, chunk, overlap).collect()
        .groupBy(_.getAs[Long]("doc_id"))
      originals.foreach { case (id, text) =>
        val chunks = out(id).sortBy(_.getAs[Int]("chunk_id"))
        // declared chunk sizes match the text
        chunks.foreach { c =>
          assert(c.getAs[String]("chunk_text").split(" ").length ==
            c.getAs[Int]("n_chunk_tokens"),
            s"chunk=$chunk ov=$overlap doc=$id")
        }
        // dropping each later chunk's first `overlap` tokens reconstructs
        val rebuilt = chunks.zipWithIndex.flatMap { case (c, i) =>
          val toks = c.getAs[String]("chunk_text").split(" ").toSeq
          if (i == 0) toks else toks.drop(overlap)
        }.mkString(" ")
        assert(rebuilt == text, s"chunk=$chunk ov=$overlap doc=$id")
      }
    }
  }

  test("mixtureSample keeps exactly ceil(rate x group size) for random rates") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (_ <- 1 to 4) {
      val rates = Map(
        "en" -> (0.05 + rnd.nextDouble() * 0.9),
        "de" -> (0.05 + rnd.nextDouble() * 0.9))
      val dflt = 0.05 + rnd.nextDouble() * 0.9
      val perLang = DatasetOps.mixtureSample(docs, "lang", rates, dflt)
        .groupBy("lang").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      totals.foreach { case (lang, n) =>
        val expect = math.ceil(n * rates.getOrElse(lang, dflt)).toLong
        assert(perLang.getOrElse(lang, 0L) == expect,
          s"rates=$rates default=$dflt lang=$lang")
      }
    }
  }

  test("hashSplit partitions exhaustively for random fraction vectors") {
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
    val n = docs.count()
    for (_ <- 1 to 3) {
      val k = 2 + rnd.nextInt(3)
      val raw = (1 to k).map(_ => 0.05 + rnd.nextDouble())
      val fracs = raw.map(_ / raw.sum).zipWithIndex
        .map { case (f, i) => s"part$i" -> f }
      // fix rounding drift so the require(sum==1) guard passes
      val fixed = fracs.init :+ (fracs.last._1 ->
        (1.0 - fracs.init.map(_._2).sum))
      val out = DatasetOps.hashSplit(docs, fixed).groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out.values.sum == n, s"fracs=$fixed")   // exhaustive
      assert(out.keySet.subsetOf(fixed.map(_._1).toSet)) // exclusive
      // deterministic
      val again = DatasetOps.hashSplit(docs, fixed).groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == again)
    }
  }
}
