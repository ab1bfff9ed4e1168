package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic sketch operators — count-min frequency estimation and
  * Bloom-filter membership — built so an independent engine reproduces
  * every cell and bit: positions are md5 HEX PREFIXES (cell key =
  * `substr(md5(seed|x), 1, hexChars)`), never platform hashes or integer
  * conversions, the same cross-engine determinism scheme the minhash
  * family uses. Width is `16^hexChars` cells per row.
  *
  * Why sketches at 100 TB: the exact structures they replace (full
  * frequency maps, full membership sets) grow with the corpus, while a
  * sketch is a FIXED-size relation (depth × width cells) that broadcasts
  * to every executor — count-min answers "how often does this token
  * occur" and Bloom answers "might this shingle be in the benchmark"
  * with one map-side lookup, no corpus-side shuffle.
  *
  * Reference surface: none (the reference's compute stops at validation
  * aggregates); LLM-pipeline extension (SURVEY §2 north star).
  */
object Sketches {

  /** Cell key of `x` for hash-family member `seed`. */
  def cellKey(seed: Int, x: Column, hexChars: Int): Column =
    substring(md5(concat(lit(s"$seed|"), x)), 1, hexChars)

  /** Count-min sketch over token OCCURRENCES of `docs(textCol)`: the
    * `(seed, cell, cnt)` relation, `depth × 16^hexChars` rows max. One
    * explode (fan-out × depth — map-side combined) and one partial-agg
    * shuffle on the (seed, cell) key; the result is broadcast-sized by
    * construction. */
  def countMin(docs: DataFrame, depth: Int = 4, hexChars: Int = 2,
               textCol: String = "text"): DataFrame = {
    require(depth >= 1 && hexChars >= 1 && hexChars <= 8,
      "need 1 <= depth, 1 <= hexChars <= 8")
    val occ = docs.select(
      explode(TextAnalysis.tokens(col(textCol))).as("tok"))
    occ
      .select(explode(array((0 until depth).map(s =>
        struct(lit(s).as("seed"),
          cellKey(s, col("tok"), hexChars).as("cell"))): _*)).as("sc"))
      .select(col("sc.seed").as("seed"), col("sc.cell").as("cell"))
      .groupBy(col("seed"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate probe: for each probe token, `min` over the sketch
    * rows it hashes to — the classic CMS upper bound (estimate ≥ truth,
    * equality when no collisions). Missing cells count 0. The probe set
    * is pipeline-small; the join is probe × depth rows against the
    * broadcast-sized cell relation. */
  def cmsEstimate(cells: DataFrame, probes: DataFrame, depth: Int = 4,
                  hexChars: Int = 2, tokCol: String = "tok"): DataFrame = {
    val fan = probes
      .select(col(tokCol).as("tok"),
        explode(array((0 until depth).map(s =>
          struct(lit(s).as("seed"),
            cellKey(s, col(tokCol), hexChars).as("cell"))): _*)).as("sc"))
      .select(col("tok"), col("sc.seed").as("seed"),
        col("sc.cell").as("cell"))
    fan.join(broadcast(cells), Seq("seed", "cell"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(col("tok"))
      .agg(min(col("cnt")).as("cms_estimate"))
  }

  /** Merge count-min sketches: cells ADD — the sketch of a corpus union
    * is the cell-wise sum of the parts' sketches, so incremental
    * maintenance is one bounded-size aggregation per batch (a streaming
    * `foreachBatch` appends the batch sketch and compacts), never a
    * corpus re-scan. `SketchesSpec` pins batch-merge ≡ one-shot. */
  def mergeCms(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(col("seed"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Merge Bloom bit-sets: bits UNION — same incremental contract as
    * [[mergeCms]] for membership. */
  def mergeBloom(parts: DataFrame*): DataFrame =
    parts.reduce(_ unionByName _).distinct()

  /** Bloom bit-set over the DISTINCT shingles of a benchmark corpus:
    * the `(seed, cell)` relation with `depth × 16^hexChars` rows max —
    * kilobytes for any benchmark, broadcast everywhere. */
  def bloomBits(benchmark: DataFrame, depth: Int = 3, hexChars: Int = 3,
                n: Int = 3, textCol: String = "text"): DataFrame = {
    val sh = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("shingle"))
      .distinct()
    sh.select(explode(array((0 until depth).map(s =>
        struct(lit(s).as("seed"),
          cellKey(s, col("shingle"), hexChars).as("cell"))): _*)).as("sc"))
      .select(col("sc.seed").as("seed"), col("sc.cell").as("cell"))
      .distinct()
  }

  /** Probe a corpus against a Bloom bit-set: per document, how many of
    * its distinct shingles are MAYBE in the benchmark (all `depth` bits
    * set — the Bloom positive, which may include false positives: that
    * is the sketch's contract and the reason [[Dedup.contamination]]
    * exists as the exact confirmation pass on flagged docs).
    *
    * Scale shape: corpus shingles fan out × depth, join the BROADCAST
    * bit relation, aggregate per (doc, shingle) then per doc — the
    * corpus never shuffles by shingle against another corpus. */
  def bloomProbe(corpus: DataFrame, bits: DataFrame, depth: Int = 3,
                 hexChars: Int = 3, n: Int = 3, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame = {
    val sh = corpus.select(col(idCol).as("sid"),
        explode(Dedup.shingles(col(textCol), n)).as("shingle"))
    val fan = sh.select(col("sid"), col("shingle"),
        explode(array((0 until depth).map(s =>
          struct(lit(s).as("seed"),
            cellKey(s, col("shingle"), hexChars).as("cell"))): _*)).as("sc"))
      .select(col("sid"), col("shingle"), col("sc.seed").as("seed"),
        col("sc.cell").as("cell"))
    fan
      .join(broadcast(bits.withColumn("hit", lit(1L))),
        Seq("seed", "cell"), "left")
      .groupBy(col("sid"), col("shingle"))
      .agg((sum(coalesce(col("hit"), lit(0L))) === depth).as("maybe"))
      .groupBy(col("sid"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("maybe"), 1L).otherwise(0L)).as("n_maybe"))
      .withColumnRenamed("sid", idCol)
  }
}
