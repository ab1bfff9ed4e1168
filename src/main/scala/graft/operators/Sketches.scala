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
               textCol: String = "text"): DataFrame =
    countMinValues(docs.select(
      explode(TextAnalysis.tokens(col(textCol))).as("tok")),
      "tok", depth, hexChars)

  /** Count-min over a value column directly (one occurrence per row) —
    * the generic form [[countMin]] specialises for token streams. Also
    * the sketch a JOIN-SIZE estimate needs: CMS of each side's key
    * column, combined via [[cmsInnerProduct]]. */
  def countMinValues(df: DataFrame, valueCol: String, depth: Int = 4,
                     hexChars: Int = 2): DataFrame = {
    require(depth >= 1 && hexChars >= 1 && hexChars <= 8,
      "need 1 <= depth, 1 <= hexChars <= 8")
    df.select(col(valueCol).cast("string").as("tok"))
      .select(explode(array((0 until depth).map(s =>
        struct(lit(s).as("seed"),
          cellKey(s, col("tok"), hexChars).as("cell"))): _*)).as("sc"))
      .select(col("sc.seed").as("seed"), col("sc.cell").as("cell"))
      .groupBy(col("seed"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Equi-join cardinality estimate from two CMS relations over the join
    * keys: `|A ⋈ B| = Σ_v fA(v)·fB(v)`, estimated per hash row as the
    * cell-wise inner product and MINIMISED over the depth rows — the
    * classic CMS inner-product estimator (Cormode & Muthukrishnan 2005):
    * an upper bound on the true size, tight when cells are
    * collision-free. The join-PLANNING diagnostic: a skewed or
    * exploding join announces itself in two broadcast-sized sketches
    * without executing the join — at 100 TB the sketches cost two map
    * passes; the join they predict may cost hours. */
  def cmsInnerProduct(cellsA: DataFrame, cellsB: DataFrame): DataFrame =
    cellsA.select(col("seed"), col("cell"), col("cnt").as("cnt_a"))
      .join(cellsB.select(col("seed"), col("cell"), col("cnt").as("cnt_b")),
        Seq("seed", "cell"))
      .groupBy(col("seed"))
      .agg(sum(col("cnt_a") * col("cnt_b")).as("ip"))
      // disjoint key sets → the cell join is empty and min is NULL; the
      // semantically-correct estimate is 0 (no shared cells ⇒ bound 0)
      .agg(coalesce(min(col("ip")), lit(0L)).as("join_size_est"))

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

  /** KMV hash-space parameters: 14 hex chars = a 56-bit hash, chosen so
    * the estimator's numerator `(k−1) · 2^56` stays inside a signed
    * 64-bit integer for k ≤ 128 — both engines then compute the estimate
    * with EXACT integer division, no floats anywhere. */
  val KmvHexChars = 14
  val KmvSpace: Long = 1L << (4 * KmvHexChars) // 2^56

  /** 56-bit value hash for the KMV sketch: the first 14 hex chars of
    * md5, converted to a BIGINT — engine-portable (any SQL engine
    * reproduces it digit by digit; see [[kmvHashSql]]). */
  def kmvHash(x: Column): Column =
    conv(substring(md5(x), 1, KmvHexChars), 16, 10).cast("long")

  /** DuckDB rendering of [[kmvHash]]: an unrolled positional hex→int
    * sum (DuckDB has no hex-to-integer cast) — 14 exact BIGINT terms. */
  def kmvHashSql(x: String): String =
    (0 until KmvHexChars).map { i =>
      val pow = 1L << (4 * (KmvHexChars - 1 - i))
      s"(CAST(strpos('0123456789abcdef', substr(md5($x), ${i + 1}, 1)) " +
        s"AS BIGINT) - 1) * $pow"
    }.mkString("(", " + ", ")")

  /** KMV (k-minimum-values) distinct-count sketch per group: the k
    * smallest distinct 56-bit value hashes, as one `(group, hs)` row per
    * group — the MERGEABLE cardinality sketch (union = bottom-k of the
    * parts' slots, [[mergeKmv]]).
    *
    * Scale shape: ONE partial-agg shuffle. [[graft.functions.BottomKAggregator]]
    * is associative with state bounded at k longs, so Spark map-side
    * combines — each partition contributes at most k values per group to
    * the shuffle, never its distinct-value relation. The relational
    * alternative (distinct + per-group rank window) sorts every distinct
    * hash; at 100 TB that is billions of rows per group for a 64-slot
    * answer. Cf. Bar-Yossef et al., "Counting Distinct Elements in a
    * Data Stream" (RANDOM 2002). */
  def kmvSketch(df: DataFrame, k: Int, groupCol: String = "source",
                valueCol: String = "text"): DataFrame = {
    require(k >= 2 && k <= 128, "need 2 <= k <= 128 (estimator range)")
    val bottomK = udaf(new graft.functions.BottomKAggregator(k))
    df.select(col(groupCol), kmvHash(col(valueCol)).as("h"))
      .groupBy(col(groupCol))
      .agg(bottomK(col("h")).as("hs"))
  }

  /** Cardinality estimate from a KMV sketch: with fewer than k distinct
    * hashes the sketch IS the distinct set (estimate exact); at k slots,
    * the classic unbiased estimator `(k−1) · SPACE / h_(k)` — here in
    * exact 64-bit integer arithmetic (numerator < 2^63 by the
    * [[KmvHexChars]] choice), so DuckDB reproduces every digit. */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= 128, "need 2 <= k <= 128 (estimator range)")
    val num = (k - 1).toLong * KmvSpace
    sketch
      .withColumn("n_hashes", size(col("hs")).cast("long"))
      .withColumn("kth_hash",
        when(col("n_hashes") === k, element_at(col("hs"), k))
          .otherwise(lit(0L)))
      .withColumn("distinct_est",
        when(col("n_hashes") < k, col("n_hashes"))
          .otherwise(expr(s"${num}L div greatest(kth_hash, 1L)")))
      .drop("hs")
  }

  /** HyperLogLog register relation per group: `(grp, register, rho_max)`
    * with at most `16^regHex` rows per group — the register-based
    * cardinality sketch (Flajolet et al., AofA 2007) joining the family:
    * CMS = frequency, Bloom = membership, KMV = bottom-k cardinality,
    * HLL = register cardinality with O(m) state independent of k.
    *
    * Cross-engine determinism scheme as everywhere in this file: the
    * register is the md5 hex PREFIX; rho (1 + leading zero BITS of the
    * next `windowHex` hex chars) is derived from hex-char string ops
    * (regexp leading-zero count + a 15-way CASE on the first non-zero
    * digit) — never platform hashes or float math, so DuckDB reproduces
    * every register.
    *
    * Scale shape: one map pass + ONE partial-agg shuffle on the
    * (grp, register) key with max() combine; the result is
    * broadcast-sized by construction (m rows per group). Merge of two
    * sketches = max per register — same shape as [[mergeKmv]]. */
  def hllRegisters(df: DataFrame, groupCol: String, valueCol: String,
                   regHex: Int = 2, windowHex: Int = 12): DataFrame = {
    require(regHex >= 1 && regHex <= 4, "need 1 <= regHex <= 4")
    require(windowHex >= 4 && windowHex <= 15,
      "need 4 <= windowHex <= 15 (rho fits int, window inside md5)")
    val h = md5(col(valueCol).cast("string"))
    df.select(col(groupCol).as("grp"),
        substring(h, 1, regHex).as("register"),
        substring(h, regHex + 1, windowHex).as("w"))
      .withColumn("z", length(regexp_extract(col("w"), "^(0*)", 1)))
      .withColumn("rho",
        when(col("z") === windowHex, lit(4 * windowHex + 1))
          .otherwise(col("z") * 4 + lit(1) + expr(
            """case substring(w, z + 1, 1)
                 when '1' then 3
                 when '2' then 2 when '3' then 2
                 when '4' then 1 when '5' then 1
                 when '6' then 1 when '7' then 1
                 else 0 end""")))
      .groupBy(col("grp"), col("register"))
      .agg(max(col("rho")).as("rho_max"))
  }

  /** Cardinality estimate from an HLL register relation — the RAW
    * harmonic-mean estimator in exact fixed-point integers (documented
    * variant: no small-range linear-counting branch, which needs a log;
    * callers needing the small regime have [[kmvSketch]]). The harmonic
    * sum is scaled by `2^K` (K = max rho) so every term is an integer:
    * absent registers contribute `2^K`, present ones `2^(K−rho)`. Alpha
    * is the standard `0.7213/(1 + 1.079/m)` as an exact rational
    * `7213000·m / (10000·(1000·m + 1079))`; the final divide runs in
    * DECIMAL(38,0) — both engines produce identical digits. */
  def hllEstimate(regs: DataFrame, regHex: Int = 2,
                  windowHex: Int = 12): DataFrame = {
    val m = 1L << (4 * regHex)
    val kBits = 4 * windowHex + 1
    val pow2K = 1L << kBits
    val alphaNum = 7213000L * m
    val alphaDen = 10000L * (1000L * m + 1079L)
    regs.groupBy(col("grp"))
      .agg((sum(expr(s"shiftleft(1L, $kBits - rho_max)")) +
        (lit(m) - count(lit(1))) * lit(pow2K)).as("s_scaled"))
      .withColumn("hll_estimate", expr(
        s"""(cast(${alphaNum}L as decimal(38,0)) * $m * $m * ${pow2K}L)
            div (cast(${alphaDen}L as decimal(38,0)) * s_scaled)"""))
      .drop("s_scaled")
  }

  /** Merge KMV sketches (schema `(group, hs)`, group = first column):
    * slots union, bottom-k re-taken — the sketch of a corpus union, so
    * incremental maintenance appends a batch sketch and compacts
    * (bounded work per batch), never re-scans the corpus. `SketchesSpec`
    * pins batch-merge ≡ one-shot. */
  /** Pairwise set-operation estimates from per-group KMV sketches
    * (Beyer et al., SIGMOD 2007): for every unordered group pair, the
    * union slots are the bottom-k of the two slot arrays, the union
    * estimate the standard `(k−1)·SPACE / h_(k)` (exact when the merged
    * slots ARE the union set), and the intersection count the union
    * slots present in BOTH sketches — yielding `jaccard_ppm` and
    * `inter_est` with one integral divide each.
    *
    * Scale shape: input is one k-slot row per group, so the pair stage
    * is sketch×sketch — metadata scale no matter how large the groups
    * were. Callers persist the sketch relation (both join sides read
    * it). */
  def kmvPairSimilarity(sketch: DataFrame, k: Int,
                        groupCol: String = "source"): DataFrame = {
    require(k >= 2 && k <= 128, "need 2 <= k <= 128 (estimator range)")
    val num = (k - 1).toLong * KmvSpace
    val a = sketch.select(col(groupCol).as("src_lo"), col("hs").as("hs_a"))
    val b = sketch.select(col(groupCol).as("src_hi"), col("hs").as("hs_b"))
    a.join(b, col("src_lo") < col("src_hi"))
      .withColumn("merged",
        expr(s"slice(array_sort(array_union(hs_a, hs_b)), 1, $k)"))
      .withColumn("n_u", size(col("merged")).cast("long"))
      .withColumn("kth",
        expr(s"CASE WHEN n_u = $k THEN element_at(merged, $k) " +
          "ELSE 0L END"))
      .withColumn("union_est",
        expr(s"CASE WHEN n_u < $k THEN n_u " +
          s"ELSE ${num}L div greatest(kth, 1L) END"))
      .withColumn("inter_cnt",
        size(expr("array_intersect(merged, array_intersect(hs_a, hs_b))"))
          .cast("long"))
      .select(col("src_lo"), col("src_hi"), col("n_u"),
        col("union_est"), col("inter_cnt"),
        expr("inter_cnt * 1000000 div n_u").as("jaccard_ppm"),
        expr("inter_cnt * union_est div n_u").as("inter_est"))
  }

  def mergeKmv(k: Int, parts: DataFrame*): DataFrame = {
    val u = parts.reduce(_ unionByName _)
    val g = u.columns.head
    val bottomK = udaf(new graft.functions.BottomKAggregator(k))
    u.select(col(g), explode(col("hs")).as("h"))
      .groupBy(col(g))
      .agg(bottomK(col("h")).as("hs"))
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
