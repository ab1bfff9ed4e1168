package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * North-star extension. Two tiers:
  *  - [[cosineTopK]]: brute-force scored scan — the exactness baseline. One
  *    pass over the corpus, no shuffle until the final top-k (which Spark
  *    executes as per-partition top-k + driver merge via `orderBy.limit`).
  *  - [[signLshTopK]]: sign-LSH bucketed variant — the scale path. Vectors
  *    hash to a bucket from the signs of a few fixed projections; the probe
  *    only scores its own bucket. At 100 TB the bucket key becomes the
  *    partition key, so a query touches 1/2^b of the data.
  *
  * Determinism: all dot products are explicit left-associated chains of
  * double ops over `CAST(elem AS DOUBLE)` — bit-for-bit reproducible on any
  * IEEE-754 engine, which lets the DuckDB oracle hash-match scores exactly.
  */
object Similarity {

  /** Dot product — native codegen'd kernel ([[graft.functions.DotProduct]]):
    * sequential accumulation in element order, bitwise-identical to the
    * left-associated chain (and to the oracle's explicit SQL chain) for the
    * fixed-dim vectors this operates on. `dim` documents the contract; the
    * kernel iterates the arrays. */
  def dot(a: Column, b: Column, dim: Int): Column =
    graft.functions.VectorFunctions.dotNative(a, b)

  /** Squared L2 norm via the same kernel. */
  def normSq(a: Column, dim: Int): Column =
    graft.functions.VectorFunctions.dotNative(a, a)

  /** Expression-chain formulations (pre-kernel): kept for cross-checking
    * the kernel's bitwise equivalence in specs. */
  def dotChain(a: Column, b: Column, dim: Int): Column =
    (0 until dim)
      .map(i => a.getItem(i).cast("double") * b.getItem(i).cast("double"))
      .reduce(_ + _)

  def normSqChain(a: Column, dim: Int): Column =
    (0 until dim)
      .map(i => a.getItem(i).cast("double") * a.getItem(i).cast("double"))
      .reduce(_ + _)

  def cosine(a: Column, b: Column, dim: Int): Column =
    dot(a, b, dim) / (sqrt(normSq(a, dim)) * sqrt(normSq(b, dim)))

  /** ANSI/DuckDB SQL mirrors (1-based array indexing). */
  object Sql {
    def dot(a: String, b: String, dim: Int): String =
      (1 to dim)
        .map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
        .mkString(" + ")
    def normSq(a: String, dim: Int): String = dot(a, a, dim)
    def cosine(a: String, b: String, dim: Int): String =
      s"(${dot(a, b, dim)}) / (sqrt(${normSq(a, dim)}) * sqrt(${normSq(b, dim)}))"
  }

  /** Per-row L2 norm, computed once per vector before any pair join — with N
    * candidates per probe this turns 3 length-d chains per pair into 1
    * (`score = dot / (nrm_a * nrm_b)`), same double op order as
    * `dot/(sqrt(na)*sqrt(nb))` so results stay bitwise identical. */
  def norm(a: Column, dim: Int): Column = sqrt(normSq(a, dim))

  /** Brute-force cosine top-k of the corpus against one query vector
    * (given as the row with `idCol == queryId`). */
  def cosineTopK(embeddings: DataFrame, queryId: Long, k: Int, dim: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val withNorm = embeddings
      .withColumn("nrm", norm(col(vecCol), dim))
    val q = withNorm.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), col("nrm").as("q_nrm"))
    withNorm.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("score",
        dot(col(vecCol), col("q_vec"), dim) / (col("nrm") * col("q_nrm")))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Sign-LSH bucket key: one bit per chosen dimension (a fixed, axis-aligned
    * projection family — deterministic across engines, no RNG needed). */
  def signBucket(vec: Column, dims: Seq[Int]): Column =
    dims.zipWithIndex
      .map { case (d, j) =>
        when(vec.getItem(d).cast("double") >= 0d, lit(1L << j)).otherwise(lit(0L))
      }
      .reduce(_ + _)

  /** Bucketed ANN top-k: score only vectors in the query's bucket. Recall is
    * traded for a 2^|dims| reduction in scored candidates; multi-probe =
    * union over neighboring buckets (same plan shape). */
  def signLshTopK(embeddings: DataFrame, queryId: Long, k: Int, dim: Int,
                  bucketDims: Seq[Int] = Seq(0, 1, 2, 3),
                  idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val bucketed = embeddings
      .withColumn("bucket", signBucket(col(vecCol), bucketDims))
      .withColumn("nrm", norm(col(vecCol), dim))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col("bucket"), col(vecCol).as("q_vec"), col("nrm").as("q_nrm"))
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(q), "bucket")
      .withColumn("score",
        dot(col(vecCol), col("q_vec"), dim) / (col("nrm") * col("q_nrm")))
      .select(col(idCol), col("bucket"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Self-scaling sign-LSH bit width: the smallest `b` with
    * `2^b ≥ ceil(n / target)`, clamped to `[minBits, maxBits]` — enough
    * hyperplanes that the EXPECTED bucket population stays ≤ `target` as
    * the corpus grows, which is what keeps the bucketed pair join linear
    * (per-bucket pairs are `C(pop, 2)`; a FIXED bit width lets pop grow
    * with n and the join go quadratic — measured: q35 exponent 1.7→~1.0
    * at the x8/x32 scale probe once the width scales). Integer-exact
    * (bit-length, no float log), so a SQL oracle computes the identical
    * width via `length(bin(ceil(n/target) - 1))`. `maxBits` bounds the
    * bucket-key domain (2^24 buckets ≈ 16M — beyond that, shard the
    * corpus or raise the cap); assignment cost is `n·b`, log-linear. */
  def autoBucketBits(n: Long, target: Long = 256L,
                     minBits: Int = 4, maxBits: Int = 24): Int = {
    // overflow-safe ceil-div (n + target - 1 wraps near Long.MaxValue)
    val m = n / target + (if (n % target > 0) 1L else 0L)
    val raw = if (m <= 1L) 1
              else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.max(minBits, math.min(maxBits, raw))
  }

  /** All near-duplicate pairs with cosine ≥ threshold, bucketed by sign-LSH
    * so the pair join is an equi-join on bucket (not n²). Exact variant for
    * verification sets `bucketDims = Nil` (single bucket). */
  def nearDupPairs(embeddings: DataFrame, threshold: Double, dim: Int,
                   bucketDims: Seq[Int] = Seq(0, 1, 2, 3),
                   idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val withBucket = embeddings
      .withColumn("bucket",
        if (bucketDims.isEmpty) lit(0L) else signBucket(col(vecCol), bucketDims))
      .withColumn("nrm", norm(col(vecCol), dim))
    val l = withBucket.select(col("bucket"), col(idCol).as("id_a"),
                              col(vecCol).as("vec_a"), col("nrm").as("nrm_a"))
    val r = withBucket.select(col("bucket"), col(idCol).as("id_b"),
                              col(vecCol).as("vec_b"), col("nrm").as("nrm_b"))
    l.join(r, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score",
        dot(col("vec_a"), col("vec_b"), dim) / (col("nrm_a") * col("nrm_b")))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /** Embedding-space decontamination: for every corpus vector, the maximum
    * cosine against a benchmark embedding set and whether it crosses the
    * contamination threshold — the semantic complement of the n-gram
    * checks ([[graft.operators.Dedup.contamination]] catches verbatim
    * leaks; this catches paraphrased eval items that share no n-grams).
    * `nearest_bench_id` ties break to the larger id (the `max(struct)`
    * order, mirrored by the oracle's `score DESC, bench_id DESC` rank).
    *
    * Scale shape: the benchmark is eval-sized (10³–10⁶ rows ≪ corpus), so
    * it BROADCASTS and the corpus streams map-only through the scoring
    * join; the per-corpus-row max is a partial aggregation, so the one
    * shuffle carries exactly one row per corpus vector — never the
    * pair space. */
  def embeddingContamination(corpus: DataFrame, benchmark: DataFrame,
                             threshold: Double, dim: Int,
                             idCol: String = "vec_id",
                             vecCol: String = "embedding"): DataFrame = {
    val c = corpus.withColumn("nrm", norm(col(vecCol), dim))
    val b = benchmark
      .select(col(idCol).as("bench_id"), col(vecCol).as("b_vec"))
      .withColumn("b_nrm", norm(col("b_vec"), dim))
    c.crossJoin(broadcast(b))
      .withColumn("score",
        dot(col(vecCol), col("b_vec"), dim) / (col("nrm") * col("b_nrm")))
      .groupBy(col(idCol))
      .agg(max(struct(col("score"), col("bench_id"))).as("m"))
      .select(col(idCol), col("m.score").as("max_score"),
        col("m.bench_id").as("nearest_bench_id"),
        (col("m.score") >= threshold).as("contaminated"))
  }
}
