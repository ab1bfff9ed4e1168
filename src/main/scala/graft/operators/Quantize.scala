package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Int8 scalar quantization for embedding columns — the memory-bandwidth
  * scale path for similarity search.
  *
  * Each vector gets a per-vector scale (`max_abs / 127`) and an
  * `array<int>` of quantized components
  * `q_i = floor(x_i * 127 / max_abs + 0.5)` — symmetric round-half-up
  * written as floor so every step is an exact IEEE-754 double op that any
  * engine reproduces bit-for-bit (no ties-to-even ambiguity, which is why
  * the DuckDB oracle can hash-match the quantized vectors AND the ranking).
  *
  * Scoring happens entirely in integers ([[graft.functions.IntDotProduct]]
  * → exact 64-bit sums): quantized cosine =
  * `qdot / (sqrt(qnorm_a) * sqrt(qnorm_b))` — the per-vector scales cancel
  * in cosine, so they are only needed to reconstruct approximate values,
  * not to rank. At 100 TB this quarters the bytes scanned per probe and
  * replaces float math in the hot loop with integer math; recall vs the
  * float baseline is pinned in the spec.
  */
object Quantize {

  /** Add `max_abs` (double) and `qvec` (array<int>) columns. An all-zero
    * vector quantizes to all zeros (guarded — no 0/0 NaN). */
  def int8(df: DataFrame, embCol: String = "embedding",
           qvecCol: String = "qvec"): DataFrame = {
    val e = col(embCol)
    val maxAbs = aggregate(e, lit(0.0d),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    df.withColumn("max_abs", maxAbs)
      .withColumn(qvecCol,
        when(col("max_abs") === 0.0d,
          transform(e, _ => lit(0)))
          .otherwise(transform(e,
            x => floor(x.cast("double") * lit(127.0d) / col("max_abs")
              + lit(0.5d)).cast("int"))))
  }

  /** Quantized-cosine brute-force top-k against one stored query vector.
    * Same plan shape as `Similarity.cosineTopK` (per-partition top-k +
    * driver merge); scoring reads the int8 vectors only. */
  def quantizedTopK(df: DataFrame, queryId: Long, k: Int,
                    idCol: String = "vec_id",
                    embCol: String = "embedding"): DataFrame = {
    val q = int8(df, embCol)
    val query = q.filter(col(idCol) === queryId)
      .select(col("qvec").as("q_vec"))
    // an all-zero embedding quantizes to all zeros → 0/0 = NaN score, and
    // NaN sorts GREATEST descending — drop zero-norm vectors before ranking
    // (a zero vector has no cosine direction; the oracle filters the same)
    q.filter(col(idCol) =!= queryId)
      .filter(VectorFunctions.intDotNative(col("qvec"), col("qvec")) > 0)
      .crossJoin(broadcast(query))
      .withColumn("qdot", VectorFunctions.intDotNative(col("qvec"), col("q_vec")))
      .withColumn("score",
        col("qdot").cast("double") /
          (sqrt(VectorFunctions.intDotNative(col("qvec"), col("qvec"))
             .cast("double")) *
           sqrt(VectorFunctions.intDotNative(col("q_vec"), col("q_vec"))
             .cast("double"))))
      .select(col(idCol), col("qdot"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** SQL mirrors for the DuckDB oracle. */
  object Sql {
    /** Quantized list: `list_transform(emb, x -> CAST(floor(...) AS INT))`
      * with the zero-vector guard, matching [[int8]] exactly. */
    def qvec(emb: String, maxAbs: String): String =
      s"CASE WHEN $maxAbs = 0 THEN list_transform($emb, x -> 0) " +
        s"ELSE list_transform($emb, x -> CAST(floor(CAST(x AS DOUBLE) " +
        s"* 127.0 / $maxAbs + 0.5) AS INT)) END"

    def maxAbs(emb: String): String =
      s"CAST(list_aggregate(list_transform($emb, x -> abs(CAST(x AS DOUBLE))), 'max') AS DOUBLE)"

    /** Exact BIGINT dot chain over two INT lists (1-based indexing). */
    def intDot(a: String, b: String, dim: Int): String =
      (1 to dim)
        .map(i => s"CAST($a[$i] AS BIGINT) * CAST($b[$i] AS BIGINT)")
        .mkString(" + ")
  }
}
