package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011) — the compression end-state of the ANN
  * ladder (brute float → sign-LSH → IVF → int8 → PQ): the vector is split
  * into `m` subspaces, each subvector replaced by the index of its nearest
  * codeword, so a dim-64 float32 vector (256 bytes) stores as m=8 SMALL
  * INTS — a 32× shrink that turns a 100 TB embedding corpus into ~3 TB of
  * codes that fit in cluster memory.
  *
  * Probing is ADC (asymmetric distance computation): the query stays
  * full-precision; a per-query m×k lookup table of query-to-codeword dot
  * products is computed once on the driver (kilobytes, broadcast as a
  * literal) and each stored vector scores with m array lookups + m−1 adds
  * — the float corpus is never read at probe time. Every accumulation is
  * ascending-index and left-associated, so an external SQL engine
  * reproduces scores AND ranks bit-for-bit (q90's DuckDB oracle).
  *
  * Training here is the deterministic seed-pick scheme the IVF path (q49)
  * uses — codeword c of subspace j is seed c's j-th subvector — so tests
  * and oracles are reproducible without iterative k-means; a k-means
  * trainer plugs into [[Model]] without touching encode/probe.
  */
object ProductQuantizer {

  /** Trained codebooks, shaped [m][k][dim/m]. */
  case class Model(codebooks: Array[Array[Array[Double]]]) {
    require(codebooks.nonEmpty && codebooks.head.nonEmpty)
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
    def subDim: Int = codebooks.head.head.length
    def codebookSeq: Seq[Seq[Seq[Double]]] =
      codebooks.map(_.map(_.toSeq).toSeq).toSeq

    /** ADC table: table[j][c] = ⟨query_sub_j, codebook[j][c]⟩, accumulated
      * ascending and left-associated (the order the oracle mirrors). */
    def adcTable(query: Array[Double]): Seq[Seq[Double]] = {
      require(query.length == m * subDim,
        s"query dim ${query.length} != $m x $subDim")
      (0 until m).map { j =>
        (0 until k).map { c =>
          var s = 0.0
          var d = 0
          while (d < subDim) {
            s += query(j * subDim + d) * codebooks(j)(c)(d)
            d += 1
          }
          s
        }
      }
    }
  }

  /** Trained codebooks: one KMeans per subspace over the sliced
    * subvectors (MLlib — sampled, seeded, bounded iterations). This is
    * the production-quality trainer; [[train]]'s seed-pick stays as the
    * oracle-reproducible scheme. m small fits over dim/m-dimensional
    * points — training cost is bounded by `sampleFraction`, independent
    * of corpus size. */
  def trainKMeans(emb: DataFrame, k: Int, m: Int, dim: Int,
                  embCol: String = "embedding", seed: Long = 42L,
                  sampleFraction: Double = 1.0, maxIter: Int = 20): Model = {
    require(m > 0 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val base =
      if (sampleFraction >= 1.0) emb
      else emb.sample(withReplacement = false, sampleFraction, seed)
    // ONE corpus scan: all m subvector slices are materialized together
    // and cached across the m per-subspace fits — m KMeans over an
    // in-memory (sample × m·subDim) projection, not m re-reads of a
    // 100 TB embedding column.
    val sliced = base.select((0 until m).map { j =>
      org.apache.spark.ml.functions.array_to_vector(
        slice(col(embCol).cast("array<double>"), j * subDim + 1, subDim))
        .as(s"f$j")
    }: _*).cache()
    try {
      Model(Array.tabulate(m) { j =>
        new org.apache.spark.ml.clustering.KMeans()
          .setK(k).setSeed(seed + j).setMaxIter(maxIter)
          .setFeaturesCol(s"f$j")
          .fit(sliced).clusterCenters.map(_.toArray)
      })
    } finally { sliced.unpersist(); () }
  }

  /** Persist the codebooks: (j, c, codeword) parquet — kilobytes; train
    * once, encode/probe from any session (parity with IvfIndex models). */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
                path: String): Unit = {
    import spark.implicits._
    (for {
      j <- 0 until model.m
      c <- 0 until model.k
    } yield (j, c, model.codebooks(j)(c).toSeq))
      .toDF("j", "c", "codeword")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Model = {
    val rows = spark.read.parquet(path).orderBy(col("j"), col("c"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1),
        r.getAs[scala.collection.Seq[Double]]("codeword").toArray))
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    val cbs = Array.ofDim[Array[Double]](m, k)
    rows.foreach { case (j, c, cw) => cbs(j)(c) = cw }
    Model(cbs.map(_.toArray))
  }

  /** Mean per-vector quantization error (Σ_j min_c L2²) — the objective
    * KMeans minimizes; use it to compare trainers. Driver-side over a
    * collected sample. */
  def quantizationError(model: Model, vecs: Array[Array[Double]]): Double = {
    require(vecs.nonEmpty)
    vecs.map { v =>
      (0 until model.m).map { j =>
        (0 until model.k).map { c =>
          var s = 0.0
          var d = 0
          while (d < model.subDim) {
            val diff = v(j * model.subDim + d) - model.codebooks(j)(c)(d)
            s += diff * diff
            d += 1
          }
          s
        }.min
      }.sum
    }.sum / vecs.length
  }

  /** Deterministic "training": codeword c of subspace j = seed c's j-th
    * subvector, seeds in ascending id order. Seeds are a driver-side
    * collect of |seedIds| rows — metadata scale. */
  def train(emb: DataFrame, seedIds: Seq[Long], m: Int, dim: Int,
            idCol: String = "vec_id", embCol: String = "embedding"): Model = {
    require(m > 0 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val seeds = emb.filter(col(idCol).isInCollection(seedIds))
      .orderBy(col(idCol)).select(col(embCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(seeds.length == seedIds.length, "missing seed vectors")
    val codebooks = Array.tabulate(m, seeds.length) { (j, c) =>
      java.util.Arrays.copyOfRange(seeds(c), j * subDim, (j + 1) * subDim)
    }
    Model(codebooks)
  }

  /** Encode: adds `codesCol` = array<int> of length m via the native
    * [[graft.functions.PqEncode]] kernel (codegen'd loop, codebook inlined
    * as a literal — no join, no UDF). This is the write-path step: at rest
    * the corpus stores (id, codes) and drops the float column. */
  def encode(df: DataFrame, model: Model, embCol: String = "embedding",
             codesCol: String = "pq_codes"): DataFrame =
    df.withColumn(codesCol,
      VectorFunctions.pqEncode(col(embCol), model.codebookSeq))

  /** ADC top-k: score = Σ_j table[j][codes[j]] — m lookups per stored
    * vector into the broadcast literal table, never the float corpus.
    * The fold over subspaces is ascending and left-associated (aggregate
    * is a left fold), matching [[Model.adcTable]]'s per-entry order. */
  def adcTopK(encoded: DataFrame, model: Model, query: Array[Double],
              kTop: Int, idCol: String = "vec_id",
              codesCol: String = "pq_codes"): DataFrame = {
    val tLit = typedlit(model.adcTable(query))
    val score = aggregate(
      sequence(lit(0), lit(model.m - 1)), lit(0.0d),
      (acc, j) => acc +
        element_at(element_at(tLit, j + 1),
          element_at(col(codesCol), j + 1) + 1))
    encoded
      .withColumn("pq_score", score)
      .select(col(idCol), col(codesCol), col("pq_score"))
      .orderBy(col("pq_score").desc, col(idCol))
      .limit(kTop)
  }

  /** ADC shortlist + exact re-rank — the production serving shape. The
    * compressed scan ranks EVERY row with m table lookups ([[adcTopK]]);
    * the float corpus is then consulted for only the `shortlist`
    * survivors (an id equi-join against a LIMIT-bounded side — at rest a
    * handful of point reads, never a scan); the final top-k is exact
    * cosine. Compression errors that perturb the near-tie ordering are
    * repaired whenever the true top-k survives into the shortlist, so
    * recall climbs from the pure-ADC curve toward 1.0 at shortlist/k of
    * 4–8 for the cost of `shortlist` float-row fetches. */
  def adcRerankTopK(encoded: DataFrame, embeddings: DataFrame,
                    model: Model, query: Array[Double], kTop: Int,
                    shortlist: Int, dim: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    codesCol: String = "pq_codes"): DataFrame = {
    require(shortlist >= kTop, "shortlist must cover kTop")
    val cand = adcTopK(encoded, model, query, kTop = shortlist,
      idCol = idCol, codesCol = codesCol).select(col(idCol))
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val dot = VectorFunctions.dotNative(col(vecCol), typedlit(query.toSeq))
    embeddings.join(broadcast(cand), Seq(idCol))
      .withColumn("score",
        dot / (Similarity.norm(col(vecCol), dim) * lit(qNorm)))
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(kTop)
  }

  /** SQL mirrors for the DuckDB oracle (1-based, end-inclusive slices). */
  object Sql {
    /** Codebook CTE: (j, c, cw) — subspace j, code c = dense seed rank,
      * codeword = seed's j-th subvector as DOUBLEs. */
    def codebookCte(seedIds: Seq[Long], m: Int, subDim: Int): String =
      s"""cb AS (
         SELECT j.j, CAST(s.rk - 1 AS INT) AS c,
           list_transform(s.embedding[j.j * $subDim + 1 : j.j * $subDim + $subDim],
             x -> CAST(x AS DOUBLE)) AS cw
         FROM (SELECT embedding,
                 ROW_NUMBER() OVER (ORDER BY vec_id) AS rk
               FROM embeddings
               WHERE vec_id IN (${seedIds.mkString(", ")})) s,
              (SELECT unnest(range(0, $m)) AS j) j)"""

    /** Codebook CTE from TRAINED codewords, rendered as literals: the
      * oracle engine cannot run KMeans, so the model the Spark side
      * trained is pinned into the SQL verbatim. Doubles render in their
      * shortest round-trip form with a forced exponent (a bare decimal
      * literal would parse as DECIMAL and lose ulps), so both engines
      * score against bit-identical codewords. */
    def literalCodebookCte(codebooks: Seq[Seq[Seq[Double]]]): String = {
      def dlit(d: Double): String = {
        val s = d.toString
        if (s.contains('E') || s.contains('e')) s else s + "e0"
      }
      val rows = for {
        (cb, j) <- codebooks.zipWithIndex
        (cw, c) <- cb.zipWithIndex
      } yield s"($j, $c, [${cw.map(dlit).mkString(", ")}])"
      s"cb AS (SELECT * FROM (VALUES ${rows.mkString(", ")}) AS cbv(j, c, cw))"
    }

    /** Left-associated chain for the L2² distance between a vector's j-th
      * subvector and a codeword (j is a column, element index literal). */
    def subDistChain(emb: String, jCol: String, cw: String,
                     subDim: Int): String =
      (1 to subDim).map { d =>
        val x = s"(CAST($emb[$jCol * $subDim + $d] AS DOUBLE) - $cw[$d])"
        s"$x * $x"
      }.mkString(" + ")

    /** ADC score as m parenthesized subDim-term chains, summed ascending
      * left-associated over a reconstructed (flattened) codeword list —
      * bitwise-identical to adcTable + the aggregate fold. */
    def adcScoreChain(q: String, recon: String, m: Int,
                      subDim: Int): String =
      (0 until m).map { j =>
        "(" + (1 to subDim).map { d =>
          val off = j * subDim + d
          s"CAST($q[$off] AS DOUBLE) * $recon[$off]"
        }.mkString(" + ") + ")"
      }.mkString(" + ")
  }
}
