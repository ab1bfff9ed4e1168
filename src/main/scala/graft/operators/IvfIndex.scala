package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour index.
  *
  * The scale path for similarity search beyond sign-LSH: learn `nlist`
  * centroids (KMeans over a sample), assign every vector to its nearest
  * centroid ("cell"), store the corpus partitioned by cell. A probe scores
  * centroids on the driver (nlist is small), picks the `nprobe` nearest
  * cells, and scans ONLY those — at 100 TB the cell id is the physical
  * partition key, so a probe reads `nprobe/nlist` of the data, and the
  * centroid table is a broadcast-sized artifact.
  *
  * Training cost is bounded by sampling; assignment is one codegen-friendly
  * pass (broadcast centroids, argmin over nlist dot products).
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Double]]) {
    def nlist: Int = centroids.length

    /** Nearest-centroid ids for a query vector, by cosine. */
    def nearestCells(q: Array[Double], nprobe: Int): Seq[Int] = {
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < a.length) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      centroids.indices.sortBy(i => -cos(q, centroids(i))).take(nprobe)
    }
  }

  /** Train centroids on (a sample of) the corpus. Deterministic via seed. */
  def train(embeddings: DataFrame, nlist: Int, dim: Int,
            vecCol: String = "embedding", seed: Long = 42L,
            sampleFraction: Double = 1.0): Model = {
    val base =
      if (sampleFraction >= 1.0) embeddings
      else embeddings.sample(withReplacement = false, sampleFraction, seed)
    val features = base.select(
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features")
    val model = km.fit(features)
    Model(model.clusterCenters.map(_.toArray))
  }

  /** Cell assignment as a pure Column expression: argmax of cosine against
    * each (broadcast, literal) centroid — stays inside codegen, no UDF. */
  def cellColumn(model: Model, vecCol: Column, dim: Int): Column = {
    val scored: Seq[(Int, Column)] = model.centroids.zipWithIndex.map {
      case (ctr, idx) =>
        val dot = (0 until dim)
          .map(i => vecCol.getItem(i).cast("double") * lit(ctr(i)))
          .reduce(_ + _)
        val cnorm = math.sqrt(ctr.map(x => x * x).sum)
        (idx, dot / (Similarity.norm(vecCol, dim) * lit(cnorm)))
    }.toSeq
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit(-1): Column) { case ((idx, s), acc) =>
      when(s === best, lit(idx)).otherwise(acc)
    }
  }

  /** Index the corpus: add the `ivf_cell` column (callers then write
    * `partitionBy("ivf_cell")`). */
  def assign(embeddings: DataFrame, model: Model, dim: Int,
             vecCol: String = "embedding"): DataFrame =
    embeddings.withColumn("ivf_cell", cellColumn(model, col(vecCol), dim))

  /** Probe: top-k by cosine among the nprobe nearest cells only. */
  def probe(indexed: DataFrame, model: Model, query: Array[Double], k: Int,
            nprobe: Int, dim: Int, idCol: String = "vec_id",
            vecCol: String = "embedding"): DataFrame = {
    val cells = model.nearestCells(query, nprobe)
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val dot = (0 until dim)
      .map(i => col(vecCol).getItem(i).cast("double") * lit(query(i)))
      .reduce(_ + _)
    indexed
      .filter(col("ivf_cell").isInCollection(cells))
      .withColumn("score", dot / (Similarity.norm(col(vecCol), dim) * lit(qNorm)))
      .select(col(idCol), col("ivf_cell"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
