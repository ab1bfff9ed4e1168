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

    /** Nearest-centroid ids for a query vector, ranked by `dot/||c||` —
      * the query norm is a positive constant across centroids, so this is
      * the cosine ranking; the formula matches [[cellColumn]]'s kernel and
      * the oracle's SQL chain operation-for-operation (bitwise stable).
      * Ties keep centroid-index order (stable sort). */
    def nearestCells(q: Array[Double], nprobe: Int): Seq[Int] = {
      def score(c: Array[Double]): Double = {
        var dot = 0.0; var nc = 0.0
        var i = 0
        while (i < c.length) { dot += q(i) * c(i); nc += c(i) * c(i); i += 1 }
        dot / math.sqrt(nc)
      }
      centroids.indices.sortBy(i => -score(centroids(i))).take(nprobe)
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

  /** Cell assignment as a pure Column expression: argmax of `dot/||c||`
    * (= cosine argmax — the row's own norm is constant) against the literal
    * centroid table, via the [[graft.functions.NearestCentroid]] kernel.
    *
    * Why a kernel and not a chain: per-dimension literal chains are
    * nlist × dim expression nodes — at nlist=1024, dim=768 that is ~1.6M
    * nodes and a guaranteed janino 64KB blowout kicking the whole stage out
    * of codegen. The kernel is a nested loop: O(1) bytecode at any
    * nlist/dim, one pass, no row blowup, no shuffle.
    *
    * `dim` validates the model: the kernel trusts centroid length, so a
    * model trained at another dimensionality must fail fast here rather
    * than score garbage. */
  def cellColumn(model: Model, vecCol: Column, dim: Int): Column = {
    require(model.centroids.forall(_.length == dim),
      s"model dimensionality ${model.centroids.headOption.fold(0)(_.length)} != expected $dim")
    graft.functions.VectorFunctions.nearestCentroid(
      vecCol, model.centroids.map(_.toSeq).toSeq)
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
    // kernel dot against the literal query vector (sequential element-order
    // accumulation — bitwise-equal to the chain and to the oracle's SQL)
    val dot = graft.functions.VectorFunctions.dotNative(
      col(vecCol), typedlit(query.toSeq))
    indexed
      .filter(col("ivf_cell").isInCollection(cells))
      .withColumn("score", dot / (Similarity.norm(col(vecCol), dim) * lit(qNorm)))
      .select(col(idCol), col("ivf_cell"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
