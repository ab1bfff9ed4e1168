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

  /** Self-scaling cell count: `ceil(n / target)` clamped to
    * `[minCells, maxCells]` (and to `n`) — enough cells that the expected
    * population stays ≤ `target` as the corpus grows. A FIXED nlist lets
    * per-cell population grow with n, so any within-cell pair stage
    * (SemDeDup) goes quadratic — measured: q190's exponent 3.5→~1.0 at the
    * x8/x32 scale probe once the count scales. Integer-exact so a SQL
    * oracle derives the identical count via `(n + target - 1) // target`.
    * `maxCells` bounds the broadcast centroid table (4096 × dim doubles ≈
    * 2 MB at dim 64); past `maxCells · target` vectors, train a real
    * k-means model and let the persisted index's coarse quantizer take
    * over assignment — the cap is the hand-off point, not a wall. */
  def autoCellCount(n: Long, target: Long = 512L,
                    minCells: Int = 4, maxCells: Int = 4096): Int = {
    // overflow-safe ceil-div (n + target - 1 wraps near Long.MaxValue)
    val cells = n / target + (if (n % target > 0) 1L else 0L)
    math.min(n max 1L,
      math.max(minCells.toLong, math.min(maxCells.toLong, cells))).toInt
  }

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

  /** Persist the trained model: a broadcast-sized (cell_id, centroid)
    * parquet next to the indexed corpus — train once, probe from any
    * session. One file; the model is metadata, not data. */
  def saveModel(spark: org.apache.spark.sql.SparkSession, model: Model,
                path: String): Unit = {
    import spark.implicits._
    model.centroids.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): Model =
    Model(spark.read.parquet(path).orderBy(col("cell_id")).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("centroid").toArray))

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

  /** Persist the indexed corpus PARTITIONED BY CELL: the cell directory
    * is the physical pruning unit — a probe's `ivf_cell IN (...)` filter
    * becomes partition pruning at file-listing time, so a probe reads
    * ~nprobe/nlist of the FILES, not merely of the rows. */
  def writeIndex(indexed: DataFrame, path: String): Unit =
    indexed.write.partitionBy("ivf_cell").mode("overwrite").parquet(path)

  /** Incremental append: assign a NEW batch with the SAME model and
    * append its rows to the store. Touched cells gain a file; untouched
    * cells are never read or rewritten; nothing rebuilds. With a
    * persisted model ([[saveModel]]) this is the steady-state ingest
    * path — train once, then index arriving embeddings at O(batch) cost
    * forever (the IVF analogue of the streaming-dedup band index). Cells
    * accumulating many small files are reclaimed by the standard
    * compaction pass, not by the ingest path. */
  def appendIndex(batch: DataFrame, model: Model, dim: Int, path: String,
                  vecCol: String = "embedding"): Unit =
    assign(batch, model, dim, vecCol).write.partitionBy("ivf_cell")
      .mode("append").parquet(path)

  /** Read a persisted index back; `ivf_cell` returns as the partition
    * column, so probe filters on the result prune files, not just rows. */
  def readIndex(spark: org.apache.spark.sql.SparkSession,
                path: String): DataFrame =
    spark.read.parquet(path)

  /** Batch probe: top-k per query for a whole DataFrame of query vectors,
    * in ONE relational pass — the serving shape at scale, where probing one
    * query at a time from the driver would serialize a million tiny jobs.
    *
    * Plan shape: (1) queries × centroids broadcast join (nlist is
    * broadcast-sized) + per-query window rank → the `nprobe` probe cells
    * per query; (2) corpus ⋈ probe-cells equi-join on `ivf_cell` — only the
    * probed cells' rows survive the scan (cell = partition key at rest);
    * (3) kernel-scored cosine + per-query window top-k. No driver loop, no
    * per-query job: wall-clock is one shuffle round independent of query
    * count. Scoring is operation-for-operation the single-query [[probe]]
    * formula, so results are bitwise comparable with the oracle. */
  def probeBatch(indexed: DataFrame, model: Model, queries: DataFrame,
                 k: Int, nprobe: Int, dim: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 queryIdCol: String = "q_id", queryVecCol: String = "q_vec")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = indexed.sparkSession
    import spark.implicits._
    val ctr = model.centroids.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }
      .toDF("cell", "cvec")
    // (1) probe cells per query: rank centroids by dot/||c|| per query
    val cellScore = graft.functions.VectorFunctions.dotNative(
      col(queryVecCol), col("cvec")) / Similarity.norm(col("cvec"), dim)
    val cellRank = Window.partitionBy(col(queryIdCol))
      .orderBy(cellScore.desc, col("cell"))
    val probeCells = queries
      .select(col(queryIdCol), col(queryVecCol))
      .crossJoin(broadcast(ctr)) // nlist rows, broadcast-sized by design
      .withColumn("cell_rk", row_number().over(cellRank))
      .filter(col("cell_rk") <= nprobe)
      .select(col(queryIdCol), col(queryVecCol).as("__qv"),
        col("cell").as("ivf_cell"))
    // (2) candidates: equi-join on the probed cells only
    val cand = indexed.join(broadcast(probeCells), Seq("ivf_cell"))
      .filter(col(idCol) =!= col(queryIdCol))
    // (3) score + per-query top-k
    val qNorm = Similarity.norm(col("__qv"), dim)
    val score = graft.functions.VectorFunctions.dotNative(
      col(vecCol), col("__qv")) / (Similarity.norm(col(vecCol), dim) * qNorm)
    val topk = Window.partitionBy(col(queryIdCol))
      .orderBy(col("score").desc, col(idCol))
    cand
      .withColumn("score", score)
      .withColumn("rk", row_number().over(topk))
      .filter(col("rk") <= k)
      .select(col(queryIdCol), col(idCol), col("ivf_cell"), col("score"))
      .orderBy(col(queryIdCol), col("score").desc, col(idCol))
  }

  /** IVF probe scored on int8-quantized vectors — the IVF × [[Quantize]]
    * composition: cell pruning happens against the float centroids
    * (metadata-scale — nlist vectors), candidate scoring reads ONLY the
    * quantized `array<int>` column via exact integer dot products.
    *
    * At rest the corpus stores `(id, ivf_cell, qvec)`; the float embedding
    * is needed once at index time. A probe then touches nprobe/nlist of
    * the data AND a quarter of the bytes per row — the two scale levers
    * compose. The per-vector scales cancel in cosine, so ranking needs no
    * float data at all; the DuckDB oracle reproduces it exactly (q86).
    *
    * `indexedQ` must carry `ivf_cell` ([[assign]]) and `qvecCol`
    * ([[Quantize.int8]]). The query is quantized driver-side with the
    * same exact-double formula. */
  def probeQuantized(indexedQ: DataFrame, model: Model,
                     query: Array[Double], k: Int, nprobe: Int,
                     idCol: String = "vec_id",
                     qvecCol: String = "qvec"): DataFrame = {
    val cells = model.nearestCells(query, nprobe)
    val maxAbs = query.foldLeft(0.0)((acc, x) => math.max(acc, math.abs(x)))
    val qq: Seq[Int] =
      if (maxAbs == 0.0) Seq.fill(query.length)(0)
      else query.toSeq.map(x => math.floor(x * 127.0 / maxAbs + 0.5).toInt)
    val qNorm = math.sqrt(qq.map(x => x.toLong * x.toLong).sum.toDouble)
    val qdot = graft.functions.VectorFunctions.intDotNative(
      col(qvecCol), typedlit(qq))
    val qnormSelf = org.apache.spark.sql.functions.sqrt(
      graft.functions.VectorFunctions.intDotNative(col(qvecCol), col(qvecCol))
        .cast("double"))
    indexedQ
      .filter(col("ivf_cell").isInCollection(cells))
      // zero-norm guard: an all-zero vector quantizes to all zeros and
      // would score 0/0 = NaN, which sorts FIRST descending
      .filter(graft.functions.VectorFunctions
        .intDotNative(col(qvecCol), col(qvecCol)) > 0)
      .withColumn("qdot", qdot)
      .withColumn("score",
        col("qdot").cast("double") / (qnormSelf * lit(qNorm)))
      .select(col(idCol), col("ivf_cell"), col("qdot"), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

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
