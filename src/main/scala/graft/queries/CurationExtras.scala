package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{IvfIndex, Similarity}

/** Curation operators rounding out the pipeline surface: blocked fuzzy
  * matching (edit distance over a blocked TYPE vocabulary), deterministic
  * hash sampling (the reproducible stand-in for reservoir sampling), and
  * SemDeDup-style embedding-cluster near-dup pruning (Abbas et al. 2023:
  * cluster the embedding space, drop within-cluster cosine near-dups).
  */
object CurationExtras {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** q188: max edit distance for a fuzzy name match. */
  val FuzzyMaxDist = 2
  /** q189: deterministic sample size per source stratum. */
  val SamplePerSource = 5
  /** q190 reuses the q49 fixed-centroid IVF scheme + CosineThreshold. */

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Blocked fuzzy match: near-identical part names by edit distance,
    // blocked on the name's noun so the pair space is per-block, never
    // all-pairs. Runs on the DISTINCT name TYPE vocabulary (Zipf-small —
    // at 100 TB the distinct relation is the tiny side; the corpus is
    // only touched to count occurrences), the same types-not-tokens
    // shape as BPE training.
    "q188_fuzzy_name_match" -> { (s, dir) =>
      val names = t(s, dir, "part")
        .groupBy(col("p_name"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("noun", split(col("p_name"), " ").getItem(1))
      val a = names.select(col("noun"), col("p_name").as("name_a"),
        col("cnt").as("parts_a"))
      val b = names.select(col("noun").as("noun_b"),
        col("p_name").as("name_b"), col("cnt").as("parts_b"))
      a.join(b, col("noun") === col("noun_b") &&
          col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= FuzzyMaxDist)
        .select(col("name_a"), col("name_b"),
          col("dist").cast("long").as("dist"),
          col("parts_a"), col("parts_b"))
        .orderBy(col("name_a"), col("name_b"))
    },

    // Deterministic stratified hash sample: k docs per source, chosen by
    // md5 rank — same docs every run, every engine, any partitioning (the
    // reproducible replacement for rand() sampling; seed changes = change
    // the salt). The rank window is per-source and the sample is top-k,
    // so at scale this is a partial top-k per group, not a global sort.
    "q189_hash_sample" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("h"), col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"))
        .withColumn("h",
          md5(concat(lit("smp|"), col("doc_id").cast("string"))))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= SamplePerSource)
        .select(col("source"), col("doc_id"),
          col("rk").cast("long").as("rk"))
        .orderBy(col("source"), col("rk"))
    },

    // SemDeDup: assign embeddings to the fixed q49 IVF centroids, then
    // drop any vector with a smaller-id within-cell cosine near-dup —
    // the pair join is per-cell (the SemDeDup point: clustering makes
    // near-dup pruning an equi-join, never corpus², and cells shard
    // independently across executors). Emits the per-cell keep/drop
    // audit a curation run reports.
    "q190_semdedup" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      val seeds = emb
        .filter(col("vec_id").isInCollection(PipelineQueries.IvfSeedIds))
        .orderBy(col("vec_id")).select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray)
      val centroids = seeds.map { c =>
        val nrm = math.sqrt(c.map(x => x * x).sum)
        c.map(_ / nrm)
      }
      val dim = PipelineQueries.Dim
      val assigned = IvfIndex.assign(emb, IvfIndex.Model(centroids), dim)
        .withColumn("nrm", Similarity.norm(col("embedding"), dim))
      val a = assigned.select(col("ivf_cell"), col("vec_id").as("id_a"),
        col("embedding").as("va"), col("nrm").as("na"))
      val b = assigned.select(col("ivf_cell").as("cell_b"),
        col("vec_id").as("id_b"), col("embedding").as("vb"),
        col("nrm").as("nb"))
      val dropped = a
        .join(b, col("ivf_cell") === col("cell_b") &&
          col("id_a") < col("id_b"))
        .withColumn("score",
          Similarity.dot(col("va"), col("vb"), dim) /
            (col("na") * col("nb")))
        .filter(col("score") >= PipelineQueries.CosineThreshold)
        .select(col("ivf_cell"), col("id_b").as("vec_id")).distinct()
        .groupBy(col("ivf_cell")).agg(count(lit(1)).as("n_dropped"))
      assigned.groupBy(col("ivf_cell"))
        .agg(count(lit(1)).as("n_vectors"))
        .join(dropped, Seq("ivf_cell"), "left_outer")
        .select(col("ivf_cell"), col("n_vectors"),
          coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
          (col("n_vectors") - coalesce(col("n_dropped"), lit(0L)))
            .as("n_kept"))
        .orderBy(col("ivf_cell"))
    })

  def oracles: Map[String, String] = Map(

    "q188_fuzzy_name_match" ->
      s"""WITH names AS (SELECT p_name, COUNT(*) AS cnt,
           split_part(p_name, ' ', 2) AS noun
         FROM part GROUP BY 1)
         SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           a.cnt AS parts_a, b.cnt AS parts_b
         FROM names a JOIN names b
           ON a.noun = b.noun AND a.p_name < b.p_name
         WHERE levenshtein(a.p_name, b.p_name) <= $FuzzyMaxDist
         ORDER BY name_a, name_b""",

    "q189_hash_sample" ->
      s"""WITH h AS (SELECT source, doc_id,
           md5('smp|' || CAST(doc_id AS VARCHAR)) AS h
         FROM documents),
         r AS (SELECT source, doc_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY source
             ORDER BY h, doc_id) AS BIGINT) AS rk
           FROM h)
         SELECT source, doc_id, rk FROM r
         WHERE rk <= $SamplePerSource ORDER BY source, rk""",

    "q190_semdedup" -> {
      val ctrNormSq = Similarity.Sql.normSq("embedding", PipelineQueries.Dim)
      val cvecNormSq = Similarity.Sql.normSq("c.cvec", PipelineQueries.Dim)
      val dim = PipelineQueries.Dim
      s"""WITH ctr AS (
           SELECT CAST(vec_id - 1 AS INT) AS cell,
             list_transform(embedding,
               x -> CAST(x AS DOUBLE) / sqrt($ctrNormSq)) AS cvec
           FROM embeddings
           WHERE vec_id IN (${PipelineQueries.IvfSeedIds.mkString(", ")})),
         rk AS (
           SELECT e.vec_id, c.cell,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY (${Similarity.Sql.dot("e.embedding", "c.cvec", dim)})
                 / sqrt($cvecNormSq) DESC, c.cell) AS rk
           FROM embeddings e CROSS JOIN ctr c),
         asg AS (SELECT r.vec_id, r.cell,
             e.embedding,
             sqrt(${Similarity.Sql.normSq("e.embedding", dim)}) AS nrm
           FROM rk r JOIN embeddings e USING (vec_id) WHERE r.rk = 1),
         pairs AS (SELECT a.cell, b.vec_id AS id_b
           FROM asg a JOIN asg b
             ON a.cell = b.cell AND a.vec_id < b.vec_id
           WHERE (${Similarity.Sql.dot("a.embedding", "b.embedding", dim)})
             / (a.nrm * b.nrm) >= ${PipelineQueries.CosineThreshold}),
         dropped AS (SELECT cell, COUNT(DISTINCT id_b) AS n_dropped
           FROM pairs GROUP BY 1),
         cells AS (SELECT cell, COUNT(*) AS n_vectors FROM asg GROUP BY 1)
         SELECT c.cell AS ivf_cell, c.n_vectors,
           COALESCE(d.n_dropped, 0) AS n_dropped,
           c.n_vectors - COALESCE(d.n_dropped, 0) AS n_kept
         FROM cells c LEFT JOIN dropped d USING (cell)
         ORDER BY ivf_cell"""
    })
}
