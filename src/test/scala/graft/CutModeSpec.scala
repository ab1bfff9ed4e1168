package graft

/** Pins the [[Cut]] contract (r17 verdict item #8): the cluster-safe
  * `reliable` checkpoint mode is bit-identical to the default `local`
  * mode on a cut-heavy query path — the switch changes durability, never
  * results. q251 exercises the full discipline: the pairsCache DirCache
  * artifact, degreeJoin's edge-scale cut, and five per-iteration cuts.
  * ArtifactCaches.clearAll between runs forces every artifact to rebuild
  * under the new mode (also pinning the cold-mode hook the bench's
  * SPARK_GRAFT_BENCH_COLD=1 path relies on). */
class CutModeSpec extends SparkSpec {
  test("reliable checkpoint mode is bit-identical to local mode") {
    val dir = sf("sf0.001")
    val fn = SparkEntry.queries("q251_pagerank")
    def rows(): Seq[String] =
      fn(spark, dir).collect().map(_.toString).toSeq
    ArtifactCaches.clearAll(spark)
    val local = rows()
    spark.conf.set("spark.graft.checkpoint.mode", "reliable")
    try {
      ArtifactCaches.clearAll(spark) // rebuild every artifact reliably
      val reliable = rows()
      assert(reliable == local)
      // the mode really was in force: the session now has a checkpoint
      // dir (set lazily by Cut on the first reliable cut)
      assert(spark.sparkContext.getCheckpointDir.nonEmpty)
    } finally {
      spark.conf.set("spark.graft.checkpoint.mode", "local")
      ArtifactCaches.clearAll(spark)
    }
  }

  test("clearAll forces artifact rebuild from the parquet inputs") {
    val dir = sf("sf0.001")
    val fn = SparkEntry.queries("q266_copurchase_core")
    val first = fn(spark, dir).collect().map(_.toString).toSeq
    ArtifactCaches.clearAll(spark)
    // the artifact chain (coreCache -> pairsCache) is cold again; the
    // rebuilt result must match the released one exactly
    val rebuilt = fn(spark, dir).collect().map(_.toString).toSeq
    assert(rebuilt == first)
  }
}
