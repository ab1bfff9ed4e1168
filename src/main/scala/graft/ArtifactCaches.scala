package graft

import org.apache.spark.sql.SparkSession

/** Process-wide registry of the engine's artifact caches (the DirCache
  * family, the one-slot CcArtifact/NbArtifact/BpeModels/PqModels stores,
  * the DsShapes grain slot). Exists for ONE consumer: the bench's cold
  * mode (`SPARK_GRAFT_BENCH_COLD=1`), which must be able to drop every
  * cross-query artifact between timed reps so a query's COLD cost —
  * first-invocation-in-a-session, artifact build included — is measured
  * alongside the warm median (r17 verdict: warm-only medians made
  * "shared artifact" and "query got faster" indistinguishable).
  *
  * Each cache registers a clear function at construction; [[clearAll]]
  * snapshots the list under the registry lock and invokes the clearers
  * OUTSIDE it (each clearer takes its own cache's lock — holding both
  * would order registry→cache here against cache→registry nowhere, but
  * the copy keeps the registry lock trivially short regardless).
  * Clearers release only artifacts belonging to the given session;
  * driver-side models with no Spark storage clear unconditionally. */
object ArtifactCaches {
  private val clearers =
    scala.collection.mutable.ArrayBuffer.empty[SparkSession => Unit]

  def register(clear: SparkSession => Unit): Unit =
    synchronized { clearers += clear }

  /** Drop every registered cache entry owned by `s` (releasing its
    * checkpoint/persist storage) so the next query invocation rebuilds
    * from the parquet inputs — the cold-start contract. */
  def clearAll(s: SparkSession): Unit = {
    val fs = synchronized(clearers.toList)
    fs.foreach(f => f(s))
  }
}
