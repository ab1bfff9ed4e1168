package graft.plan

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The q21 chunk-plan shape at catalog scale: cumulative sums over 100k
  * partition keys must match the single-task global-window formulation
  * exactly while keeping every window in the plan partitioned or bounded. */
class CumulativeChunksSpec extends SparkSpec {

  test("matches the global-window cumsum on a 100k-partition catalog") {
    import org.apache.spark.sql.expressions.Window
    val parts = spark.range(100000)
      .select(format_string("%06d", col("id")).as("part_key"),
        (col("id") % 977 + 1).as("n_rows"))
    val planned = CumulativeChunks.plan(parts, "part_key", "n_rows", 50000L)
    val w = Window.orderBy(col("part_key"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = parts
      .withColumn("cum_rows", sum(col("n_rows")).over(w).cast("long"))
      .withColumn("chunk",
        floor((col("cum_rows") - 1) / 50000L).cast("long"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("part_key", "n_rows", "cum_rows", "chunk")
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(key(planned).sameElements(key(naive)))
    // partition layout must not change the plan's output
    assert(key(CumulativeChunks.plan(parts.repartition(13),
      "part_key", "n_rows", 50000L)).sameElements(key(naive)))
    // the helper's plan is clean; the naive formulation is exactly what
    // the auditor exists to catch
    val audited = graft.tools.ExplainAudit.audit(planned, "chunks")
    assert(audited.isEmpty, audited.mkString("\n"))
    assert(graft.tools.ExplainAudit.audit(naive, "naive")
      .exists(_.kind == "global_window"))
  }
}
