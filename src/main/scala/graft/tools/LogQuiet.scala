package graft.tools

/** Targeted silencing of two benign-but-voluminous WARN storms that
  * flooded the round-17 driver logs (the 32-core bench tail was
  * thousands of repeated lines, burying the totals the artifact
  * capture needed):
  *
  *  - `org.apache.spark.rdd.*` — "RDD N was locally checkpointed, its
  *    lineage has been truncated and cannot be recomputed after
  *    unpersisting": logged once per released checkpoint by design;
  *    this engine releases superseded checkpoints deliberately (the
  *    iterate/DirCache lifetime rule), so the warning carries no
  *    information here and repeats tens of thousands of times per
  *    bench run.
  *  - `WindowExec` — "No Partition Defined for Window operation": every
  *    unpartitioned window in this engine is over a provably bounded
  *    relation (the ExplainAudit global-window gate enforces exactly
  *    that), so the warning is pre-answered; it repeats per task.
  *
  * Must be called AFTER `sparkContext.setLogLevel(...)` — that call
  * routes through log4j2's `setAllLevels`, which would overwrite these
  * per-logger levels. Failure-safe: if the logging backend is not
  * log4j2-core (alternate test classpaths), quieting is skipped rather
  * than failing the run. */
object LogQuiet {
  def quietNoise(): Unit =
    try {
      import org.apache.logging.log4j.Level
      import org.apache.logging.log4j.core.config.Configurator
      Configurator.setLevel("org.apache.spark.rdd", Level.ERROR)
      Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec", Level.ERROR)
    } catch { case scala.util.control.NonFatal(_) => () }
}
