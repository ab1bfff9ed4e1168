package graft

import org.apache.spark.sql.SparkSession

import graft.orchestrate.{OffloadRunner, StatusReport}
import graft.verify.CrossValidator

/** Command-line entry points — the engine's `offload` / `agg-validate` /
  * `status-report` commands (reference `bin/offload`,
  * `scripts/agg_validate.py`, `offload_status_report.py` CLIs).
  *
  * Usage:
  * {{{
  *   graft.Cli offload --source <parquet> --final <path> --meta <dir>
  *     [--staging <path>] [--predicate "<dsl>"] [--incremental-key k1,k2]
  *     [--partition-by c1,c2] [--dry-run]
  *   graft.Cli agg-validate --left <parquet> --right <parquet>
  *     [--group-by c1,c2] [--columns c1,c2]
  *   graft.Cli status-report --meta <dir>
  * }}}
  */
object Cli {

  private def parseArgs(args: Seq[String]): Map[String, String] = {
    val m = scala.collection.mutable.Map.empty[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"expected --option, got $a")
      val key = a.stripPrefix("--")
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        m(key) = args(i + 1); i += 2
      } else { m(key) = "true"; i += 1 }
    }
    m.toMap
  }

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Cli <offload|agg-validate|status-report> ...")
    val cmd = args.head
    val opts = parseArgs(args.tail.toSeq)
    // reuse an active session when embedded (tests/notebooks); only stop a
    // session this main itself created
    val reused = SparkSession.getActiveSession
    val spark = reused.getOrElse(session())
    try {
      cmd match {
        case "offload" =>
          val steps = OffloadRunner.offload(spark, OffloadRunner.OffloadConfig(
            sourceTable = opts.getOrElse("table",
              opts("source").split('/').last.stripSuffix(".parquet")),
            sourcePath = opts("source"),
            stagingPath = opts.getOrElse("staging", opts("final") + "_staging"),
            finalPath = opts("final"),
            metadataDir = opts("meta"),
            predicateDsl = opts.get("predicate"),
            incrementalKey = opts.get("incremental-key")
              .map(_.split(',').toSeq).getOrElse(Nil),
            partitionCols = opts.get("partition-by")
              .map(_.split(',').toSeq).getOrElse(Nil),
            dryRun = opts.contains("dry-run")))
          steps.foreach(s => println(
            f"${if (s.ok) "ok " else "ERR"} ${s.name}%-18s ${s.millis}%6d ms  ${s.detail}"))
          if (!steps.forall(_.ok)) sys.exit(1)

        case "agg-validate" =>
          val left = spark.read.parquet(opts("left"))
          val right = spark.read.parquet(opts("right"))
          val groupCols = opts.get("group-by")
            .map(_.split(',').toSeq).getOrElse(Nil)
          val valueCols = opts.get("columns").map(_.split(',').toSeq)
            .getOrElse(left.columns.toSeq.filterNot(groupCols.contains).take(5))
          val ok = CrossValidator.aggValidate(left, right, groupCols, valueCols)
          println(if (ok) "VALIDATED" else "MISMATCH")
          if (!ok) {
            CrossValidator.diff(
              CrossValidator.aggFrame(left, groupCols, valueCols),
              CrossValidator.aggFrame(right, groupCols, valueCols),
              groupCols).show(20, truncate = false)
            sys.exit(1)
          }

        case "status-report" =>
          StatusReport.report(spark, opts("meta")).show(100, truncate = false)

        case other =>
          System.err.println(s"unknown command: $other")
          sys.exit(2)
      }
    } finally if (reused.isEmpty) spark.stop()
  }
}
