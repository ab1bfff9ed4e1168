package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}

/** Development-loop phase splitter: for each named query, separates (a)
  * DataFrame construction (query-body Scala + any driver-side model
  * work), (b) analysis+optimization+physical planning of the bench
  * action, (c) execution. Locates whether a slow query is paying in
  * compute or in the driver (guide §7.3 — "planning time itself can
  * become the bottleneck"). Usage:
  * `runMain graft.tools.PhaseProfile <sfDir> <reps> <name>...` */
object PhaseProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogQuiet.quietNoise()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // warmup
      locally {
        val df = fn(spark, sfDir)
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(expr("bit_xor(h)")).collect()
      }
      val phases = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val act = df.select(
          xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(expr("bit_xor(h)"))
        act.queryExecution.executedPlan // force planning
        val t2 = System.nanoTime()
        act.collect()
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.length / 2)
      println(f"PHASES $n%-36s build=${med(phases.map(_._1))}%7.3f " +
        f"plan=${med(phases.map(_._2))}%7.3f exec=${med(phases.map(_._3))}%7.3f")
    }
    spark.stop()
  }
}
