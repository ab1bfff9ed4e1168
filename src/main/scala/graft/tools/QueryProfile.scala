package graft.tools

import org.apache.spark.sql.SparkSession

/** Local optimization helper: time a SUBSET of `SparkEntry.queries` with
  * exactly the Bench action (xxhash64-struct fold → bit_xor) and Bench's
  * session shape, printing per-query median/min/max over N reps. This is
  * an iteration aid for plan work — the driver's numbers come from
  * [[graft.Bench]], whose artifact/contract this tool does not touch.
  *
  * Usage: runMain graft.tools.QueryProfile <sfDir> <reps> <name>...
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    // A/B harness: SPARK_GRAFT_PROFILE_CONFS="k=v;k=v" overrides any
    // session conf for this profiling run only.
    val builder = sys.env.get("SPARK_GRAFT_PROFILE_CONFS")
      .map(_.split(";").filter(_.contains("=")))
      .getOrElse(Array.empty[String])
      .foldLeft(builder0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2)
        b.config(k.trim, v.trim)
      }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LogQuiet.quietNoise()
    import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // job/stage/task counters — the fixed-overhead proxy at bench scale
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted)
            : Unit = {
          stages.incrementAndGet()
          tasks.addAndGet(s.stageInfo.numTasks.toLong)
        }
      })
    def runOne(name: String): Double = {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
        .agg(expr("bit_xor(h)")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach { n =>
      runOne(n) // warm-up, untimed (Bench parity)
      val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
      val ts = Seq.fill(reps)(runOne(n)).sorted
      val (j1, s1, t1) = (jobs.get, stages.get, tasks.get)
      val med = ts(ts.length / 2)
      println(f"PROFILE $n%-36s median=${med}%7.3f min=${ts.head}%7.3f max=${ts.last}%7.3f jobs=${(j1 - j0) / reps}%3d stages=${(s1 - s0) / reps}%3d tasks=${(t1 - t0) / reps}%5d")
    }
    spark.stop()
  }
}
