package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (codegen/JIT, FS metadata) so the first timed query
    // doesn't absorb startup cost.
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    // Consume every column's VALUES, not just row count: under `count()`
    // Catalyst prunes unused columns, so pure-projection queries would
    // measure scan+count instead of their expression work. Hashing the full
    // row struct and XOR-folding forces every value to be computed while
    // keeping the action driver-cheap. bit_xor (not sum) because xxhash64
    // is uniform over the full Long range — a running sum overflows almost
    // immediately and aborts under Spark 4's default ANSI mode.
    import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}
    var errs = Map.empty[String, String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        val df = fn(spark, sfDir)
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(expr("bit_xor(h)")).collect()
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          errs += name -> msg.linesIterator.take(1).mkString.take(200)
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val qs = results.map { case (k, v) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    val es = errs.map { case (k, v) => jstr(k) + ":" + jstr(v) }
      .mkString("{", ",", "}")
    // A failed query's elapsed time is time-to-failure, not a measurement:
    // exclude it from the total and surface it in "errors".
    val total = results.collect { case (k, v) if !errs.contains(k) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"failed":${errs.size},"sf":"$sfDir"}""")
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
