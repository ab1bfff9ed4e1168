package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, expr, struct, xxhash64}

/** Ad-hoc single-query timer: `runMain graft.tools.TimeQuery q349 [reps]
  * [sfDir]` — the same full-row xxhash64/bit_xor action as
  * [[graft.Bench]] (so every column's values are computed, not just the
  * row count), without the full-suite run. Prefix match on the query
  * name; prints each rep and the median. Development loop only — the
  * driver-facing artifact stays [[graft.Bench]]. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: TimeQuery <queryPrefix> [reps] [sfDir]"))
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = args.lift(2).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
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
    LogQuiet.quietNoise()
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().collect()
    val hits = graft.SparkEntry.queries.keys.filter(_.startsWith(name))
      .toSeq.sorted
    require(hits.nonEmpty, s"no query starts with '$name'")
    hits.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      val times = (1 to reps).map { i =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.select(xxhash64(struct(df.columns.map(col): _*)).as("h"))
          .agg(expr("bit_xor(h)")).collect()
        val s = (System.nanoTime() - t0) / 1e9
        println(f"  $q rep$i: $s%.3f s")
        s
      }.sorted
      println(f"$q median: ${times(times.length / 2)}%.3f s ($reps reps)")
    }
    spark.stop()
  }
}
