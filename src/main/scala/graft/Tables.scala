package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-data table registry (see /root/repo/TESTDATA.md).
  *
  * At 100 TB the same call sites read a partitioned table root instead of a
  * single file; nothing downstream depends on file layout because everything
  * consumes the returned DataFrame (Catalyst prunes partitions/columns).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`: the
    * `events` table carries TIMESTAMP(NANOS) which Spark has no native type
    * for; it then arrives as nanos-since-epoch LONG and is normalised here to
    * a microsecond timestamp (integer `div` — a double division would lose
    * precision above 2^53 ns). */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions
          .expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }
  }

  /** Register every table as a temp view so SQL-form queries and the
    * DataFrame-form queries resolve the same relations. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
