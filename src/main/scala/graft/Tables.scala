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

  /** Normalise the `events.ts` column to session TimestampType regardless of
    * its physical parquet representation, so every downstream operator sees
    * one timestamp type. Three representations occur in practice:
    *
    *  - TIMESTAMP(NANOS): Spark has no native type; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a
    *    nanos-since-epoch LONG and is converted here (integer `div` — a
    *    double division would lose precision above 2^53 ns);
    *  - `timestamp[us]` with isAdjustedToUTC=false: arrives as
    *    TIMESTAMP_NTZ and is cast to TimestampType — the session timezone is
    *    pinned to UTC by every entrypoint, so the instant is deterministic;
    *  - UTC-adjusted `timestamp[us]`: already TimestampType, passthrough.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    normalizeTs(df)
  }

  /** Exposed separately so callers holding an events-shaped frame from any
    * source (not just parquet) can apply the same timestamp contract. */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema.fields.find(_.name == "ts") match {
      case Some(f) if f.dataType == LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions
          .expr("timestamp_micros(ts div 1000)"))
      case Some(f) if f.dataType == TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions
          .col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view so SQL-form queries and the
    * DataFrame-form queries resolve the same relations. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
