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

  /** Fan a scan out to the session's parallelism WHEN THE FILE LAYOUT
    * CANNOT: a single-row-group parquet file is one indivisible split, so
    * the whole pre-exchange pipeline — decode, projections, expand,
    * partial aggregation — runs on one core while the rest idle (the
    * "one huge unsplittable file" input-skew case; fix: repartition
    * immediately after the read). Scale-adaptive, not a local constant:
    * the exchange is added ONLY when the planned scan has fewer than
    * half `defaultParallelism` partitions — at production file counts
    * the scan already fans out and this is the identity. Round-robin
    * repartition is deterministic under retries (sortBeforeRepartition
    * stays on), and every consumer is partitioning-invariant by the
    * engine's exact-arithmetic contract, so results are unchanged.
    * Apply to COMPUTE-HEAVY consumers only: for a short scan-and-go
    * query the extra exchange costs more than the idle cores. */
  def fanOut(df: DataFrame): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 < n) df.repartition(n) else df
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
