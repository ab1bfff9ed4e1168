package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.streaming.Events

/** Timestamp-representation contract: the driver regenerates
  * `/root/testdata` between rounds and has already shipped `events.ts` in
  * two different physical encodings (TIMESTAMP(NANOS) → nanos-as-long, then
  * `timestamp[us]` with isAdjustedToUTC=false → TIMESTAMP_NTZ — the round-8
  * regression). This spec writes the SAME fixture three ways and proves
  * `Tables.load` yields one identical TimestampType frame for all three, so
  * a data regeneration can never silently break the suite again.
  */
class TimestampContractSpec extends SparkSpec {

  // 2024-03-01T00:00:00Z .. +3 events, gaps 10min / 45min (session break)
  private val baseUs = 1709251200000000L
  private val offsetsUs = Seq(0L, 600L * 1000000L, 3300L * 1000000L)

  private def writeVariant(kind: String): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"ts-contract-$kind").toString
    val rows = offsetsUs.zipWithIndex.map { case (off, i) =>
      (i.toLong, baseUs + off, 1L, if (i == 2) "error" else "click", 1.0)
    }
    val base = rows.toDF("event_id", "us", "user_id", "event_type", "value")
    val df = kind match {
      case "nanos_long" =>
        // TIMESTAMP(NANOS) arrives as a LONG under nanosAsLong=true; a plain
        // long column exercises the same Tables.load branch.
        base.withColumn("ts", col("us") * 1000L)
      case "ntz_us" =>
        base.withColumn("ts",
          timestamp_micros(col("us")).cast(TimestampNTZType))
      case "utc_us" =>
        base.withColumn("ts", timestamp_micros(col("us")))
    }
    df.drop("us").select("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadVariant(kind: String): DataFrame =
    Tables.load(spark, writeVariant(kind), "events")

  test("Tables.load normalises all three physical ts representations " +
       "to one identical TimestampType frame") {
    val frames = Seq("nanos_long", "ntz_us", "utc_us").map(loadVariant)
    frames.foreach { df =>
      assert(df.schema("ts").dataType == TimestampType,
        s"expected TimestampType, got ${df.schema("ts").dataType}")
    }
    val collected = frames.map(
      _.select(col("event_id"), unix_micros(col("ts")).as("us"))
        .orderBy("event_id").collect().map(r => (r.getLong(0), r.getLong(1)))
        .toSeq)
    assert(collected(0) == collected(1))
    assert(collected(1) == collected(2))
    assert(collected(0).map(_._2) == offsetsUs.map(baseUs + _))
  }

  test("sessionizeBatch runs identically on every representation") {
    val results = Seq("nanos_long", "ntz_us", "utc_us").map { kind =>
      Events.sessionizeBatch(loadVariant(kind))
        .orderBy("user_id", "session_idx")
        .select(col("n_events"),
          unix_micros(col("session_start")).as("s"),
          unix_micros(col("session_end")).as("e"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    }
    // 45-min gap splits the 3 events into sessions of 2 and 1
    assert(results.head.map(_._1) == Seq(2L, 1L))
    assert(results(0) == results(1))
    assert(results(1) == results(2))
  }

  test("keyed-state accessors are representation-agnostic (raw NTZ frame)") {
    // Feed a RAW NTZ frame (no Tables.load) straight through the
    // mapGroupsWithState operator: round 8 died here with
    // ClassCastException: LocalDateTime.
    import spark.implicits._
    val dir = writeVariant("ntz_us")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    assert(raw.schema("ts").dataType == TimestampNTZType)
    val out = Events.streamUserActivity(raw, alarmStreak = 1)
      .orderBy("user_id").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_events") == 3L)
    assert(r.getAs[Long]("n_errors") == 1L)
    assert(r.getAs[Boolean]("alerted"))
    assert(r.getAs[java.sql.Timestamp]("last_seen").getTime ==
      (baseUs + offsetsUs.last) / 1000L)
  }

  test("tsMicros handles Timestamp, Instant, LocalDateTime and rejects " +
       "everything else") {
    import org.apache.spark.sql.Row
    val us = baseUs + 123456L
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.StringType)))
    def rowOf(v: Any): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array(v), schema)
    val tsJ = new java.sql.Timestamp(us / 1000L)
    tsJ.setNanos(((us % 1000000L) * 1000L).toInt)
    assert(Events.tsMicros(rowOf(tsJ)) == us)
    assert(Events.tsMicros(rowOf(
      java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
    )) == us)
    assert(Events.tsMicros(rowOf(
      java.time.LocalDateTime.ofInstant(
        java.time.Instant.ofEpochSecond(us / 1000000L,
          (us % 1000000L) * 1000L), java.time.ZoneOffset.UTC))) == us)
    intercept[IllegalArgumentException](Events.tsMicros(rowOf("not-a-ts")))
    intercept[IllegalArgumentException](Events.tsMicros(rowOf(null)))
  }
}
