package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                    event_type: String, value: Double)

class EventsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val sample = Seq(
    Ev(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0),
    Ev(2, ts("2024-01-01 00:20:00"), 1, "click", 2.0),
    Ev(3, ts("2024-01-01 01:10:00"), 1, "view", 3.0),
    Ev(4, ts("2024-01-01 00:30:00"), 2, "click", 4.0),
    Ev(4, ts("2024-01-01 00:30:00"), 2, "click", 4.0), // dup event_id
    Ev(5, ts("2024-01-01 03:00:00"), 1, "click", 5.0))

  test("batch tumbling window groups by hour") {
    import spark.implicits._
    val out = Events.tumblingCounts(sample.toDF()).collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out(("2024-01-01 00:00:00.0", "click")) == 4L)
    assert(out(("2024-01-01 01:00:00.0", "view")) == 1L)
  }

  test("batch sessionization splits on 30-min gaps per user") {
    import spark.implicits._
    val out = Events.sessionizeBatch(sample.toDF(), gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // user 1: events at 00:05, 00:20 (same session), 01:10 (gap 50m -> new),
    // 03:00 (new). user 2: one session (dup rows share the timestamp).
    assert(out((1L, 0L)) == 2L)
    assert(out((1L, 1L)) == 1L)
    assert(out((1L, 2L)) == 1L)
    assert(out((2L, 0L)) == 2L)
  }

  test("retentionCohorts builds the first-week × offset triangle") {
    import spark.implicits._
    // user 1 starts week of Jan 1 2024 (Mon), returns 2 weeks later;
    // user 2 starts the same week, never returns; user 3 starts a week in
    val evs = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Ev(2, ts("2024-01-02 10:00:00"), 1, "click", 1.0), // same week
      Ev(3, ts("2024-01-15 10:00:00"), 1, "click", 1.0), // +2 weeks
      Ev(4, ts("2024-01-03 10:00:00"), 2, "view", 1.0),
      Ev(5, ts("2024-01-08 10:00:00"), 3, "view", 1.0),
      Ev(6, ts("2024-01-09 10:00:00"), 3, "view", 1.0)   // same week
    ).toDF()
    val out = Events.retentionCohorts(evs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val w0 = (java.time.LocalDate.of(2024, 1, 1).toEpochDay - 4) / 7
    assert(out == Map(
      (w0, 0L) -> 2L,      // users 1 and 2 active in their cohort week
      (w0, 2L) -> 1L,      // user 1 returns at offset 2
      (w0 + 1, 0L) -> 1L)) // user 3's cohort
  }

  test("streaming tumbling aggregation over MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.streamTumbling(mem.toDF(), width = "1 hour",
        watermark = "10 hours")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val rows = spark.table("tumbling_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2))
        .toMap
      assert(rows(("2024-01-01 00:00:00.0", "click")) == 4L)
      assert(rows(("2024-01-01 03:00:00.0", "click")) == 1L)
    } finally q.stop()
  }

  test("streaming dedup within watermark drops duplicate event_ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.streamDedup(mem.toDF(), watermark = "10 hours")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val n = spark.table("dedup_out").count()
      assert(n == 5) // 6 rows, one duplicate event_id
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch formulation") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = Seq(
      Ev(100, ts("2024-01-01 01:00:00"), 1, "purchase", 9.0),
      Ev(101, ts("2024-01-01 02:00:00"), 2, "purchase", 9.0))
    val clicks = Seq(
      Ev(1, ts("2024-01-01 00:40:00"), 1, "click", 1.0), // in window of 100
      Ev(2, ts("2024-01-01 00:20:00"), 1, "click", 2.0), // outside (40m before)
      Ev(3, ts("2024-01-01 01:00:00"), 1, "click", 3.0), // NOT < p_ts
      Ev(4, ts("2024-01-01 01:50:00"), 2, "click", 4.0), // in window of 101
      Ev(5, ts("2024-01-01 01:45:00"), 3, "click", 5.0)) // other user
    val memP = MemoryStream[Ev]
    val memC = MemoryStream[Ev]
    val q = Events.streamAttribution(memP.toDF(), memC.toDF(),
        lookbackMinutes = 30, watermark = "10 hours")
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode("append").start()
    try {
      memP.addData(purchases: _*)
      memC.addData(clicks: _*)
      q.processAllAvailable()
      val streamed = spark.table("attrib_out")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Events.attributionPairs(purchases.toDF(), clicks.toDF(),
          lookbackMinutes = 30)
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch == Set((100L, 1L), (101L, 4L)))
      assert(streamed == batch)
    } finally q.stop()
  }

  test("mapGroupsWithState tracks per-user counters and latches the alarm") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.streamUserActivity(mem.toDF(), alarmStreak = 2)
      .writeStream.format("memory").queryName("activity_out")
      .outputMode("update").start()
    try {
      mem.addData(
        Ev(10, ts("2024-01-01 00:01:00"), 7, "error", 1.0),
        Ev(11, ts("2024-01-01 00:02:00"), 7, "error", 1.0), // streak 2 -> alarm
        Ev(12, ts("2024-01-01 00:03:00"), 8, "click", 1.0))
      q.processAllAvailable()
      mem.addData(
        Ev(13, ts("2024-01-01 00:04:00"), 7, "click", 1.0)) // streak resets
      q.processAllAvailable()
      val rows = spark.table("activity_out")
        .orderBy(col("user_id"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
          r.getBoolean(5)))
      // user 7 after batch 1: 2 events, streak 2, alerted
      assert(rows.contains((7L, 2L, 2L, true)))
      // user 7 after batch 2: 3 events, streak reset, alarm stays latched
      assert(rows.contains((7L, 3L, 0L, true)))
      // user 8 never alerted
      assert(rows.contains((8L, 1L, 0L, false)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits session summaries on gap timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.streamSessionSummaries(mem.toDF(),
        gapMillis = 30 * 60 * 1000L) // 30-minute event-time gap
      .writeStream.format("memory").queryName("session_summaries")
      .outputMode("append").start()
    try {
      mem.addData(
        Ev(1, ts("2024-01-01 00:00:10"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 00:00:20"), 1, "error", 1.0))
      q.processAllAvailable()
      // session still open: nothing emitted yet (append-mode, zero rows)
      assert(spark.table("session_summaries").count() == 0)
      // an event far past the gap advances the WATERMARK beyond
      // session_end + gap; the next batch sweeps the expired state —
      // deterministic event-time closure, no wall-clock involved
      mem.addData(Ev(3, ts("2024-01-01 09:00:00"), 2, "view", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(4, ts("2024-01-01 09:00:01"), 2, "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("session_summaries").collect().map(r =>
        (r.getLong(0), r.getTimestamp(1).toString,
          r.getTimestamp(2).toString, r.getLong(3), r.getLong(4)))
      assert(rows.toSeq == Seq(
        (1L, "2024-01-01 00:00:10.0", "2024-01-01 00:00:20.0", 2L, 1L)))
    } finally q.stop()
  }

  test("streaming session windows merge events within the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Events.streamSessions(mem.toDF(), gap = "30 minutes",
        watermark = "10 hours")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("complete").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val perUser = spark.table("sessions_out").groupBy("user_id").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(perUser(1L) == 3L) // three distinct sessions for user 1
      assert(perUser(2L) == 1L)
    } finally q.stop()
  }
}
