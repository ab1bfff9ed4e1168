package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming surface for the `events` stream.
  *
  * The reference is batch-only with incremental HWMs (SURVEY §2.7); the
  * streaming extension maps that incremental model onto Structured Streaming:
  * watermark = the HWM, tumbling/sliding/session windows = the synthetic
  * partition keys, `dropDuplicates` within the watermark = staged-load
  * idempotence.
  *
  * Every transform here takes a DataFrame and works identically on a batch
  * frame (tests + DuckDB oracle) and a `readStream` frame (true streaming) —
  * the Structured Streaming contract that batch and stream share one API.
  * Streaming-only bits (watermark, trigger, output mode) live in the
  * `stream*` wrappers.
  */
object Events {

  /** Tumbling-window aggregate. Batch + streaming. Exact money arithmetic via
    * decimal cast (cross-engine deterministic). */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Sliding-window event rate. */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
                    slide: String = "15 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))

  /** Per-event session assignment: each event gains its `session_idx`
    * (30-min-gap, per user) via the classic lag/flag/cumsum window
    * program — exposed so session-SCOPED analyses (per-session funnels,
    * q175) share one session definition with [[sessionizeBatch]]. */
  def assignSessions(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // Gap compared in integer MICROseconds on both engines (oracle uses
    // epoch_us): second-truncated casts flip sessions whose gap straddles
    // the boundary by sub-second amounts.
    val newSession =
      when(unix_micros(col("ts")) -
             lag(unix_micros(col("ts")), 1).over(byUser) >
             gapMinutes * 60L * 1000000L, 1L)
        .otherwise(lit(0L))
    events
      .withColumn("new_s", coalesce(newSession, lit(0L)))
      .withColumn("session_idx",
        sum(col("new_s")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("new_s")
  }

  /** Batch sessionization: 30-min-gap sessions per user — the batch
    * mirror of `session_window` (which needs a streaming query). */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    assignSessions(events, gapMinutes)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))

  /** Retention-cohort matrix: users grouped by first-activity week, each
    * cohort's active-user count at every later week offset — the classic
    * product-analytics triangle, and a shape the reference's validation
    * aggregates can't express (two chained aggregations over the same
    * scan).
    *
    * Weeks are integer epoch-day sevenths anchored on a Monday
    * (1970-01-05), so both engines bucket identically with no timezone
    * or week-of-year convention in play. Scale shape: distinct
    * (user, week) is one partial-agg shuffle; cohorts are a min-agg on
    * the user key; the offset join is user-key equi; the matrix agg
    * output is cohorts × offsets — metadata scale. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val week = floor(
      datediff(to_date(col("ts")), lit("1970-01-05").cast("date")) / 7)
      .cast("long")
    val activity = events.select(col("user_id"), week.as("week")).distinct()
    val cohorts = activity.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    activity.join(cohorts, "user_id")
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** Exactly-once style dedup on event_id (batch mirror of
    * `dropDuplicates` within watermark). */
  def dedupEvents(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  /** Interval (time-bounded) join: each purchase pairs with the same
    * user's clicks inside the lookback window `[p_ts - lookback, p_ts)` —
    * click-to-purchase attribution. Batch + streaming: the condition is an
    * equi-key plus a bounded time range, exactly the shape Structured
    * Streaming's stream-stream join supports (the bound is what lets the
    * engine evict state — without it, both sides buffer forever).
    *
    * Scale shape: ONE shuffle on user_id per side; the range predicate
    * evaluates inside the joined partition. Never a broadcast nested loop. */
  def attributionPairs(purchases: DataFrame, clicks: DataFrame,
                       lookbackMinutes: Int = 30): DataFrame = {
    val p = purchases.select(col("user_id"),
      col("event_id").as("purchase_id"), col("ts").as("p_ts"))
    val c = clicks.select(col("user_id").as("c_user_id"),
      col("event_id").as("click_id"), col("ts").as("c_ts"),
      col("value").as("click_value"))
    p.join(c, col("user_id") === col("c_user_id") &&
        col("c_ts") < col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("p_ts"),
        col("click_id"), col("c_ts"), col("click_value"))
  }

  // ------------------------------------------------------ streaming wrappers

  /** Streaming tumbling aggregate with watermark — append-mode capable. */
  def streamTumbling(stream: DataFrame, width: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    tumblingCounts(stream.withWatermark("ts", watermark), width)

  /** Streaming sessionization via native `session_window`. */
  def streamSessions(stream: DataFrame, gap: String = "30 minutes",
                     watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
              col("w.end").as("session_end"), col("n_events"))

  /** Streaming dedup within the watermark. */
  def streamDedup(stream: DataFrame, watermark: String = "2 hours"): DataFrame =
    stream.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream attribution join. Watermarks on BOTH sides plus the
    * time-bound join condition let Spark evict buffered rows once the
    * watermark passes `p_ts` (click side) / `p_ts + lookback` (purchase
    * side) — state is bounded by watermark delay + lookback, not stream
    * length. */
  def streamAttribution(purchases: DataFrame, clicks: DataFrame,
                        lookbackMinutes: Int = 30,
                        watermark: String = "2 hours"): DataFrame = {
    val p = purchases.select(col("user_id"),
      col("event_id").as("purchase_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", watermark)
    val c = clicks.select(col("user_id").as("c_user_id"),
      col("event_id").as("click_id"), col("ts").as("c_ts"),
      col("value").as("click_value"))
      .withWatermark("c_ts", watermark)
    p.join(c, col("user_id") === col("c_user_id") &&
        col("c_ts") < col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("p_ts"),
        col("click_id"), col("c_ts"), col("click_value"))
  }

  // ------------------------------------------------- custom state (GADT)

  /** Representation-agnostic event-time accessor for keyed-state operators:
    * a Row's `ts` field surfaces as `java.sql.Timestamp` (TimestampType),
    * `java.time.Instant` (java8 datetime API), or `java.time.LocalDateTime`
    * (TIMESTAMP_NTZ — interpreted at UTC, matching the pinned session TZ).
    * Returns epoch MICROseconds so no sub-millisecond precision is lost. */
  private[graft] def tsMicros(r: org.apache.spark.sql.Row,
                              field: String = "ts"): Long =
    r.get(r.fieldIndex(field)) match {
      case t: java.sql.Timestamp =>
        Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      case i: java.time.Instant =>
        i.getEpochSecond * 1000000L + i.getNano / 1000L
      case l: java.time.LocalDateTime =>
        val i = l.toInstant(java.time.ZoneOffset.UTC)
        i.getEpochSecond * 1000000L + i.getNano / 1000L
      case other => throw new IllegalArgumentException(
        s"unsupported timestamp representation for '$field': " +
          s"${if (other == null) "null" else other.getClass.getName}")
    }

  private def microsToTimestamp(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos(Math.floorMod(us, 1000000L).toInt * 1000)
    t
  }

  final case class UserActivity(
      user_id: Long, n_events: Long, n_errors: Long,
      last_seen: java.sql.Timestamp, error_streak: Long, alerted: Boolean)

  /** Custom keyed state via `mapGroupsWithState`: per-user running counters
    * with an error-streak alarm — the shape watermarked windows can't
    * express (state depends on event ORDER within the key, and the output
    * is a continuously-updated profile rather than a closed window).
    * State per key is O(1); the streak alarm latches via the `alerted`
    * flag so downstream consumers see each breach once. */
  def streamUserActivity(stream: DataFrame,
                         alarmStreak: Int = 3): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import org.apache.spark.sql.{Encoders, Row}
    implicit val rowEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(stream.schema)
    implicit val outEnc = Encoders.product[UserActivity]
    stream.as[Row](rowEnc)
      .groupByKey(r => r.getAs[Long]("user_id"))(Encoders.scalaLong)
      .mapGroupsWithState[UserActivity, UserActivity](
        GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Row], state: GroupState[UserActivity]) =>
          val prev = state.getOption.getOrElse(
            UserActivity(userId, 0L, 0L, new java.sql.Timestamp(0L), 0L,
              alerted = false))
          // order within the batch by event time for a deterministic streak
          val sorted = rows.toSeq.sortBy(r =>
            (tsMicros(r), r.getAs[Long]("event_id")))
          val updated = sorted.foldLeft(prev) { (acc, r) =>
            val isError = r.getAs[String]("event_type") == "error"
            val streak = if (isError) acc.error_streak + 1 else 0L
            acc.copy(
              n_events = acc.n_events + 1,
              n_errors = acc.n_errors + (if (isError) 1 else 0),
              last_seen = microsToTimestamp(tsMicros(r)),
              error_streak = streak,
              alerted = acc.alerted || streak >= alarmStreak)
          }
          state.update(updated)
          updated
      }.toDF()
  }

  final case class SessionSummary(
      user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, n_errors: Long)

  // public: the state encoder's generated code constructs it reflectively
  final case class SessionState(
      start: Long, end: Long, n: Long, errors: Long)

  /** Gap-closed sessions via `flatMapGroupsWithState`: a session's summary
    * is emitted ONLY when the gap expires — the zero-or-many output shape
    * `mapGroupsWithState` cannot express (that one emits exactly one row
    * per key per batch). EVENT-time timeout: the deadline is
    * `session_end + gap` against the WATERMARK, so session closure is a
    * deterministic function of the data (reproducible in tests and across
    * retries — never wall-clock). State is evicted at emission, so state
    * size tracks ACTIVE sessions, not all users ever seen — the property
    * that matters when the key space is unbounded. */
  def streamSessionSummaries(stream: DataFrame,
                             gapMillis: Long = 30 * 60 * 1000L,
                             watermarkDelay: String = "10 seconds")
      : DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoders, Row}
    implicit val rowEnc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(stream.schema)
    implicit val outEnc = Encoders.product[SessionSummary]
    implicit val stateEnc = Encoders.product[SessionState]
    stream.withWatermark("ts", watermarkDelay).as[Row](rowEnc)
      .groupByKey(r => r.getAs[Long]("user_id"))(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Row], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed session_end + gap: close, emit, evict
            val s = state.get
            state.remove()
            Iterator.single(SessionSummary(userId,
              new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end),
              s.n, s.errors))
          } else {
            val batch = rows.toSeq
            val ts = batch.map(r => Math.floorDiv(tsMicros(r), 1000L))
            val errs = batch.count(_.getAs[String]("event_type") == "error")
            val merged = state.getOption match {
              case Some(s) => SessionState(math.min(s.start, ts.min),
                math.max(s.end, ts.max), s.n + batch.length,
                s.errors + errs)
              case None => SessionState(ts.min, ts.max, batch.length, errs)
            }
            state.update(merged)
            state.setTimeoutTimestamp(merged.end + gapMillis)
            Iterator.empty
          }
      }.toDF()
  }
}
