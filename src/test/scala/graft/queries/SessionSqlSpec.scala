package graft.queries

import java.io.File
import java.nio.file.Files


import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Guards the consolidated sessionization CTE (r16 VERDICT ask #2).
  *
  * 1. Behavioral: the rendered DuckDB CTE, re-parsed by Spark SQL itself
  *    with `epoch_us` mapped to `unix_micros` (the only dialect delta),
  *    must assign the same `session_idx` as the engine's
  *    `Events.assignSessions` on a fixture with boundary-straddling gaps
  *    (exactly 1800 s = same session; 1800 s + 1 µs = new session).
  * 2. Hygiene: the raw gap constant must not reappear as a fresh hand copy
  *    in any oracle file — r16 found ELEVEN drifted-by-luck copies; all
  *    session CTEs must render through `SessionSql.cte`.
  */
class SessionSqlSpec extends SparkSpec {

  test("rendered CTE ≡ Events.assignSessions on boundary-straddling gaps") {
    import spark.implicits._
    val t0 = 1704067200000000L // 2024-01-01T00:00Z in µs
    // Exact-µs timestamps via timestamp_micros to keep the 1-µs edge:
    // user 1's gaps are EXACTLY 1800 s (same session) then 1800 s + 1 µs
    // (new session); user 2 has a ts tie broken by event_id.
    val fixture = Seq(
      (1L, 10L, t0, "view"),
      (1L, 11L, t0 + 1800L * 1000000L, "click"),
      (1L, 12L, t0 + 2L * 1800L * 1000000L + 1L, "view"),
      (2L, 20L, t0, "view"), (2L, 21L, t0, "click"),
      (2L, 22L, t0 + 5L * 1000000L, "purchase"))
      .toDF("user_id", "event_id", "us", "event_type")
      .select(col("user_id"), col("event_id"),
        expr("timestamp_micros(us)").as("ts"), col("event_type"))

    val engine = graft.streaming.Events.assignSessions(fixture)
      .select("user_id", "event_id", "session_idx")

    fixture.createOrReplaceTempView("events")
    val rendered = SessionSql.cte("se", Seq("event_id"))
      .replace("epoch_us(", "unix_micros(")
    val oracle = spark.sql(s"WITH $rendered SELECT user_id, event_id, " +
      "session_idx FROM se")

    assert(engine.except(oracle).isEmpty && oracle.except(engine).isEmpty,
      s"engine=${engine.collect().toSeq.sortBy(_.getLong(1))} " +
        s"sql=${oracle.collect().toSeq.sortBy(_.getLong(1))}")
    // And the fixture actually exercises the boundary: user 1 spans 2
    // sessions (the exact-1800s gap did NOT split; the +1µs gap did).
    val u1 = engine.filter(col("user_id") === 1L)
      .select(max("session_idx")).head().getLong(0)
    assert(u1 == 1L, s"user 1 should have sessions 0 and 1, max=$u1")
    spark.catalog.dropTempView("events")
  }

  test("no hand-copied sessionization CTE outside SessionSql.scala") {
    val dir = new File("src/main/scala/graft/queries")
    val offenders = dir.listFiles().filter(_.getName.endsWith(".scala"))
      .filterNot(_.getName == "SessionSql.scala")
      .filter { f =>
        new String(Files.readAllBytes(f.toPath))
          .contains("1800 * 1000000")
      }.map(_.getName)
    assert(offenders.isEmpty,
      s"raw 30-min gap constant found in ${offenders.mkString(", ")} — " +
        "render session CTEs through SessionSql.cte(name, carry) instead")
  }
}
