package graft.queries

/** The ONE oracle-side rendering of 30-minute gap sessionization.
  *
  * Ten oracle queries across four files sessionize `events` the same way
  * the engine's `graft.streaming.Events.assignSessions` does (a new session
  * when the per-user gap exceeds 1800 s, ordered by `(ts, event_id)` for a
  * deterministic tiebreak). Through round 16 each of them carried a
  * hand-copied CTE; this object is the consolidation (r16 VERDICT ask #2) —
  * one definition, parameterized by CTE name and carried columns, so the
  * gap constant and the tiebreak can never drift between oracle copies.
  *
  * Mirrors `Events.assignSessions` (engine side); the DuckDB rendering uses
  * `epoch_us` + a running SUM over the new-session flag, exactly the shape
  * the engine produces with `lag` + windowed `sum`.
  */
object SessionSql {

  /** Render `<name> AS (SELECT user_id, <carry...>, session_idx FROM ...)`.
    *
    * @param name  CTE name to bind.
    * @param carry extra output expressions; anything over the inner
    *              relation's `user_id, ts, event_id, event_type` is legal
    *              (e.g. `"event_type"`, `"ts"`, `"epoch_us(ts) AS us"`).
    * @param gapSeconds session gap; defaults to the canonical 30 minutes
    *              (non-default only for the q383 gap-sensitivity sweep —
    *              every production consumer stays on the one constant).
    */
  def cte(name: String, carry: Seq[String],
      gapSeconds: Long = 1800L): String = {
    val cols = ("user_id" +: carry).mkString(", ")
    s"""$name AS (
           SELECT $cols,
             CAST(SUM(new_s) OVER (PARTITION BY user_id
               ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_idx
           FROM (
             SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (
                      PARTITION BY user_id ORDER BY ts, event_id))
                      > CAST($gapSeconds AS BIGINT) * 1000000
                      THEN 1 ELSE 0 END AS new_s
             FROM events) a)"""
  }
}
