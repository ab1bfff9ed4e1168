package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) materialization: collapse a keyed
  * change stream into maximal constant-attribute runs with half-open
  * [eff_from, eff_to) validity ranges — the CDC-log → versioned-dimension
  * build (the batch face; [[graft.streaming.StreamingScd]] maintains the
  * same relation incrementally).
  *
  * Reference provenance: the reference's incremental update flow
  * (src/goe/offload/operation/... incremental append/update semantics)
  * replays change records into an offloaded table; SCD-2 is the
  * history-preserving variant of that materialization.
  *
  * Scale shape: one window pass partitioned per key (bounded by a single
  * key's history), one keyed aggregate — no global sort, no driver state.
  */
object Scd {

  /** Expected input columns for [[runs]]. */
  val EventCols: Seq[String] = Seq("user_id", "event_id", "us", "tier")

  /** Default value→tier cut points — the SINGLE definition shared by the
    * q224 batch query, [[graft.streaming.StreamingScd]], and their
    * oracles (three drifting copies would silently desynchronize the
    * batch query from the streaming dimension it mirrors). */
  val TierMid = 10d
  val TierHigh = 100d

  /** The value→tier rule. */
  def tierOf(value: Column, mid: Double = TierMid,
             high: Double = TierHigh): Column =
    when(value < mid, "low").when(value < high, "mid").otherwise("high")

  /** Collapse (user_id, event_id, us, tier) change events into SCD-2 runs:
    * (user_id, run_id, tier, eff_from_us, eff_to_us, n_events, last_us,
    * last_eid, is_current). `run_id` is 1-based per user in time order;
    * `eff_to_us` is NULL on each user's open run; (`last_us`, `last_eid`)
    * is the run's latest event under the (us, event_id) total order — the
    * streaming merge's late-event watermark, which must carry the
    * event_id tiebreak or same-timestamp events straddling a batch
    * boundary would be wrongly quarantined. Ties on `us` are broken by
    * `event_id`, so every downstream result is deterministic. */
  def runs(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val runsAgg = ev
      .withColumn("chg",
        when(lag(col("tier"), 1).over(w).isNull ||
          lag(col("tier"), 1).over(w) =!= col("tier"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("run_id"))
      .agg(min(col("tier")).as("tier"),
        min(col("us")).as("eff_from_us"),
        max(struct(col("us"), col("event_id"))).as("last_ev"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("run_id"), col("tier"),
        col("eff_from_us"), col("last_ev.us").as("last_us"),
        col("last_ev.event_id").as("last_eid"), col("n_events"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    runsAgg
      .withColumn("eff_to_us", lead(col("eff_from_us"), 1).over(w2))
      .withColumn("is_current", col("eff_to_us").isNull.cast("long"))
      .select(col("user_id"), col("run_id"), col("tier"),
        col("eff_from_us"), col("eff_to_us"), col("n_events"),
        col("last_us"), col("last_eid"), col("is_current"))
  }

  /** Merge a batch of NEW change events into a resident run relation.
    * Assumes per-key in-order delivery: batch events at or before the
    * key's open-run `last_us` must be dropped by the caller first (see
    * [[lateSplit]]) — the CDC-log contract. Bounded per key; every join
    * is on `user_id`. */
  def merge(resident: DataFrame, batchEv: DataFrame): DataFrame = {
    val fresh = runs(batchEv)
      .select(col("user_id"), col("run_id"), col("tier"),
        col("eff_from_us"), col("eff_to_us"), col("n_events"),
        col("last_us"), col("last_eid"))
    val firstFresh = fresh.filter(col("run_id") === 1L)
      .select(col("user_id"), col("tier").as("f_tier"),
        col("eff_from_us").as("f_from"), col("eff_to_us").as("f_to"),
        col("n_events").as("f_n"), col("last_us").as("f_last"),
        col("last_eid").as("f_last_eid"))
    val closed = resident.filter(col("is_current") === 0L)
      .select(col("user_id"), col("tier"), col("eff_from_us"),
        col("eff_to_us"), col("n_events"), col("last_us"),
        col("last_eid"))
    val open = resident.filter(col("is_current") === 1L)
      .select(col("user_id"), col("tier"), col("eff_from_us"),
        col("n_events"), col("last_us"), col("last_eid"))
    // The open run: untouched (no batch events), extended (batch starts
    // in the same tier), or closed at the batch's first transition.
    val openMerged = open.join(firstFresh, Seq("user_id"), "left")
      .select(col("user_id"),
        col("tier"),
        col("eff_from_us"),
        when(col("f_tier").isNull, lit(null).cast("long"))      // untouched
          .when(col("f_tier") === col("tier"), col("f_to"))      // extended
          .otherwise(col("f_from")).as("eff_to_us"),             // closed
        when(col("f_tier") === col("tier"),
          col("n_events") + col("f_n")).otherwise(col("n_events"))
          .as("n_events"),
        when(col("f_tier") === col("tier"), col("f_last"))
          .otherwise(col("last_us")).as("last_us"),
        when(col("f_tier") === col("tier"), col("f_last_eid"))
          .otherwise(col("last_eid")).as("last_eid"))
    // Fresh runs that survive as their own rows: everything except a
    // first run that was absorbed into a same-tier open run.
    val absorbed = open.select(col("user_id"),
      col("tier").as("o_tier"))
    val appended = fresh.join(absorbed, Seq("user_id"), "left")
      .filter(col("o_tier").isNull || col("run_id") >= 2L ||
        col("tier") =!= col("o_tier"))
      .select(col("user_id"), col("tier"), col("eff_from_us"),
        col("eff_to_us"), col("n_events"), col("last_us"),
        col("last_eid"))
    val unioned = closed.union(openMerged).union(appended)
    // Renumber under the run chronology. (last_us, last_eid) is STRICTLY
    // increasing across one user's runs — eff_from_us alone is not (three
    // same-us events with alternating tiers give three runs sharing
    // eff_from_us, and a single-key window over ties is
    // partition-order-dependent).
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("last_us"), col("last_eid"))
    unioned
      .withColumn("run_id", row_number().over(w).cast("long"))
      .withColumn("is_current", col("eff_to_us").isNull.cast("long"))
      .select(col("user_id"), col("run_id"), col("tier"),
        col("eff_from_us"), col("eff_to_us"), col("n_events"),
        col("last_us"), col("last_eid"), col("is_current"))
  }

  /** Split a batch into (in-order events, late events) against the
    * resident open-run watermark: an event at or before the open run's
    * last (us, event_id) — the FULL total order, so a same-timestamp
    * event with a later event_id straddling a batch boundary still
    * merges — is LATE (already covered by the materialized history) and
    * must be quarantined, not merged. Keys absent from the resident
    * relation pass through. */
  def lateSplit(resident: DataFrame, batchEv: DataFrame)
      : (DataFrame, DataFrame) = {
    val wm = resident.filter(col("is_current") === 1L)
      .select(col("user_id"), col("last_us").as("wm_us"),
        col("last_eid").as("wm_eid"))
    val tagged = batchEv.join(wm, Seq("user_id"), "left")
    val isLate = col("wm_us").isNotNull &&
      (col("us") < col("wm_us") ||
        (col("us") === col("wm_us") && col("event_id") <= col("wm_eid")))
    (tagged.filter(!isLate).drop("wm_us", "wm_eid"),
     tagged.filter(isLate).drop("wm_us", "wm_eid"))
  }
}
