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

  /** Collapse (user_id, event_id, us, tier) change events into SCD-2 runs:
    * (user_id, run_id, tier, eff_from_us, eff_to_us, n_events, last_us,
    * is_current). `run_id` is 1-based per user in time order; `eff_to_us`
    * is NULL on each user's open run; `last_us` is the run's latest event
    * time (the streaming merge's late-event watermark). Ties on `us` are
    * broken by `event_id`, so the total order — and every downstream
    * result — is deterministic. */
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
        max(col("us")).as("last_us"),
        count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("run_id"))
    runsAgg
      .withColumn("eff_to_us", lead(col("eff_from_us"), 1).over(w2))
      .withColumn("is_current", col("eff_to_us").isNull.cast("long"))
      .select(col("user_id"), col("run_id"), col("tier"),
        col("eff_from_us"), col("eff_to_us"), col("n_events"),
        col("last_us"), col("is_current"))
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
        col("last_us"))
    val firstFresh = fresh.filter(col("run_id") === 1L)
      .select(col("user_id"), col("tier").as("f_tier"),
        col("eff_from_us").as("f_from"), col("eff_to_us").as("f_to"),
        col("n_events").as("f_n"), col("last_us").as("f_last"))
    val closed = resident.filter(col("is_current") === 0L)
      .select(col("user_id"), col("tier"), col("eff_from_us"),
        col("eff_to_us"), col("n_events"), col("last_us"))
    val open = resident.filter(col("is_current") === 1L)
      .select(col("user_id"), col("tier"), col("eff_from_us"),
        col("n_events"), col("last_us"))
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
          .otherwise(col("last_us")).as("last_us"))
    // Fresh runs that survive as their own rows: everything except a
    // first run that was absorbed into a same-tier open run.
    val absorbed = open.select(col("user_id"),
      col("tier").as("o_tier"))
    val appended = fresh.join(absorbed, Seq("user_id"), "left")
      .filter(col("o_tier").isNull || col("run_id") >= 2L ||
        col("tier") =!= col("o_tier"))
      .select(col("user_id"), col("tier"), col("eff_from_us"),
        col("eff_to_us"), col("n_events"), col("last_us"))
    val unioned = closed.union(openMerged).union(appended)
    val w = Window.partitionBy(col("user_id")).orderBy(col("eff_from_us"))
    unioned
      .withColumn("run_id", row_number().over(w).cast("long"))
      .withColumn("is_current", col("eff_to_us").isNull.cast("long"))
      .select(col("user_id"), col("run_id"), col("tier"),
        col("eff_from_us"), col("eff_to_us"), col("n_events"),
        col("last_us"), col("is_current"))
  }

  /** Split a batch into (in-order events, late events) against the
    * resident open-run watermark: an event at or before its key's open
    * `last_us` is LATE (already covered by the materialized history) and
    * must be quarantined, not merged — merging it would rewrite closed
    * ranges. Keys absent from the resident relation pass through. */
  def lateSplit(resident: DataFrame, batchEv: DataFrame)
      : (DataFrame, DataFrame) = {
    val wm = resident.filter(col("is_current") === 1L)
      .select(col("user_id"), col("last_us").as("wm_us"))
    val tagged = batchEv.join(wm, Seq("user_id"), "left")
    (tagged.filter(col("wm_us").isNull || col("us") > col("wm_us"))
       .drop("wm_us"),
     tagged.filter(col("wm_us").isNotNull && col("us") <= col("wm_us"))
       .drop("wm_us"))
  }
}
