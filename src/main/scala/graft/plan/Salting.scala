package graft.plan

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * When one group key carries a disproportionate share of rows (hot
  * customer, hot shingle), a single reducer becomes the stage's straggler.
  * Salting splits each key into `saltBuckets` sub-keys for a partial
  * aggregate, then combines the partials — two shuffles, but each is
  * balanced. AQE's skew-join handling covers joins; this covers
  * aggregations, where AQE cannot split a group.
  *
  * Only algebraic aggregates compose this way; the helpers cover the
  * engine's validation set (count/sum/min/max — SURVEY §2.4).
  */
object Salting {

  /** Salted two-phase aggregation: count/sum/min/max over `valueCols`,
    * grouped by `keyCols`. Results are identical to the direct
    * `groupBy().agg()` (sums ride exact types; min/max/count are
    * order-insensitive). */
  def saltedAgg(df: DataFrame, keyCols: Seq[String],
                sumCols: Seq[String] = Nil,
                minMaxCols: Seq[String] = Nil,
                saltBuckets: Int = 16): DataFrame = {
    require(keyCols.nonEmpty && saltBuckets > 1)
    // DETERMINISTIC salt (row-content hash): spark_partition_id /
    // monotonically_increasing_id are unstable across task retries — a
    // recomputed map partition would re-salt its rows differently than
    // the surviving shuffle output, double-counting or dropping rows
    // exactly when fault tolerance kicks in at scale. Known limit:
    // BYTE-IDENTICAL duplicate rows share one salt; for aggregation
    // that is harmless (the map-side partial combine collapses them per
    // input task before the shuffle, so the reducer still receives at
    // most one row per input partition), and for joins only a key whose
    // rows are fully identical in EVERY column re-concentrates — give
    // such inputs a distinguishing column before salting.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets.toLong)))

    val phase1Aggs: Seq[Column] =
      count(lit(1)).as("__cnt") +:
      (sumCols.map(c => sum(col(c)).as(s"__sum_$c")) ++
       minMaxCols.flatMap(c => Seq(
         min(col(c)).as(s"__min_$c"), max(col(c)).as(s"__max_$c"))))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)

    val phase2Aggs: Seq[Column] =
      sum(col("__cnt")).as("n") +:
      (sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")) ++
       minMaxCols.flatMap(c => Seq(
         min(col(s"__min_$c")).as(s"min_$c"),
         max(col(s"__max_$c")).as(s"max_$c"))))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }

  /** Salted equi-join: split each LEFT key into `saltBuckets` sub-keys,
    * replicate the right side once per salt value, join on
    * (keys, salt). Result is row-identical to
    * `left.join(right, keys, joinType)` — every left row still meets
    * exactly the right rows sharing its key — but the hot key's rows
    * spread over `saltBuckets` reducers instead of one straggler.
    *
    * Left-preserving joins only (inner, left outer, left semi, left
    * anti): replicating the right side makes unmatched-RIGHT accounting
    * ambiguous (an unmatched right row would surface `saltBuckets`
    * times), so right/full-outer callers must use the plain join (AQE
    * skew splitting still applies there). Semi/anti are safe because
    * their output contains only LEFT rows and the replication makes a
    * right key present for EVERY salt value exactly when it is present
    * at all — match/no-match per left row is unchanged.
    *
    * Cost model: the replicated side shuffles `saltBuckets`× its size —
    * worth it only when the skewed side dwarfs it; [[graft.plan.JoinAdvisor
    * .adviseAndJoin]] makes that call from measured inputs. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 joinType: String = "inner",
                 saltBuckets: Int = 16): DataFrame = {
    require(keys.nonEmpty && saltBuckets > 1)
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "left" || jt == "leftouter" ||
      jt == "leftsemi" || jt == "semi" || jt == "leftanti" || jt == "anti",
      s"saltedJoin supports left-preserving joins, not $joinType")
    // deterministic content-hash salt — see saltedAgg's retry rationale
    val saltedL = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(saltBuckets.toLong)))
    val replR = right.withColumn("__salt",
      explode(array((0 until saltBuckets).map(s => lit(s.toLong)): _*)))
    saltedL.join(replR, keys :+ "__salt", joinType).drop("__salt")
  }
}
