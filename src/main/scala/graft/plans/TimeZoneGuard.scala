package graft.plans

import org.apache.spark.sql.SparkSession

import graft.meta.OffloadMetadata

/** Writer/reader session-timezone guard.
  *
  * Synthetic date partition keys on instant-typed (`TimestampType`) columns
  * are rendered with the WRITE-time session timezone; the
  * [[SyntheticPartitionPruning]] rule derives injected key literals with
  * the READ-time session timezone. If the two differ, an injected equality
  * conjunct can exclude rows whose wall-clock date differs between the
  * zones — wrong results, not just a missed prune. The offload path
  * persists the writer TZ in [[graft.meta.OffloadMetadata.writerTimeZone]];
  * call [[check]] (or [[pinned]]) before reading an offloaded table in a
  * session whose TZ is not pinned by deployment convention.
  */
object TimeZoneGuard {

  final case class TimeZoneMismatch(writer: String, reader: String)
      extends IllegalStateException(
        s"table was written under session timezone '$writer' but this " +
        s"session reads under '$reader': synthetic date-key predicates " +
        "would misprune; set spark.sql.session.timeZone to the writer zone")

  def sessionTz(spark: SparkSession): String =
    spark.conf.get("spark.sql.session.timeZone")

  /** Throws [[TimeZoneMismatch]] when the reader session TZ differs from
    * the recorded writer TZ. Tables without a recorded TZ (pre-guard
    * metadata) pass — the documented same-TZ deployment contract applies. */
  def check(spark: SparkSession, meta: OffloadMetadata): Unit =
    meta.writerTimeZone.foreach { w =>
      val r = sessionTz(spark)
      if (w != r) throw TimeZoneMismatch(w, r)
    }

  /** Runs `body` with the session TZ pinned to the writer's, restoring the
    * previous setting afterwards — the escape hatch for deployments that
    * cannot pin one global session TZ. */
  def pinned[T](spark: SparkSession, meta: OffloadMetadata)(body: => T): T =
    meta.writerTimeZone match {
      case None => body
      case Some(w) =>
        val prev = sessionTz(spark)
        if (prev == w) body
        else {
          spark.conf.set("spark.sql.session.timeZone", w)
          try body
          finally spark.conf.set("spark.sql.session.timeZone", prev)
        }
    }
}
