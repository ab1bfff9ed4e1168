package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Scale-safe join shapes Spark lacks as built-ins: as-of (temporal) join
  * and interval/range join.
  *
  * The reference executes no data joins of its own (`SURVEY.md` §2.5), but
  * names these as the engine-native surface the new engine must provide.
  * Both are compositions of existing operators — the preferred extension
  * path — with plan shapes chosen for 100 TB, not the textbook forms:
  *
  *  - The naive as-of join (`l ⋈ r ON key AND r.ts <= l.ts` + keep latest)
  *    fans every left row out to ALL earlier right rows before pruning —
  *    quadratic per key. The union + carry-forward-window form below is ONE
  *    shuffle on the key and linear in |L|+|R|.
  *  - The naive range join (`p ⋈ iv ON lo <= p AND p < hi`) is a broadcast
  *    nested loop — |P|·|IV| comparisons. Bucketing turns it into an
  *    equi-join whose fan-out is bounded by intervals-per-bucket.
  */
object Joins {

  /** Backward as-of join: for each left row, the LATEST right row with
    * `r.ts <= l.ts` on the same key; rows with no prior right row keep
    * nulls. Ties at one timestamp resolve deterministically: the right row
    * with the greatest `rightTiebreak` wins, and a right row AT the left
    * row's timestamp is eligible (inclusive bound).
    *
    * Implementation: tag and union both sides, sort each key's timeline
    * once (right before left at equal ts), and carry the last non-null
    * right payload forward with an `ignoreNulls` window `last` — the
    * streaming-merge formulation of as-of. `rightCols` is the right-side
    * payload to carry; every carried column lands as `matched_<name>`. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, rightCols: Seq[String],
               rightTiebreak: String): DataFrame = {
    require(keyCols.nonEmpty && rightCols.nonEmpty)
    val carried = (rightTiebreak +: rightCols).distinct
    val payType = StructType(
      StructField("__rts", right.schema(tsCol).dataType) +:
        carried.map(c => StructField(c, right.schema(c).dataType)))
    val leftPayload = left.columns.toSeq.filterNot(keyCols.contains)
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(tsCol).as("__ts"), lit(1).as("__is_left")) ++
        leftPayload.map(c => col(c).as(s"__l_$c")) :+
        lit(null).cast(payType).as("__rpay"): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(tsCol).as("__ts"), lit(0).as("__is_left")) ++
        leftPayload.map(c =>
          lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) :+
        struct((col(tsCol).as("__rts") +: carried.map(col)): _*).as("__rpay"):
        _*)
    // timeline order: ts, right-before-left (inclusive bound), then the
    // tiebreak so the LAST right row at a timestamp wins the carry
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__is_left").asc,
        col("__rpay").getField(rightTiebreak).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(
        keyCols.map(col) ++
          Seq(col("__ts").as(tsCol)) ++
          leftPayload.filterNot(_ == tsCol).map(c => col(s"__l_$c").as(c)) ++
          Seq(col("__match").getField("__rts").as(s"matched_$tsCol")) ++
          carried.map(c => col("__match").getField(c).as(s"matched_$c")): _*)
  }

  /** Interval/range join: pair each point with every interval containing it
    * (`lo <= p < hi`) via BUCKETED equi-join. Both sides key on
    * `floor(x / bucketWidth)`; each interval explodes into the buckets it
    * overlaps, so the join is an equi-join on the bucket id and the exact
    * containment predicate only filters within-bucket candidates. Interval
    * fan-out is `ceil(span/bucketWidth)` rows — pick `bucketWidth` near the
    * median interval span. */
  def rangeJoin(points: DataFrame, pointCol: String,
                intervals: DataFrame, loCol: String, hiCol: String,
                bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0)
    val p = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        // hi is exclusive: a boundary-aligned hi does not open a new bucket
        floor((col(hiCol) - lit(1e-9)) / bucketWidth).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(loCol) <= col(pointCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
