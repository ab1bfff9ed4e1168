package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin: latest prior match, inclusive bound, tiebreak, no-match nulls") {
    val left = Seq(
      (1L, 100L, 10L), // after two right rows at ts 90/100
      (1L, 50L, 11L),  // before any right row -> nulls
      (2L, 200L, 12L)) // other key
      .toDF("k", "ts", "lid")
    val right = Seq(
      (1L, 90L, 1L, 1.0),
      (1L, 100L, 2L, 2.0),  // AT the left ts: eligible (inclusive)
      (1L, 100L, 3L, 3.0),  // same ts: greater tiebreak wins
      (1L, 150L, 4L, 4.0),  // after the left row: never matched
      (2L, 199L, 5L, 5.0))
      .toDF("k", "ts", "rid", "v")
    val out = Joins.asOfJoin(left, right, Seq("k"), "ts",
        rightCols = Seq("v"), rightTiebreak = "rid")
      .collect().map(r => r.getAs[Long]("lid") -> r).toMap
    assert(out(10L).getAs[Long]("matched_rid") == 3L) // ts 100, rid 3 wins
    assert(out(10L).getAs[Double]("matched_v") == 3.0)
    assert(out(10L).getAs[Long]("matched_ts") == 100L)
    assert(out(11L).isNullAt(out(11L).fieldIndex("matched_rid")))
    assert(out(12L).getAs[Long]("matched_rid") == 5L)
    assert(out.size == 3) // one output row per left row, always
  }

  test("asOfJoin matches the quadratic formulation on events") {
    val ev = graft.Tables.load(spark, sf("sf0.001"), "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id")
    val clicks = ev.filter(col("event_type") === "click")
    val fast = Joins.asOfJoin(purchases, clicks, Seq("user_id"), "ts",
        rightCols = Seq("value"), rightTiebreak = "event_id")
      .select(col("event_id"), col("matched_event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    // ground truth: join-then-prune (fine at spec scale, quadratic at real
    // scale — which is exactly why the operator exists)
    val slow = purchases.as("l")
      .join(clicks.as("r"),
        col("l.user_id") === col("r.user_id") && col("r.ts") <= col("l.ts"),
        "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l.event_id"))
          .orderBy(col("r.ts").desc_nulls_last,
            col("r.event_id").desc_nulls_last)))
      .filter(col("rk") === 1)
      .select(col("l.event_id"), col("r.event_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(fast == slow)
    assert(fast.values.exists(_ >= 0)) // matches actually happen
  }

  test("rangeJoin: containment, exclusive upper bound, bucket-spanning intervals") {
    val points = Seq((1L, 0.0), (2L, 49.999), (3L, 50.0), (4L, 120.0),
      (5L, 300.0)).toDF("pid", "p")
    val ivs = Seq(
      ("a", 0.0, 50.0),     // [0, 50): pids 1, 2; NOT 3 (exclusive hi)
      ("b", 40.0, 130.0),   // spans multiple buckets: pids 2, 3, 4
      ("c", 200.0, 250.0))  // contains nothing
      .toDF("name", "lo", "hi")
    val out = Joins.rangeJoin(points, "p", ivs, "lo", "hi",
        bucketWidth = 25.0)
      .select(col("pid"), col("name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "a"), (2L, "b"), (3L, "b"), (4L, "b")))
    // equivalence with the theta join on a real column
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
    val bands = Seq(("x", 0.0, 123456.0), ("y", 123456.0, 600000.0))
      .toDF("name", "lo", "hi")
    val bucketed = Joins.rangeJoin(orders, "o_totalprice", bands,
        "lo", "hi", bucketWidth = 50000.0)
      .groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val theta = orders.join(bands,
        col("lo") <= col("o_totalprice") && col("o_totalprice") < col("hi"))
      .groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed == theta)
  }
}
