package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec {

  test("bucketed tables join with zero Exchange; results match plain join") {
    val base = Files.createTempDirectory("graft_buckets").toString
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val lineitem = graft.Tables.load(spark, sf("sf0.001"), "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    Bucketing.writeBucketed(orders, "b_orders", s"$base/o",
      "o_orderkey", buckets = 8)
    Bucketing.writeBucketed(lineitem, "b_lineitem", s"$base/l",
      "l_orderkey", buckets = 8)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast plan so the shuffle-elimination is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      val expected = orders
        .join(lineitem, col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("mismatched bucket counts fall back to a correct shuffled join") {
    val base = Files.createTempDirectory("graft_buckets2").toString
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    Bucketing.writeBucketed(orders, "b_o8", s"$base/o8",
      "o_orderkey", buckets = 8)
    Bucketing.writeBucketed(orders.withColumnRenamed("o_orderkey", "k"),
      "b_o4", s"$base/o4", "k", buckets = 4)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_o8")
        .join(spark.table("b_o4"), col("o_orderkey") === col("k"))
      // correctness never depends on the layout contract
      assert(joined.count() == orders.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS b_o8")
      spark.sql("DROP TABLE IF EXISTS b_o4")
    }
  }
}
