package graft.plan

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SaltingSpec extends SparkSpec {

  test("salted two-phase aggregation equals the direct aggregation") {
    val li = graft.Tables.load(spark, sf("sf0.001"), "lineitem")
      .withColumn("qty_dec", col("l_quantity").cast("decimal(18,2)"))
    val direct = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("qty_dec")).as("sum_qty_dec"),
        min(col("l_orderkey")).as("min_l_orderkey"),
        max(col("l_orderkey")).as("max_l_orderkey"))
      .orderBy(col("l_returnflag"))
      .collect()
    val salted = Salting.saltedAgg(li, Seq("l_returnflag"),
        sumCols = Seq("qty_dec"), minMaxCols = Seq("l_orderkey"),
        saltBuckets = 8)
      .orderBy(col("l_returnflag"))
      .collect()
    assert(salted.length == direct.length)
    direct.zip(salted).foreach { case (d, s) =>
      assert(d.getString(0) == s.getString(0))
      assert(d.getLong(1) == s.getAs[Long]("n"))
      assert(d.getDecimal(2) == s.getAs[java.math.BigDecimal]("sum_qty_dec"))
      assert(d.getLong(3) == s.getAs[Long]("min_l_orderkey"))
      assert(d.getLong(4) == s.getAs[Long]("max_l_orderkey"))
    }
  }

  test("salting spreads a single hot key over multiple partial groups") {
    import spark.implicits._
    val skewed = (1 to 10000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val out = Salting.saltedAgg(skewed, Seq("k"), sumCols = Seq("v"),
      saltBuckets = 8).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n") == 10000L)
    assert(out.head.getAs[Long]("sum_v") == (1 to 10000).map(_.toLong).sum)
  }
}
