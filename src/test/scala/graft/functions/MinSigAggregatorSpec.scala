package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MinSigAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("group signature equals per-slot MIN; associative across layouts") {
    val rows = Seq(
      ("a", Seq("3", "7", "1")),
      ("a", Seq("5", "2", "9")),
      ("b", Seq("4", "4", "4"))).toDF("grp", "sigs")
    val agg = udaf(new MinSigAggregator(3))
    val got = rows.groupBy("grp").agg(agg(col("sigs")).as("g"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("a") == Seq("3", "2", "1"))
    assert(got("b") == Seq("4", "4", "4"))
    // layout invariance: 1 partition vs many gives identical signatures
    val many = rows.repartition(7).groupBy("grp")
      .agg(agg(col("sigs")).as("g"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(many == got)
  }

  test("union-minhash property on the corpus: group sig = sig of unioned sets") {
    import graft.operators.Dedup
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .limit(50)
    val sigs = Dedup.minhashSignatures(docs, 8)
      .withColumn("sigs", array((0 until 8).map(i => col(s"sig_$i")): _*))
      .withColumn("grp", pmod(col("sid"), lit(3)))
    val agg = udaf(new MinSigAggregator(8))
    val grouped = sigs.groupBy("grp").agg(agg(col("sigs")).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // ground truth: concatenate each group's texts is wrong (shingle
    // boundaries) — instead compute slot-wise min directly
    val direct = sigs.select(col("grp"),
        posexplode(col("sigs")).as(Seq("slot", "v")))
      .groupBy("grp", "slot").agg(min("v").as("m"))
      .collect().groupBy(_.getLong(0))
      .map { case (g, rs) =>
        g -> rs.sortBy(_.getInt(1)).map(_.getString(2)).toSeq }
    assert(grouped == direct)
  }
}
