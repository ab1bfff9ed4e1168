package graft.sink

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalUpdateSpec extends SparkSpec {

  private def partFiles(path: String, partition: String): Set[String] =
    Files.list(Paths.get(path, partition)).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet

  test("upsert rewrites only affected partitions; deletes and updates land") {
    val base = Files.createTempDirectory("graft_iu").toString
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
      .withColumn("part_m", date_format(col("o_orderdate"), "yyyy-MM"))
    orders.write.partitionBy("part_m").parquet(s"$base/t")

    val months = orders.select("part_m").distinct()
      .orderBy("part_m").collect().map(_.getString(0))
    val hotMonth = months.head
    val coldMonth = months.last
    val coldBefore = partFiles(s"$base/t", s"part_m=$coldMonth")

    // changes: bump totalprice for 5 orders of hotMonth + 2 brand-new rows
    val updates = orders.filter(col("part_m") === hotMonth)
      .orderBy("o_orderkey").limit(5)
      .withColumn("o_totalprice", col("o_totalprice") + 1000000.0)
    import spark.implicits._
    val newRows = Seq(
      (9000001L, 1L, "O", 42.0, java.sql.Timestamp.valueOf(s"$hotMonth-15 00:00:00"), "1-URGENT", hotMonth),
      (9000002L, 2L, "O", 43.0, java.sql.Timestamp.valueOf(s"$hotMonth-16 00:00:00"), "1-URGENT", hotMonth))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority", "part_m")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    val changes = updates.unionByName(newRows.select(updates.columns.map(col): _*))

    // deletes: 3 orders from hotMonth
    val deleteKeys = orders.filter(col("part_m") === hotMonth)
      .orderBy(col("o_orderkey").desc).limit(3).select("o_orderkey")

    val before = spark.read.parquet(s"$base/t").count()
    val stats = IncrementalUpdate.upsertPartitions(spark, s"$base/t",
      changes, Seq("o_orderkey"), "part_m", Some(deleteKeys))

    assert(stats.affectedPartitions == Seq(hotMonth))
    assert(stats.upserted == 7 && stats.deleted == 3)

    val after = spark.read.parquet(s"$base/t")
    assert(after.count() == before + 2 - 3)
    // updates landed
    val bumped = after.filter(col("o_totalprice") > 900000.0).count()
    assert(bumped >= 5)
    // new rows present, deleted rows gone
    assert(after.filter(col("o_orderkey") >= 9000001L).count() == 2)
    val deletedIds = deleteKeys.collect().map(_.getLong(0)).toSet
    assert(after.filter(col("o_orderkey").isInCollection(deletedIds)).count() == 0)
    // untouched partition directory is bit-for-bit the same file set
    assert(partFiles(s"$base/t", s"part_m=$coldMonth") == coldBefore)
  }

  test("deleting every row of a partition removes its directory") {
    val base = Files.createTempDirectory("graft_iu3").toString
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
      .withColumn("part_m", date_format(col("o_orderdate"), "yyyy-MM"))
    orders.write.partitionBy("part_m").parquet(s"$base/t")

    val doomedMonth = orders.select("part_m").distinct()
      .orderBy("part_m").collect().map(_.getString(0)).head
    val doomedKeys = orders.filter(col("part_m") === doomedMonth)
      .select("o_orderkey")
    val nDoomed = doomedKeys.count()
    assert(nDoomed > 0)

    val stats = IncrementalUpdate.upsertPartitions(spark, s"$base/t",
      orders.limit(0), Seq("o_orderkey"), "part_m", Some(doomedKeys))

    assert(stats.affectedPartitions == Seq(doomedMonth))
    assert(stats.deleted == nDoomed && stats.upserted == 0)
    assert(stats.finalRowsInAffected == 0)
    // dynamic overwrite can't rewrite a partition with zero surviving rows;
    // the directory itself must be gone, and no stale rows readable
    assert(!Files.exists(Paths.get(s"$base/t", s"part_m=$doomedMonth")))
    val after = spark.read.parquet(s"$base/t")
    assert(after.filter(col("part_m") === doomedMonth).count() == 0)
    assert(after.count() == orders.count() - nDoomed)
  }

  test("emptied-partition cleanup handles values Spark escapes in dir names") {
    // timestamp-cast-to-string partition values contain ' ' and ':' which
    // Spark percent-escapes in directory names; the cleanup must delete the
    // ESCAPED directory, not a literal-valued path that never existed.
    val base = Files.createTempDirectory("graft_iu4").toString
    import spark.implicits._
    val df = Seq(
      (1L, "a", "2024-01-01 00:00:00"),
      (2L, "b", "2024-01-01 00:00:00"),
      (3L, "c", "2024-02-01 00:00:00"))
      .toDF("id", "v", "part_ts")
    df.write.partitionBy("part_ts").parquet(s"$base/t")
    // sanity: the physical dir is escaped
    val dirs = Files.list(Paths.get(s"$base/t")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("part_ts=")).toSet
    assert(dirs.exists(_.contains("%3A")), dirs.toString)

    val doomed = df.filter(col("part_ts") === "2024-01-01 00:00:00")
      .select("id")
    val stats = IncrementalUpdate.upsertPartitions(spark, s"$base/t",
      df.limit(0), Seq("id"), "part_ts", Some(doomed))
    assert(stats.deleted == 2)
    val after = spark.read.parquet(s"$base/t")
    assert(after.count() == 1)
    assert(after.filter(col("part_ts") === "2024-01-01 00:00:00").count() == 0)
    // the escaped directory itself is gone
    val remaining = Files.list(Paths.get(s"$base/t")).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("part_ts=")).toSet
    assert(remaining.size == 1 && !remaining.exists(_.contains("2024-01-01")))
  }

  test("upsert refreshes the copied stats for affected partitions only") {
    import graft.meta.StatsStore
    import graft.source.TableStats
    val base = Files.createTempDirectory("graft_iu5").toString
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
      .withColumn("part_m", date_format(col("o_orderdate"), "yyyy-MM"))
    orders.write.partitionBy("part_m").parquet(s"$base/t")
    StatsStore.save(s"$base/meta", TableStats.collectStats(
      orders, "t", partitionKey = Some(col("part_m"))))
    val before = StatsStore.load(s"$base/meta", "t").get

    val months = orders.select("part_m").distinct()
      .orderBy("part_m").collect().map(_.getString(0))
    val hot = months.head
    val hotRows = orders.filter(col("part_m") === hot).count()
    val doomed = orders.filter(col("part_m") === hot)
      .orderBy(col("o_orderkey").desc).limit(3).select("o_orderkey")
    IncrementalUpdate.upsertPartitions(spark, s"$base/t",
      orders.limit(0), Seq("o_orderkey"), "part_m", Some(doomed),
      statsDir = Some(s"$base/meta"), statsTable = Some("t"))

    val after = StatsStore.load(s"$base/meta", "t").get
    val hotStat = after.partitions.find(_.highValue == hot).get
    assert(hotStat.rows == hotRows - 3)
    // untouched partitions keep their original stats
    val cold = months.last
    assert(after.partitions.find(_.highValue == cold) ==
      before.partitions.find(_.highValue == cold))
    assert(after.numRows == before.numRows - 3)
    // column stats survive the refresh
    assert(after.columns == before.columns)
  }

  test("no-op change set touches nothing") {
    val base = Files.createTempDirectory("graft_iu2").toString
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
      .withColumn("part_m", date_format(col("o_orderdate"), "yyyy-MM"))
    orders.write.partitionBy("part_m").parquet(s"$base/t")
    val empty = orders.limit(0)
    val stats = IncrementalUpdate.upsertPartitions(spark, s"$base/t",
      empty, Seq("o_orderkey"), "part_m")
    assert(stats.affectedPartitions.isEmpty)
    assert(spark.read.parquet(s"$base/t").count() == orders.count())
  }

  test("a SKEWED merge takes the advisor's salted path and the result " +
      "is identical to the plain-join merge") {
    import spark.implicits._
    // target skewed on the merge key: one hot natural key carries ~30%
    // of the rows (a hot account whose events all share its key), the
    // tail is unique — the shape where one reducer becomes the
    // merge's straggler at scale
    val hot = (0 until 3000).map(i => (7L, "p1", s"hot_$i"))
    val tail = (0 until 7000).map(i => (100L + i, if (i % 2 == 0) "p1" else "p2", s"t_$i"))
    val target = (hot ++ tail).toDF("k", "p", "v")
    // changes big enough that the advisor cannot broadcast them; keys
    // chosen from the tail rows already living in p1 (stable partition)
    val changes = (0 until 2500).map(i => (100L + 2 * i, "p1", s"new_$i"))
      .toDF("k", "p", "v")
    val deletes = Seq(7L).toDF("k")

    def run(advised: Boolean): (IncrementalUpdate.UpsertStats, Set[(Long, String, String)]) = {
      val base = Files.createTempDirectory("graft_iu_skew").toString
      target.write.partitionBy("p").parquet(s"$base/t")
      val stats = IncrementalUpdate.upsertPartitions(spark, s"$base/t",
        changes, Seq("k"), "p", Some(deletes),
        adviseJoins = advised,
        adviseBroadcastRowLimit = 1000L, adviseSkewSharePpm = 100000L)
      val rows = spark.read.parquet(s"$base/t")
        .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("p"),
          r.getAs[String]("v"))).toSet
      (stats, rows)
    }

    val (advisedStats, advisedRows) = run(advised = true)
    val (plainStats, plainRows) = run(advised = false)
    // the advisor measured the 30% hot-key share and chose salting
    assert(advisedStats.joinStrategy === "sort_merge_salted",
      s"expected the salted path, got ${advisedStats.joinStrategy}")
    assert(plainStats.joinStrategy === "plain")
    // row-identical results: salting changes the physical plan, never
    // the merge's output
    assert(advisedRows === plainRows)
    assert(advisedStats.upserted === plainStats.upserted &&
      advisedStats.deleted === plainStats.deleted &&
      advisedStats.finalRowsInAffected === plainStats.finalRowsInAffected)
    // the hot key was deleted; the changed keys carry their new values
    assert(!advisedRows.exists(_._1 == 7L))
    assert(advisedRows.count(_._3.startsWith("new_")) === 2500)
  }
}
