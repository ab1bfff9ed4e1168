package graft.orchestrate

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sink.{DdlRenderer, SchemaSync}
import graft.types.{CanonicalColumn, CanonicalType}

class StatusReportSpec extends SparkSpec {

  test("status report inventories offloaded tables") {
    val base = Files.createTempDirectory("graft_status").toString
    val steps = OffloadRunner.offload(spark, OffloadRunner.OffloadConfig(
      sourceTable = "orders",
      sourcePath = sf("sf0.001") + "/orders.parquet",
      stagingPath = s"$base/staging",
      finalPath = s"$base/final",
      metadataDir = s"$base/meta",
      incrementalKey = Seq("o_orderkey")))
    assert(steps.forall(_.ok))
    val report = StatusReport.report(spark, s"$base/meta").collect()
    assert(report.length == 1)
    val row = report.head
    assert(row.getAs[String]("source_table") == "orders")
    assert(row.getAs[String]("offload_type") == "INCREMENTAL")
    assert(row.getAs[Long]("backend_rows") > 0)
    assert(row.getAs[Long]("backend_bytes") > 0)
    assert(row.getAs[String]("incremental_high_value").nonEmpty)
  }

  test("empty metadata dir yields empty report") {
    val base = Files.createTempDirectory("graft_status_empty").toString
    assert(StatusReport.report(spark, base).count() == 0)
  }
}

class TaskMetricsListenerSpec extends SparkSpec {

  test("listener records rows written by a parquet write") {
    val listener = new TaskMetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      val base = Files.createTempDirectory("graft_listener").toString
      val n = 1000L
      spark.range(n).toDF("id").write.parquet(s"$base/out")
      // listener events are posted asynchronously — poll briefly
      val deadline = System.nanoTime() + 10_000_000_000L
      while (listener.totalRecordsWritten < n && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(listener.totalRecordsWritten == n)
      assert(listener.snapshot.nonEmpty)
      assert(listener.snapshot.forall(_.durationMs >= 0))
      listener.reset()
      assert(listener.totalRecordsWritten == 0)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}

class DdlRendererSpec extends SparkSpec {
  import CanonicalType._

  private val cols = Seq(
    CanonicalColumn("id", Integer8, nullable = false),
    CanonicalColumn("amount", Decimal(Some(10), Some(2))),
    CanonicalColumn("big", Decimal(Some(38), Some(10))),
    CanonicalColumn("ts", Timestamp),
    CanonicalColumn("name", VariableString))

  test("Spark SQL DDL golden") {
    val ddl = DdlRenderer.createTable("db.t", cols, DdlRenderer.Dialect.SparkSql,
      partitionBy = Seq("ts"))
    assert(ddl ==
      """CREATE TABLE db.t (
        |  id BIGINT NOT NULL,
        |  amount DECIMAL(10,2),
        |  big DECIMAL(38,10),
        |  ts TIMESTAMP_NTZ,
        |  name STRING
        |) USING parquet
        |PARTITIONED BY (ts);""".stripMargin)
  }

  test("BigQuery DDL golden: NUMERIC vs BIGNUMERIC rule") {
    val ddl = DdlRenderer.createTable("ds.t", cols, DdlRenderer.Dialect.BigQuery,
      partitionBy = Seq("ts"), clusterBy = Seq("id", "name"))
    assert(ddl.contains("amount NUMERIC(10, 2)"))
    assert(ddl.contains("big BIGNUMERIC(38, 10)")) // scale 10 > 9
    assert(ddl.contains("id INT64 NOT NULL"))
    assert(ddl.contains("ts DATETIME"))
    assert(ddl.contains("PARTITION BY ts"))
    assert(ddl.contains("CLUSTER BY id, name"))
  }

  test("BigQuery clustering caps at 4 columns") {
    val many = (1 to 6).map(i => CanonicalColumn(s"c$i", Integer4))
    val ddl = DdlRenderer.createTable("ds.t", many,
      DdlRenderer.Dialect.BigQuery, clusterBy = many.map(_.name))
    assert(ddl.contains("CLUSTER BY c1, c2, c3, c4"))
    assert(!ddl.contains("c5,"))
  }
}

class SchemaSyncSpec extends SparkSpec {

  test("analyze detects added columns and renders ALTERs; removal is safe") {
    val v1 = graft.Tables.load(spark, sf("sf0.001"), "orders")
      .drop("o_orderpriority")
    val v2 = graft.Tables.load(spark, sf("sf0.001"), "orders")
      .withColumn("extra", lit(1))
    val plan = SchemaSync.analyze(v2, v1, "backend.orders")
    assert(plan.addedColumns.map(_.name) == Seq("o_orderpriority", "extra"))
    assert(plan.removedColumns.isEmpty)
    assert(plan.alterStatements.exists(
      _ == "ALTER TABLE backend.orders ADD COLUMN extra INT;"))
    // reverse direction: dropped column is reported, no ALTER generated
    val reverse = SchemaSync.analyze(v1, v2, "backend.orders")
    assert(reverse.removedColumns.map(_.name) == Seq("o_orderpriority", "extra"))
  }

  test("evolvedRead merges schemas across parquet slices") {
    val base = Files.createTempDirectory("graft_evo").toString
    val orders = graft.Tables.load(spark, sf("sf0.001"), "orders")
    orders.write.parquet(s"$base/t")
    orders.withColumn("extra", lit(7)).write.mode("append").parquet(s"$base/t")
    val merged = SchemaSync.evolvedRead(spark, s"$base/t")
    assert(merged.columns.contains("extra"))
    assert(merged.count() == orders.count() * 2)
    assert(merged.filter(col("extra").isNull).count() == orders.count())
  }
}
