package graft.sink

import java.nio.file.Files

import graft.SparkSpec
import graft.types.PartitionInfo

class BigQuerySinkSpec extends SparkSpec {
  import BigQuerySink._

  test("writer options assemble table, partitioning and clustering") {
    val opts = writerOptions(Config(
      dataset = "warehouse", table = "orders",
      project = Some("acme-analytics"),
      writeMethod = "indirect",
      temporaryGcsBucket = Some("acme-staging"),
      partitionInfo = Some(PartitionInfo("o_orderdate", "M")),
      clusterBy = Seq("o_custkey", "o_orderstatus")))
    assert(opts("table") == "warehouse.orders")
    assert(opts("project") == "acme-analytics")
    assert(opts("writeMethod") == "indirect")
    assert(opts("temporaryGcsBucket") == "acme-staging")
    assert(opts("partitionField") == "o_orderdate")
    assert(opts("partitionType") == "MONTH")
    assert(opts("clusteredFields") == "o_custkey,o_orderstatus")
    assert(opts("createDisposition") == "CREATE_IF_NEEDED")
  }

  test("granularity maps Y/M/D to native partitioning; others stay synthetic") {
    assert(partitionType("y").contains("YEAR"))
    assert(partitionType("M").contains("MONTH"))
    assert(partitionType("d").contains("DAY"))
    assert(partitionType("50000").isEmpty) // numeric range: synthetic col
    val opts = writerOptions(Config(dataset = "d", table = "t",
      writeMethod = "direct",
      partitionInfo = Some(PartitionInfo("price", "50000"))))
    assert(!opts.contains("partitionField") && !opts.contains("partitionType"))
  }

  test("clustering caps at 4 fields like the DDL renderer") {
    val opts = writerOptions(Config(dataset = "d", table = "t",
      writeMethod = "direct",
      clusterBy = Seq("c1", "c2", "c3", "c4", "c5", "c6")))
    assert(opts("clusteredFields") == "c1,c2,c3,c4")
  }

  test("indirect method requires a staging bucket; direct does not") {
    intercept[IllegalArgumentException] {
      Config(dataset = "d", table = "t", writeMethod = "indirect")
    }
    Config(dataset = "d", table = "t", writeMethod = "direct") // fine
    intercept[IllegalArgumentException] {
      Config(dataset = "d", table = "t", writeMethod = "streaming")
    }
  }

  test("offload carries the assembled options without executing") {
    import graft.orchestrate.OffloadRunner
    val base = Files.createTempDirectory("graft_bq").toString
    val steps = OffloadRunner.offload(spark, OffloadRunner.OffloadConfig(
      sourceTable = "nation",
      sourcePath = sf("sf0.001") + "/nation.parquet",
      stagingPath = s"$base/staging",
      finalPath = s"$base/final",
      metadataDir = s"$base/meta",
      bigquerySink = Some(Config(
        dataset = "warehouse", table = "nation",
        writeMethod = "direct",
        clusterBy = Seq("n_regionkey")))))
    assert(steps.forall(_.ok), steps.mkString("\n"))
    val opt = steps.find(_.name == "bigquery_options").get
    assert(opt.detail.contains("table=warehouse.nation"))
    assert(opt.detail.contains("writeMethod=direct"))
    assert(opt.detail.contains("clusteredFields=n_regionkey"))
    // execute flag off: no bigquery save was attempted (offload succeeded
    // with no connector on the classpath), parquet final table still lands
    assert(spark.read.parquet(s"$base/final").count() > 0)
  }
}
