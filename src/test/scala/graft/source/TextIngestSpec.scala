package graft.source

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class TextIngestSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("corrupt lines are quarantined, not dropped or fatal") {
    val dir = Files.createTempDirectory("jsonl").toString
    Files.write(java.nio.file.Paths.get(dir, "part-0.jsonl"),
      java.util.Arrays.asList(
        """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
        """{"doc_id": 2, "text": "broken line""",        // truncated JSON
        """not json at all""",
        """{"doc_id": 3, "text": "bonjour", "lang": "fr"}"""))
    val rt = TextIngest.readJsonl(spark, dir, schema)
    assert(rt.good.count() == 2)
    assert(rt.good.columns.toSeq == Seq("doc_id", "text", "lang"))
    assert(rt.good.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L))
    val badLines = rt.bad.collect().map(_.getString(0))
    assert(badLines.length == 2)
    assert(badLines.exists(_.contains("not json at all")))
    rt.unpersist()
  }

  test("write/read round-trip is lossless for a clean corpus") {
    val dir = Files.createTempDirectory("jsonl_rt").toString + "/out"
    val docs = graft.Tables.load(spark, sf("sf0.001"), "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    TextIngest.writeJsonl(docs, dir)
    val rt = TextIngest.readJsonl(spark, dir, docs.schema)
    assert(rt.bad.isEmpty)
    assert(rt.good.count() == docs.count())
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = rt.good.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
    rt.unpersist()
  }

  test("CSV round-trip preserves embedded newlines/quotes; bad rows quarantined") {
    val dir = Files.createTempDirectory("csv_rt").toString + "/out"
    val docs = Seq(
      (1L, "line one\nline two", "en"),
      (2L, "has \"quotes\" and, commas", "fr"),
      (3L, "plain", "de")).toDF("doc_id", "text", "lang")
    TextIngest.writeCsv(docs, dir)
    Files.write(java.nio.file.Paths.get(dir, "part-bad.csv"),
      java.util.Arrays.asList("doc_id,text,lang",
        "notanumber,oops,xx"))      // uncastable doc_id → quarantine
    val rt = TextIngest.readCsv(spark, dir, docs.schema)
    assert(rt.bad.count() == 1)
    assert(rt.good.count() == 3)
    val a = docs.orderBy("doc_id").collect().map(_.toSeq)
    val b = rt.good.orderBy("doc_id").collect().map(_.toSeq)
    assert(a.sameElements(b))
    rt.unpersist()
  }
}
