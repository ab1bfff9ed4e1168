package graft.source

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus ingest/egress — the lingua franca of training-data
  * interchange (one JSON object per line, splittable, append-friendly).
  *
  * Reading is schema-FIRST: crawl-scale JSONL always contains malformed
  * lines, and schema inference over 100 TB is two full passes; a declared
  * schema + PERMISSIVE mode makes the read one pass and routes broken
  * lines into a quarantine frame instead of failing the job. The good/bad
  * split shares one scan via caching (Spark cannot filter on the corrupt
  * column of an uncached JSON scan — SPARK-26243); at warehouse scale
  * persist to DISK_ONLY or land the raw read to parquet once and split
  * from there.
  */
object TextIngest {

  val CorruptCol = "_corrupt_record"

  /** A quarantined JSONL read: `good` has exactly the declared columns,
    * `bad` is the raw offending lines. Both views share one cached scan —
    * call [[unpersist]] once the consumer has materialized what it needs,
    * or the cached raw read pins executor memory for the session. */
  case class JsonlRead(good: DataFrame, bad: DataFrame,
                       private val raw: DataFrame) {
    def unpersist(): Unit = { raw.unpersist(); () }
  }

  /** Read JSONL with corrupt-record quarantine. Keep the bad frame — a
    * dropped-on-the-floor parse error at ingest is how corpora silently
    * shrink. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType)
      : JsonlRead = {
    val raw = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    JsonlRead(good, bad, raw)
  }

  /** Write a corpus as JSONL, one file per partition (splittable,
    * order-stable within a partition). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** CSV read with the same corrupt-record quarantine contract as
    * [[readJsonl]]: declared schema, PERMISSIVE mode, malformed rows
    * (unbalanced quotes, uncastable cells, wrong arity) land in `bad`
    * instead of failing the job or silently nulling out.
    *
    * `multiLine = true` is required when quoted fields contain embedded
    * newlines (document text does) — the DOCUMENTED cost is that
    * multi-line CSV files are not splittable (one file = one task), so a
    * 100 TB corpus should land either as many mid-size files (the writer
    * below produces one per partition, which preserves parallelism) or in
    * a line-safe encoding (JSONL / parquet). */
  def readCsv(spark: SparkSession, path: String, schema: StructType)
      : JsonlRead = {
    val raw = spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)
      .cache()
    val good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    JsonlRead(good, bad, raw)
  }

  /** Write a corpus as headered CSV, RFC-4180 quoting (`""` escapes),
    * one file per partition. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true").option("escape", "\"")
      .csv(path)
}
