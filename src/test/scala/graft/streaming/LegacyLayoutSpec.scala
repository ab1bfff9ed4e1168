package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Crash orderings of the one-time legacy-layout upgrade — in
  * particular the interrupted-deletion resume, where the rewritten temp
  * directory holds the ONLY copy of rows whose loose files are already
  * gone and must never be discarded — and the reserved-range id remap
  * that keeps a fresh-checkpoint stream (batch ids restarting at 0)
  * from dynamic-overwriting migrated partitions. */
class LegacyLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("rewriteFold resumes an interrupted deletion loop from the " +
      "COMPLETED temp copy instead of re-deriving from surviving files") {
    val base = Files.createTempDirectory("legacy_resume").toString
    val root = new Path(s"$base/pairs")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the crashed first attempt: the COMPLETE rewrite (rows 1 AND 2,
    // _SUCCESS present, ids already remapped into the reserved range)
    // sits in the temp dir; loose file for row 1 was already deleted,
    // row 2's loose file survives
    val tmp = new Path(s"$base/pairs__legacy_tmp")
    Seq((1L, 10L, -2L), (2L, 20L, -3L)).toDF("id_a", "id_b", "batch_id")
      .write.partitionBy("batch_id").parquet(tmp.toString)
    assert(fs.exists(new Path(tmp, "_SUCCESS")))
    fs.mkdirs(root)
    Seq((2L, 20L, 1L)).toDF("id_a", "id_b", "batch_id")
      .write.mode("overwrite").parquet(s"$base/loose_stage")
    fs.listStatus(new Path(s"$base/loose_stage"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(st => assert(fs.rename(st.getPath,
        new Path(root, st.getPath.getName))))

    LegacyLayout.rewriteFold(spark, root)

    // row 1 — whose only copy was the temp dir — survived the resume
    val got = spark.read.parquet(root.toString)
      .select(col("id_a"), col("id_b"), col("batch_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set((1L, 10L, -2L), (2L, 20L, -3L)))
    assert(!fs.exists(tmp))
  }

  test("an INCOMPLETE temp (no _SUCCESS) is discarded and the fold " +
      "re-derives from the loose files, which are all still present") {
    val base = Files.createTempDirectory("legacy_incomplete").toString
    val root = new Path(s"$base/pairs")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$base/pairs__legacy_tmp")
    // garbage temp without _SUCCESS (crash mid-write)
    Seq((9L, 9L, -11L)).toDF("id_a", "id_b", "batch_id")
      .write.partitionBy("batch_id").parquet(tmp.toString)
    fs.delete(new Path(tmp, "_SUCCESS"), false)
    // intact legacy loose files
    fs.mkdirs(root)
    Seq((1L, 2L, 0L)).toDF("id_a", "id_b", "batch_id")
      .write.mode("overwrite").parquet(s"$base/loose_stage")
    fs.listStatus(new Path(s"$base/loose_stage"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(st => assert(fs.rename(st.getPath,
        new Path(root, st.getPath.getName))))

    LegacyLayout.rewriteFold(spark, root)

    // garbage gone; legacy id 0 remapped into the reserved range (-2)
    val got = spark.read.parquet(root.toString)
      .select(col("id_a"), col("id_b"), col("batch_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === Set((1L, 2L, -2L)))
  }

  test("a fresh-checkpoint stream restarting batch ids at 0 cannot " +
      "overwrite migrated legacy partitions (reserved-range remap)") {
    val base = Files.createTempDirectory("legacy_collide").toString
    val root = new Path(s"$base/pairs")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // legacy loose files carrying batch ids 0 and 1 as a DATA column —
    // exactly the ids a reset checkpoint will reuse
    fs.mkdirs(root)
    Seq((1L, 10L, 0L), (2L, 20L, 1L)).toDF("id_a", "id_b", "batch_id")
      .write.mode("overwrite").parquet(s"$base/loose_stage")
    fs.listStatus(new Path(s"$base/loose_stage"))
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(st => assert(fs.rename(st.getPath,
        new Path(root, st.getPath.getName))))

    LegacyLayout.rewriteFold(spark, root)

    // a post-reset stream writes batch 0 with dynamic partition
    // overwrite — the exactly-once write mode every store uses
    Seq((7L, 70L, 0L)).toDF("id_a", "id_b", "batch_id")
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(root.toString)

    val got = spark.read.parquet(root.toString)
      .select(col("id_a"), col("id_b"), col("batch_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // both legacy rows intact in the reserved range, the new batch beside
    assert(got === Set((1L, 10L, -2L), (2L, 20L, -3L), (7L, 70L, 0L)))
  }
}
