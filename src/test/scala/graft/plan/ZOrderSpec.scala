package graft.plan

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue2 interleaves bits exactly (a odd positions, b even)") {
    // reference interleave computed by hand
    def morton(a: Long, b: Long): Long = {
      var z = 0L
      (0 until 32).foreach { j =>
        z |= ((a >> j) & 1L) << (2 * j + 1)
        z |= ((b >> j) & 1L) << (2 * j)
      }
      z
    }
    val cases = Seq((0L, 0L), (3L, 5L), (1L, 0L), (0L, 1L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL), (12345L, 67890L),
      (0xFFFFFFFFL, 0xFFFFFFFFL))
    val out = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        ZOrder.zvalue2(col("a"), col("b")).as("z")).collect()
    out.foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // spot value: a=3 (bits 0,1 -> odd pos 1,3), b=5 (bits 0,2 -> even 0,4)
    assert(morton(3L, 5L) == ((1L << 1) | (1L << 3) | 1L | (1L << 4)))
  }

  test("z-ordered files bound BOTH dimensions; a box query skips files") {
    val n = 4096
    val side = 64 // uniform grid: x,y in [0, 64)
    val grid = spark.range(n.toLong)
      .select((col("id") % side).as("x"),
        floor(col("id") / side).as("y"))
    val dir = Files.createTempDirectory("graft_zorder").toString
    ZOrder.zorderWrite(grid, "x", "y", s"$dir/z", numFiles = 16)
    // per-file min/max of both dims straight from the data (what the
    // parquet footer stores and the reader prunes on)
    val stats = spark.read.parquet(s"$dir/z")
      .groupBy(input_file_name().as("f"))
      .agg(min("x").as("minx"), max("x").as("maxx"),
        min("y").as("miny"), max("y").as("maxy"))
      .collect()
    assert(stats.length == 16)
    // box query on an 8x8 corner: only files whose [min,max] box overlaps
    // can contain matches. Z-ordering must confine the box to few files —
    // a single-column sort would overlap it with EVERY file on the other
    // axis (here: y-sorted files all span x=[0,63]).
    val overlapping = stats.count(r =>
      r.getLong(1) <= 7 && r.getLong(2) >= 0 &&
      r.getLong(3) <= 7 && r.getLong(4) >= 0)
    assert(overlapping <= 4,
      s"box query should touch <=4 of 16 z-ordered files, got $overlapping")
    // and the rewrite loses no rows
    assert(spark.read.parquet(s"$dir/z").count() == n.toLong)
  }
}
