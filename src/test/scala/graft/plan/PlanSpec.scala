package graft.plan

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class BoundarySpec extends SparkSpec {
  import Boundary._
  import org.apache.spark.sql.functions._

  test("multi-column greaterThan matches struct comparison") {
    val li = graft.Tables.load(spark, sf("sf0.001"), "lineitem")
    // l_shipdate is TIMESTAMP_NTZ: struct comparison needs an NTZ literal
    // (LocalDateTime), while the per-column form coerces either way.
    val ntz = java.time.LocalDateTime.parse("1997-06-30T00:00:00")
    val ts = java.sql.Timestamp.valueOf("1997-06-30 00:00:00")
    val viaOr = li.filter(greaterThan(Seq("l_shipdate", "l_orderkey"),
      Seq(Value(ts), Value(1000L)))).count()
    val viaStruct = li.filter(structGreaterThan(
      Seq("l_shipdate", "l_orderkey"), Seq(ntz, 1000L))).count()
    assert(viaOr == viaStruct)
    assert(viaOr > 0)
  }

  test("MAXVALUE bound: nothing is beyond it") {
    val li = graft.Tables.load(spark, sf("sf0.001"), "lineitem")
    val n = li.filter(greaterThan(Seq("l_shipdate"), Seq(MaxValue))).count()
    assert(n == 0)
    val all = li.filter(lessThan(Seq("l_shipdate"), Seq(MaxValue))).count()
    assert(all == li.count())
  }

  test("greaterThan and lessThan partition the space (minus the boundary)") {
    val li = graft.Tables.load(spark, sf("sf0.001"), "lineitem")
    val ts = java.sql.Timestamp.valueOf("1997-06-30 00:00:00")
    val gt = li.filter(greaterThan(Seq("l_shipdate"), Seq(Value(ts)))).count()
    val lt = li.filter(lessThan(Seq("l_shipdate"), Seq(Value(ts)))).count()
    val eq = li.filter(col("l_shipdate") === lit(ts)).count()
    assert(gt + lt + eq == li.count())
  }

  test("lessOrEqual includes the boundary (LIST_AS_RANGE threshold)") {
    val li = graft.Tables.load(spark, sf("sf0.001"), "lineitem")
    // use the actual max so boundary rows are guaranteed to exist
    val hi = li.agg(max(col("l_shipdate"))).head().getAs[Any](0)
    val le = li.filter(lessOrEqual(Seq("l_shipdate"), Seq(Value(hi)))).count()
    val lt = li.filter(lessThan(Seq("l_shipdate"), Seq(Value(hi)))).count()
    val gt = li.filter(greaterThan(Seq("l_shipdate"), Seq(Value(hi)))).count()
    assert(le == li.count() && gt == 0)
    assert(le > lt) // the boundary rows themselves are included
  }

  test("boundary clauses agree with tuple comparison on random data (seeded)") {
    // property: for random multi-column rows and bounds, the OR-of-ANDs
    // clauses classify rows exactly like lexicographic tuple comparison
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(300)((rnd.nextInt(8).toLong, rnd.nextInt(8).toLong,
      rnd.nextInt(8).toLong))
    val df = rows.toDF("a", "b", "c").cache()
    (1 to 12).foreach { _ =>
      val bound = (rnd.nextInt(8).toLong, rnd.nextInt(8).toLong,
        rnd.nextInt(8).toLong)
      val bounds = Seq(Value(bound._1), Value(bound._2), Value(bound._3))
      val cols = Seq("a", "b", "c")
      import scala.math.Ordering.Implicits._
      val expGt = rows.count(r =>
        (r._1, r._2, r._3) > bound)
      val expLe = rows.count(r =>
        (r._1, r._2, r._3) <= bound)
      val expLt = rows.count(r =>
        (r._1, r._2, r._3) < bound)
      assert(df.filter(greaterThan(cols, bounds)).count() == expGt)
      assert(df.filter(lessOrEqual(cols, bounds)).count() == expLe)
      assert(df.filter(lessThan(cols, bounds)).count() == expLt)
    }
  }

  test("SQL rendering mirrors the OR-of-ANDs shape") {
    val sql = Boundary.Sql.greaterThan(Seq("a", "b"),
      Seq(Value(1), Value(2)))
    assert(sql == "(a > 1) OR (a = 1 AND b > 2)")
  }
}

class PartitionPlannerSpec extends AnyFunSuite {
  import Boundary._

  private def part(name: String, pos: Int, hv: Long, bytes: Long = 100L) =
    SourcePartition(name, pos, Seq(Value(hv)), bytes, rows = 10L)

  test("rangeIpa keeps only partitions beyond the HWM, capped by less-than") {
    val ps = (1 to 10).map(i => part(s"p$i", i, i * 100L))
    val out = PartitionPlanner.rangeIpa(ps,
      offloadedHwm = Some(Seq(Value(300L))),
      lessThan = Some(Seq(Value(800L))))
    assert(out.map(_.name) == Seq("p4", "p5", "p6", "p7", "p8"))
  }

  test("rangeIpa with MAXVALUE partition always includes it") {
    val ps = (1 to 3).map(i => part(s"p$i", i, i * 100L)) :+
      SourcePartition("pmax", 4, Seq(MaxValue), 100L, 10L)
    val out = PartitionPlanner.rangeIpa(ps, Some(Seq(Value(200L))), None)
    assert(out.map(_.name) == Seq("p3", "pmax"))
  }

  test("listIpa is a set difference") {
    val ps = (1 to 4).map(i => part(s"p$i", i, i.toLong))
    val out = PartitionPlanner.listIpa(ps, Set("p2", "p4"))
    assert(out.map(_.name) == Seq("p1", "p3"))
  }

  test("chunking respects caps and never splits equal-HWM groups") {
    val ps = Seq(
      part("a1", 1, 100L, 60), part("a2", 2, 100L, 60), // same HWM: atomic
      part("b", 3, 200L, 60), part("c", 4, 300L, 60))
    val chunks = PartitionPlanner.chunk(ps, maxBytes = 100L, maxCount = 10)
    // a1+a2 exceed 100 bytes but must stay together
    assert(chunks.head.names == Seq("a1", "a2"))
    assert(chunks.map(_.names).flatten == ps.map(_.name))
  }

  test("chunk caps hold for randomized partition lists (seeded)") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      val n = rnd.nextInt(40) + 1
      val ps = (0 until n).map { i =>
        // occasional shared HWMs to exercise the atomic-group rule
        val hv = (i - rnd.nextInt(2)).max(0).toLong
        part(s"p$i", i, hv, rnd.nextInt(999).toLong + 1)
      }
      val chunks = PartitionPlanner.chunk(ps, maxBytes = 2000L, maxCount = 5)
      assert(chunks.flatMap(_.names) == ps.map(_.name)) // order + coverage
      chunks.foreach { c =>
        assert(c.partitions.length <= 5 ||
          c.partitions.map(_.highValues).distinct.length == 1)
      }
    }
  }

  test("offload type transitions") {
    import OffloadType._
    assert(transition(None, Full) == Right(Full))
    assert(transition(Some(Incremental), Full) == Right(Full))
    assert(transition(Some(Full), Incremental).isLeft)
    assert(transition(Some(Full), Incremental, forceReset = true) == Right(Incremental))
  }

  test("listAsRangeIpa sorts by HIGH VALUE, not catalog position") {
    // LIST catalog order is arbitrary: positions scrambled vs values
    val ps = Seq(part("px", 1, 500L), part("py", 2, 100L),
      part("pz", 3, 300L), part("pw", 4, 200L), part("pv", 5, 400L))
    val out = PartitionPlanner.listAsRangeIpa(ps, None, None)
    assert(out.map(_.name) == Seq("py", "pw", "pz", "pv", "px"))
  }

  test("listAsRangeIpa HWM is inclusive, cap is less-or-equal") {
    val ps = (1 to 6).map(i => part(s"p$i", 7 - i, i * 100L)) // reversed positions
    // hwm = 200 (a partition VALUE): p2 itself is already offloaded
    // (like-for-like <=), cap 500 keeps p5 (inclusive)
    val out = PartitionPlanner.listAsRangeIpa(ps,
      offloadedHwm = Some(Seq(Value(200L))),
      lessOrEqual = Some(Seq(Value(500L))))
    assert(out.map(_.name) == Seq("p3", "p4", "p5"))
  }

  private def subPart(parent: String, hv: Long, bytes: Long = 50L) =
    SourcePartition(s"${parent}_sp$hv", hv.toInt, Seq(Value(hv)), bytes,
      rows = 5L)

  private def composite(name: String, pos: Int, subHvs: Seq[Long]) =
    SourcePartition(name, pos, Seq(MaxValue), bytes = 0L, rows = 0L,
      subpartitions = subHvs.map(h => subPart(name, h)))

  test("subpartitionGrain flattens composite catalogs in order") {
    val cat = Seq(
      composite("pA", 0, Seq(100L, 200L, 300L)),
      composite("pB", 1, Seq(100L, 200L, 300L)))
    val subs = PartitionPlanner.subpartitionGrain(cat)
    assert(subs.length == 6)
    assert(subs.map(_.name).startsWith(Seq("pA_sp100", "pA_sp200")))
  }

  test("commonBoundaries flags boundaries present in every parent") {
    val cat = Seq(
      composite("pA", 0, Seq(100L, 200L, 300L)),
      composite("pB", 1, Seq(100L, 300L))) // 200 missing in pB
    val cb = PartitionPlanner.commonBoundaries(cat)
    assert(cb(Seq(Value(100L))) && cb(Seq(Value(300L))))
    assert(!cb(Seq(Value(200L))))
  }

  test("subpartitionRangeIpa plans at subpartition grain behind a common boundary") {
    val cat = Seq(
      composite("pA", 0, Seq(100L, 200L, 300L, 400L)),
      composite("pB", 1, Seq(100L, 200L, 300L, 400L)))
    val out = PartitionPlanner.subpartitionRangeIpa(cat,
      offloadedHwm = Some(Seq(Value(100L))),
      lessThan = Some(Seq(Value(300L))))
    assert(out == Right(Seq(
      subPart("pA", 200L), subPart("pA", 300L),
      subPart("pB", 200L), subPart("pB", 300L))))
  }

  test("subpartitionRangeIpa rejects a non-common or terminal HWM") {
    // 300 exists only in pA: planning up to 300 has a non-common new HWM
    val ragged = Seq(
      composite("pA", 0, Seq(100L, 200L, 300L, 400L)),
      composite("pB", 1, Seq(100L, 200L, 400L)))
    val bad = PartitionPlanner.subpartitionRangeIpa(ragged,
      offloadedHwm = None, lessThan = Some(Seq(Value(300L))))
    assert(bad.isLeft && bad.swap.exists(_.contains("--offload-type=FULL")))
    // planning through the LAST boundary leaves no retained HWM -> invalid
    val cat = Seq(
      composite("pA", 0, Seq(100L, 200L)),
      composite("pB", 1, Seq(100L, 200L)))
    val terminal = PartitionPlanner.subpartitionRangeIpa(cat,
      offloadedHwm = None, lessThan = None)
    assert(terminal.isLeft)
    // empty plan is fine (nothing to do)
    val empty = PartitionPlanner.subpartitionRangeIpa(cat,
      offloadedHwm = Some(Seq(Value(200L))), lessThan = None)
    assert(empty == Right(Nil))
  }
}

class SyntheticPartitionSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("date keys truncate correctly at Y/M/D") {
    import spark.implicits._
    val df = Seq("2024-03-15 10:30:00").toDF("s")
      .select(col("s").cast("timestamp").as("ts"))
    val row = df.select(
      SyntheticPartition.dateStringKey(col("ts"), "Y"),
      SyntheticPartition.dateStringKey(col("ts"), "M"),
      SyntheticPartition.dateStringKey(col("ts"), "D")).head()
    assert(row.getString(0) == "2024")
    assert(row.getString(1) == "2024-03")
    assert(row.getString(2) == "2024-03-15")
  }

  test("numeric range key buckets to granularity multiples") {
    import spark.implicits._
    val df = Seq(-150.0, -1.0, 0.0, 99.9, 100.0, 250.0).toDF("v")
    val keys = df.select(SyntheticPartition.numericRangeKey(col("v"), 100L))
      .collect().map(_.getLong(0)).toSeq
    assert(keys == Seq(-200L, -100L, 0L, 0L, 100L, 200L))
  }

  test("hash bucket key is stable and in range") {
    import spark.implicits._
    val df = (1 to 100).toDF("id")
    val buckets = df.select(SyntheticPartition.hashBucketKey(8, col("id")))
      .collect().map(_.getLong(0)).toSet
    assert(buckets.forall(b => b >= 0 && b < 8))
  }
}
