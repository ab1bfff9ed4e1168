package graft.plan

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based hardening of [[Salting.saltedJoin]]: seeded scalacheck
  * key multisets (reproducible — no wall-clock randomness) with
  * duplicate-heavy, skewed distributions on BOTH sides and varying salt
  * bucket counts, checked row-for-row against the plain join. The
  * hand-written fixtures cover one hot key; random multisets exercise
  * the cases they under-test — many-to-many key multiplicities (every
  * left duplicate must meet every right duplicate exactly once per
  * pairing) and left rows with no match under the left join. */
class SaltedJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  // keys drawn from a small domain → heavy duplication and guaranteed
  // many-to-many multiplicities; a boost value repeats one key hard
  private val sideGen: Gen[List[Long]] = for {
    base <- Gen.nonEmptyListOf(Gen.choose(0L, 12L))
    hot <- Gen.choose(0L, 12L)
    reps <- Gen.choose(0, 40)
  } yield base ++ List.fill(reps)(hot)

  private def df(keys: Seq[Long], tag: String) =
    keys.zipWithIndex.map { case (k, i) => (k, s"$tag$i") }
      .toDF("k", s"${tag}v")

  test("saltedJoin equals the plain join on seeded skewed multisets, " +
      "inner and left, across salt bucket counts") {
    (1 to 5).foreach { seed =>
      val p = Gen.Parameters.default.withSize(60)
      val l = sideGen.pureApply(p, Seed(seed.toLong))
      val r = sideGen.pureApply(p, Seed(seed.toLong + 100))
      val (left, right) = (df(l, "l"), df(r, "r"))
      Seq(2, 7, 16).foreach { buckets =>
        Seq("inner", "left").foreach { jt =>
          val got = Salting.saltedJoin(left, right, Seq("k"), jt, buckets)
          val want = left.join(right, Seq("k"), jt)
          assert(got.columns.toSeq == want.columns.toSeq)
          assert(got.exceptAll(want).isEmpty &&
            want.exceptAll(got).isEmpty,
            s"seed=$seed buckets=$buckets type=$jt diverged")
        }
      }
    }
  }

  test("row counts scale with key multiplicity products, not with the " +
      "salt bucket count") {
    val left = df(Seq.fill(50)(3L) ++ (1L to 10L), "l")
    val right = df(Seq.fill(20)(3L) ++ (5L to 15L), "r")
    val expect = left.join(right, Seq("k"), "inner").count()
    Seq(2, 16, 64).foreach { b =>
      assert(Salting.saltedJoin(left, right, Seq("k"), "inner", b)
        .count() === expect)
    }
  }
}
