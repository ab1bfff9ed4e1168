package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench contention-escalation policy (VERDICT r12 ask #1):
  * spread beyond the threshold => the first-pass number is discarded and
  * the query re-measured; the contention fingerprint heuristic labels a
  * run whose wall clock dwarfs its query time or whose start loadavg
  * already saturated the host.
  */
class BenchStatsSpec extends AnyFunSuite {

  test("median is the upper median, order-independent") {
    assert(BenchStats.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    // even length: upper of the two middle elements (index n/2) — the
    // convention every artifact since round 9 was produced with
    assert(BenchStats.median(Seq(4.0, 1.0, 3.0, 2.0)) == 3.0)
    assert(BenchStats.median(Seq(5.0)) == 5.0)
  }

  test("spread is max/min and survives a zero-time fastest rep") {
    assert(BenchStats.spread(Seq(1.0, 2.0, 4.0)) == 4.0)
    assert(BenchStats.spread(Seq(1.5, 1.5)) == 1.0)
    // timer quantisation: a 0.0 fastest rep must not divide by zero
    assert(BenchStats.spread(Seq(0.0, 1.0)) == 1.0 / 1e-9)
  }

  test("remeasure escalation fires only for multi-rep runs past threshold") {
    assert(BenchStats.needsRemeasure(reps = 3, spread = 3.5, threshold = 3.0))
    assert(!BenchStats.needsRemeasure(reps = 3, spread = 3.0, threshold = 3.0))
    assert(!BenchStats.needsRemeasure(reps = 3, spread = 1.1, threshold = 3.0))
    // reps == 1 has no spread to judge — the single-rep outlier rerun
    // path (3x suite median) handles that mode instead
    assert(!BenchStats.needsRemeasure(reps = 1, spread = 9.9, threshold = 3.0))
  }

  test("contention fingerprint: wall >> expected execution or saturated " +
      "loadavg") {
    // single-run suite: 240 s of queries inside a 900 s wall means
    // something else owned the box
    assert(BenchStats.looksContended(900.0, 240.0, 1, 1.0, 32))
    // reps=3 + warmup executes each query 4x: a 1000 s wall around a
    // 210 s median-sum is the EXPECTED cost of the reps, not contention
    // (the r13 idle run that pinned this: wall 1016, total 209.9)
    assert(!BenchStats.looksContended(1016.0, 209.9, 4, 0.26, 32))
    // same reps, but wall far beyond even 3x the executed time
    assert(BenchStats.looksContended(3000.0, 209.9, 4, 0.26, 32))
    // tiny suite (sf0.001 smoke): startup dominates legitimately
    assert(!BenchStats.looksContended(90.0, 20.0, 1, 1.0, 32))
    // loadavg above host cpus at start: contended regardless of ratio
    assert(BenchStats.looksContended(250.0, 240.0, 1, 33.0, 32))
    // healthy idle run
    assert(!BenchStats.looksContended(300.0, 240.0, 1, 2.0, 32))
  }
}
