package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention logic (r6 verdict ask #1): spread detection,
  * rerun decision, and tightest-window medians are pure functions in
  * BenchStats — pinned here so BENCH_rN artifacts keep meaning what
  * they claim (the r6 official artifact reported an 11× "regression"
  * that was host contention; these are the defenses). */
class BenchSpec extends AnyFunSuite {
  import BenchStats._

  test("median: odd, even (averages the middle pair), crashed repeats excluded") {
    assert(median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(median(Seq(1.0, 2.0, 3.0, 4.0)) == 2.5)
    // a -1 crash sentinel must not drag the median down
    assert(median(Seq(-1.0, 5.0, 7.0)) == 6.0)
    assert(median(Seq(-1.0, -1.0)) == -1.0)
    assert(median(Seq.empty) == -1.0)
  }

  test("spread: max/min over valid repeats, 1.0 when fewer than two") {
    assert(spread(Seq(1.0, 3.0)) == 3.0)
    assert(spread(Seq(2.0)) == 1.0)
    assert(spread(Seq(-1.0, 4.0)) == 1.0) // one valid repeat
    assert(spread(Seq.empty) == 1.0)
    // sub-millisecond minimum floored — no infinite spread on ~0 s pairs
    assert(spread(Seq(0.0, 0.002)) == 2.0)
  }

  test("needsRerun fires above the 3x limit and not at honest spreads") {
    assert(!needsRerun(Seq(1.0, 1.3, 1.5)))      // honest host jitter
    assert(!needsRerun(Seq(1.0, 3.0)))           // exactly at the limit
    assert(needsRerun(Seq(13.2, 212.2, 96.0)))   // r6's e7_simhash repeats
  }

  test("tightestWindow picks the cluster a load spike is least likely in") {
    // r6's contaminated e7 repeats + three honest reruns: the window of
    // 3 with the smallest range is the honest cluster, not the spikes
    val (v, s) = tightestWindow(Seq(13.2, 212.2, 96.0, 1.1, 1.0, 1.2), 3)
    assert(v == 1.1)
    assert(s <= 1.2000000001)
    // <= k valid repeats: the full set, its true median and spread
    val (v2, s2) = tightestWindow(Seq(2.0, 1.0), 3)
    assert(v2 == 1.5 && s2 == 2.0)
    assert(tightestWindow(Seq(-1.0, -1.0), 3) == ((-1.0, 1.0)))
    // crash sentinels excluded before windowing
    assert(tightestWindow(Seq(-1.0, 4.0, 4.2, 4.1, 90.0), 3)._1 == 4.1)
  }

  test("a persistently-contended repeat set still spreads >3x after windowing") {
    // every window of 3 spans a spike — the artifact must stamp contended
    val xs = Seq(1.0, 50.0, 120.0, 200.0, 310.0, 400.0)
    assert(tightestWindow(xs, 3)._2 > SpreadLimit)
  }
}
