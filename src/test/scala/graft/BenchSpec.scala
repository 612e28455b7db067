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

  test("loadRobust: median over load-clean repeats; one contended pass cannot inflate") {
    // r13's shape: passes 1 and 3 contended (loads 26.8-ish), pass 2 clean
    // — the reported figure must be the clean repeat, not a contended median
    assert(loadRobust(Seq(2.54, 0.85, 2.60), Seq(26.8, 5.2, 24.0), 16.0, 3) == 0.85)
    // two clean passes: their median
    assert(loadRobust(Seq(1.0, 1.2, 9.0), Seq(3.0, 4.0, 30.0), 16.0, 3) == 1.1)
  }

  test("loadRobust fallbacks: all-contended -> min; no load signal -> tightest window") {
    // every pass contended: min is the least-inflated sample
    assert(loadRobust(Seq(5.0, 3.0, 8.0), Seq(30.0, 28.0, 25.0), 16.0, 3) == 3.0)
    // loadavg unreadable (-1 samples): the pre-r14 tightest-window median
    assert(loadRobust(Seq(1.0, 1.1, 50.0), Seq(-1.0, -1.0, -1.0), 16.0, 2) == 1.05)
    // crash sentinels excluded before any load filtering
    assert(loadRobust(Seq(-1.0, 2.0), Seq(3.0, 3.0), 16.0, 3) == 2.0)
    assert(loadRobust(Seq(-1.0, -1.0), Seq(3.0, 3.0), 16.0, 3) == -1.0)
    // a repeat with no load sample is never "clean", but it still
    // participates in the min fallback when no clean repeat exists
    assert(loadRobust(Seq(9.0, 9.5, 1.0), Seq(30.0, 29.0), 16.0, 3) == 1.0)
  }

  private val fmt3 = (v: Double) =>
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  test("fitSlowest keeps the slowest queries within the byte budget, name-ordered") {
    val med = Seq("q_fast" -> 0.1, "q_slow" -> 9.0, "q_mid" -> 2.0, "q_slower" -> 12.0)
    // each entry costs len(name)+len("N.NNN")+4; budget for ~2 entries
    val kept = fitSlowest(med, fmt3, 2 + 2 * (8 + 6 + 4))
    assert(kept.map(_._1) == Seq("q_slow", "q_slower"), // name order, slowest pair
      s"got $kept")
    // rendered size must actually fit the budget it was given
    val rendered = kept.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
      .mkString("{", ",", "}")
    assert(rendered.length <= 2 + 2 * (8 + 6 + 4))
  }

  test("fitSlowest: whole set fits a generous budget; zero budget keeps nothing") {
    val med = (1 to 120).map(i => f"q$i%03d" -> i.toDouble)
    assert(fitSlowest(med, fmt3, 1 << 20).size == 120)
    assert(fitSlowest(med, fmt3, 0).isEmpty)
    // the r7 regression shape: 100+ queries, ~1500-byte map budget — the
    // kept set must render under budget and contain the slowest key
    val kept = fitSlowest(med, fmt3, 1500)
    val rendered = kept.map { case (k, v) => "\"" + k + "\":" + fmt3(v) }
      .mkString("{", ",", "}")
    assert(rendered.length <= 1500 && kept.nonEmpty)
    assert(kept.exists(_._1 == "q120"), "the slowest query must survive the cut")
  }
}
