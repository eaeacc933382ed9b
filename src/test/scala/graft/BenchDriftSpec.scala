package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.BenchDrift

/** The mechanized drift adjudication's pure core (round 18, verdict r17
  * #4): parse, the house bar, and the flag set — the isolated-JVM
  * re-read is exercised end-to-end by the round's SCALING.md run. */
class BenchDriftSpec extends AnyFunSuite {

  test("the house bar needs BOTH the ratio and the absolute delta") {
    // ratio alone: 0.1 → 0.3 is 3× but only +0.2 s — noise on a cheap query
    assert(!BenchDrift.overBar(0.1, 0.3))
    // delta alone: 10 → 10.6 is +0.6 s but 1.06× — inside run-to-run band
    assert(!BenchDrift.overBar(10.0, 10.6))
    // both: flagged
    assert(BenchDrift.overBar(1.0, 1.6))
    assert(BenchDrift.overBar(5.59, 121.0)) // the r17 ann_recall case
    // boundary: exactly 1.5× and exactly +0.5 s flags
    assert(BenchDrift.overBar(1.0, 1.5))
  }

  test("parse + flag reproduce the round-17 adjudication shape") {
    // trimmed from BENCH_STABLE.json / BENCH_r17.json: one real
    // regression-shaped entry, one inside-band entry, one error entry
    val stable = BenchDrift.parse("stable",
      """{"metric":"total","value":160.4,"unit":"sec",
        |"queries":{"ann_recall":5.59,"j1_merge_skipping_z":5.59,
        |"cur_bm25_topk":1.21,"broken_q":2.0},
        |"errors":{},"sf":"sf0.1","repeats":3,"setup_sec":215.0,
        |"calib_before_sec":0.759,"calib_mid_sec":0.750,
        |"calib_after_sec":0.822}""".stripMargin.replace("\n", ""))
    val driver = BenchDrift.parse("r17",
      """{"metric":"total","value":419.3,"unit":"sec",
        |"queries":{"ann_recall":121.0,"j1_merge_skipping_z":6.92,
        |"cur_bm25_topk":8.4,"broken_q":-1.0},
        |"errors":{"broken_q":"boom"},"sf":"sf0.1","repeats":1,
        |"setup_sec":511.0,"calib_before_sec":0.897,
        |"calib_mid_sec":0.972,"calib_after_sec":0.768}""".stripMargin
        .replace("\n", ""))
    assert(stable.queries("ann_recall") === 5.59)
    assert(stable.calib === Seq(0.759, 0.750, 0.822))
    assert(driver.repeats === 1)
    // the error entry is excluded from timings on BOTH the -1 sentinel
    // and the errors object
    assert(!driver.queries.contains("broken_q") &&
      driver.errors.contains("broken_q"))
    val flagged = BenchDrift.flag(stable, driver)
    // ann_recall (21.6×) and cur_bm25_topk (6.9×) flag, worst first;
    // j1_merge_skipping_z at 1.24× stays under the bar (the r17 verdict's
    // own adjudication); broken_q never flags (no timing)
    assert(flagged.map(_._1) === Seq("ann_recall", "cur_bm25_topk"))
    // the isolated re-read numbers from VERDICT.md clear both flags
    assert(!BenchDrift.overBar(5.59, 8.1), "ann_recall isolated 8.1 s clears")
    assert(!BenchDrift.overBar(1.21, 1.3), "cur_bm25_topk isolated clears")
  }
}
