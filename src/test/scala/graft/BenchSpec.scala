package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-contract pins for the bench main (round 18, verdict r17 #3). */
class BenchSpec extends AnyFunSuite {

  test("result-file resolution: a subset run can never clobber a committed full-suite artifact") {
    // the four (mode × subset) combinations each own a file — in round 17
    // a 3-query BENCH_ONLY run with repeats>1 overwrote the 154-query
    // BENCH_STABLE.json regression artifact in place
    assert(Bench.defaultOutFile(repeats = 1, subset = false) === "BENCH_RESULT.json")
    assert(Bench.defaultOutFile(repeats = 3, subset = false) === "BENCH_STABLE.json")
    assert(Bench.defaultOutFile(repeats = 1, subset = true) === "BENCH_SUBSET.json")
    assert(Bench.defaultOutFile(repeats = 3, subset = true) === "BENCH_SUBSET_STABLE.json")
    // the committed artifacts are reachable ONLY from non-subset runs
    val committed = Set("BENCH_RESULT.json", "BENCH_STABLE.json")
    for (r <- 1 to 4)
      assert(!committed.contains(Bench.defaultOutFile(r, subset = true)))
  }
}
