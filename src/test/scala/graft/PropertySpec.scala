package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters}

import graft.enrich.StubEnrichmentClient
import graft.operators.TextSearch

/** Property-based checks (SURVEY §5.4) for the pure parts of the engine —
  * scoring formulas, hashes, retry algebra — which run without a Spark job
  * per case. DataFrame-level properties (merge idempotence, top-k ⊆ sort
  * prefix) live in the example-based suites to keep test wall-time sane. */
class PropertySpec extends AnyFunSuite {

  private def holds(p: Prop): Unit = {
    val r = check(Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("popularity factor formula is bounded in [0.8, 1.0] for any count") {
    holds(forAll(Gen.chooseNum(0L, Long.MaxValue / 2)) { pc =>
      val f = math.min(0.2, pc / 500.0) + 0.8
      f >= 0.8 && f <= 1.0
    })
  }

  test("limit clamp is idempotent and always lands in [1, 100]") {
    holds(forAll(Gen.chooseNum(Int.MinValue + 1, Int.MaxValue)) { n =>
      val c = TextSearch.clampLimit(n)
      c >= 1 && c <= 100 && TextSearch.clampLimit(c) == c
    })
  }

  test("stub embeddings are deterministic, dimension-stable, and in [0, 1)") {
    val client = new StubEnrichmentClient(8)
    holds(forAll(Gen.alphaNumStr) { t =>
      val a = client.embed(Seq(t)).head
      val b = client.embed(Seq(t)).head
      a.length == 8 && a.sameElements(b) && a.forall(v => v >= 0.0 && v < 1.0)
    })
  }

  test("h32 stays within unsigned 32-bit range") {
    holds(forAll(Gen.asciiPrintableStr) { s =>
      val h = StubEnrichmentClient.h32(s)
      h >= 0L && h <= 0xffffffffL
    })
  }

  test("bisect returns exactly the non-poison elements, in order") {
    import graft.enrich.Retry
    import graft.enrich.Retry.BadBatch
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(0, 50))
      poison <- Gen.chooseNum(0, 50)
    } yield (xs, poison)
    holds(forAll(gen) { case (xs, poison) =>
      def call(b: Seq[Int]): Seq[Int] =
        if (b.contains(poison)) throw BadBatch() else b
      val out = Retry.withBisect(xs, call, (i: Int) => if (i == poison) None else Some(i))
      out == xs.filter(_ != poison)
    })
  }
}
