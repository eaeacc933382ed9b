package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Behavioral properties of the sketch suite that the oracle hash cannot
  * see: determinism under physical layout (the whole point of hash-derived
  * sketches — a result that moves when partitioning moves would pass any
  * single run and flake across clusters), and the structural guarantees on
  * adversarial inputs the fixture corpus doesn't exercise.
  */
class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf0001

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("quantile sketch is invariant under repartitioning") {
    val li = graft.io.Tables.lineitem(spark, dir)
    val base = rows(Sketches.quantileSketchOn(li))
    val moved = rows(Sketches.quantileSketchOn(li.repartition(7)))
    assert(base === moved, "bottom-k-by-hash sample must not depend on layout")
    // and the contract holds on the fixture
    assert(Sketches.quantileSketchOn(li).collect().forall(_.getAs[Boolean]("within_eps")))
  }

  test("group quantile sketch is layout-invariant and its merge is order-independent") {
    val li = graft.io.Tables.lineitem(spark, dir)
    val base = rows(Sketches.quantileGroupsOn(li))
    assert(base === rows(Sketches.quantileGroupsOn(li.repartition(11))),
      "per-group bottom-k must not depend on layout")
    assert(Sketches.quantileGroupsOn(li).collect()
      .forall(_.getAs[Boolean]("within_eps")))

    // the Aggregator's algebra directly: merge commutes and respects K
    import graft.functions.BottomKSketch
    val r = new scala.util.Random(7)
    def buf(n: Int) = (0 until n).foldLeft(BottomKSketch.zero) { (b, _) =>
      BottomKSketch.reduce(b, (r.nextLong() & Long.MaxValue, r.nextDouble()))
    }
    val (a, b) = (buf(400), buf(300))
    val ab = BottomKSketch.merge(a, b); val ba = BottomKSketch.merge(b, a)
    assert(ab.h.toSeq === ba.h.toSeq && ab.v.toSeq === ba.v.toSeq)
    assert(ab.h.length <= BottomKSketch.K)
    assert(ab.h.toSeq === ab.h.sorted.toSeq, "buffer stays hash-sorted")
  }

  test("kmv set ops are layout-invariant and the sketch algebra holds") {
    val ords = graft.io.Tables.orders(spark, dir)
    val base = rows(Sketches.kmvSetOpsOn(ords))
    assert(base === rows(Sketches.kmvSetOpsOn(ords.repartition(13))),
      "bottom-k hash sampling must not depend on layout")
    assert(Sketches.kmvSetOpsOn(ords).collect()
      .forall(_.getAs[Boolean]("within_eps")))

    // the aggregator's algebra directly: merge commutes, trims to K, and
    // an unsaturated sketch IS its input set (estimates turn exact)
    import graft.functions.KmvValues
    val r = new scala.util.Random(11)
    def buf(n: Int) = (0 until n).foldLeft(KmvValues.zero) { (b, _) =>
      KmvValues.reduce(b, r.nextInt(Int.MaxValue).toLong)
    }
    val (a, b) = (buf(500), buf(300))
    val ab = KmvValues.merge(a, b); val ba = KmvValues.merge(b, a)
    assert(ab.toSeq === ba.toSeq, "merge must be commutative")
    assert(ab.length <= KmvValues.K)
    assert(ab.toSeq === ab.sorted.toSeq, "buffer stays sorted")
    val small = buf(40)
    assert(small.length === KmvValues.merge(small, KmvValues.zero).length,
      "zero is a merge identity")
  }

  test("source-overlap report is layout-invariant and honors its error contract") {
    val docs = graft.io.Tables.documents(spark, dir)
    val base = rows(Sketches.sourceOverlapOn(docs))
    assert(base === rows(Sketches.sourceOverlapOn(docs.repartition(9))),
      "per-source sketches must not depend on layout")
    val all = Sketches.sourceOverlapOn(docs).collect()
    assert(all.length === 190, "20 sources -> 190 unordered pairs")
    assert(all.forall(_.getAs[Boolean]("within_eps")))
    // signal, not just bounded error: estimates are non-degenerate and the
    // MEAN absolute error sits well inside the per-pair contract (at
    // sf0.001 the fixture's J spread (~0.06) is under the estimator's
    // ~0.017 SE, so per-pair RANKING is not a guarantee the math makes —
    // the contract is per-pair error, and in aggregate it's much tighter)
    assert(all.map(_.getAs[Double]("jaccard_kmv")).max > 0.0)
    val meanErr = all.map(r => math.abs(r.getAs[Double]("jaccard_kmv")
      - r.getAs[Double]("jaccard_exact"))).sum / all.length
    assert(meanErr < 0.05 / 2, s"mean |est - exact| should be small, got $meanErr")
  }

  test("cms estimates never undercount and are layout-invariant") {
    val toks = graft.io.Tables.documents(spark, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
    val base = Sketches.cmsHeavyHittersOn(toks).collect()
    assert(base.nonEmpty)
    assert(base.forall(_.getAs[Boolean]("never_under")),
      "CMS min-of-rows can only overcount")
    assert(rows(Sketches.cmsHeavyHittersOn(toks.repartition(5))) ===
      base.map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq)
  }

  test("bloom prune never drops a true match, even fully saturated") {
    import spark.implicits._
    // a dim large enough to saturate many words plus facts that all match:
    // every matching fact MUST pass regardless of collision pressure
    val dim = spark.range(0, 3000).select((col("id") * 13L).as("c_custkey"))
    val facts = spark.range(0, 500)
      .select(col("id").as("o_orderkey"), (col("id") * 13L).as("o_custkey"))
    val r = Sketches.bloomPruneOn(dim, facts).collect().head
    assert(r.getAs[Boolean]("no_false_neg"))
    assert(r.getAs[Long]("n_pass") === 500L, "all true matches must pass")
    assert(r.getAs[Long]("n_match") === 500L)

    // and on a disjoint fact set the filter actually prunes
    val miss = spark.range(0, 2000)
      .select(col("id").as("o_orderkey"), (col("id") * 13L + 7L).as("o_custkey"))
    val m = Sketches.bloomPruneOn(dim, miss).collect().head
    assert(m.getAs[Long]("n_match") === 0L)
    assert(m.getAs[Long]("n_pass") < 2000L,
      "a non-matching majority must be mostly pruned")
    assert(m.getAs[Boolean]("no_false_neg"))
  }
}
