package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** Duplicate-cluster resolution (large-star/small-star connected
  * components). The membership/keep semantics on the fixture corpus are
  * hash-checked by the DuckDB oracle; these tests pin the graph algorithm
  * itself on shapes the fixture doesn't produce. */
class ComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def labels(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components
      .connectedComponents(pairs.toDF("a_id", "b_id"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  /** Brute-force union-find for cross-checking. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(x => x -> find(x)).filter(kv => kv._1 != kv._2).toMap
  }

  test("a path graph resolves transitively to the chain minimum") {
    // 1-2-3-4-5 as consecutive pairs: one component rooted at 1
    val got = labels(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got === Map(2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint families stay disjoint; pair order and direction don't matter") {
    val got = labels(Seq((9L, 7L), (7L, 8L), (20L, 21L), (31L, 30L)))
    assert(got === Map(8L -> 7L, 9L -> 7L, 21L -> 20L, 31L -> 30L))
  }

  test("a 64-node path converges within the round budget") {
    // worst diameter shape for label propagation; the alternating
    // algorithm contracts it in O(log n) rounds or throws
    val chain = (0L until 63L).map(i => (i, i + 1))
    val got = labels(chain)
    assert(got === (1L to 63L).map(_ -> 0L).toMap)
  }

  test("matches brute-force union-find on an adversarial random graph") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(p => p._1 != p._2)
    assert(labels(pairs) === unionFind(pairs))
  }

  test("self-pairs and duplicate pairs are ignored, not components") {
    val got = labels(Seq((5L, 5L), (2L, 6L), (6L, 2L), (2L, 6L)))
    assert(got === Map(6L -> 2L))
  }

  test("membership keeps exactly one doc per family on the fixture") {
    val rows = Components.dedupComponents(spark, SparkTestSession.Sf0001).collect()
    val byComponent = rows.groupBy(_.getLong(1))
    // every family keeps exactly its minimum member
    byComponent.foreach { case (comp, members) =>
      val kept = members.filter(_.getBoolean(3))
      assert(kept.length === 1, s"component $comp")
      assert(kept.head.getLong(0) === comp)
      assert(members.map(_.getLong(0)).min === comp)
      // csize is consistent across the family
      assert(members.forall(_.getLong(2) === members.length.toLong))
    }
    // the fixture chains exact copy (+100000) and near-dup (+200000) of
    // every 20th doc through the SAME original, so each such doc's family
    // CONTAINS its manufactured triple — cluster resolution, not pair
    // mirroring. (Superset, not equality: the corpus also has organic
    // near-dup families among the originals that chain through the
    // manufactured copies into larger, off-grid families.)
    val triples = byComponent.filter(_._2.length >= 3)
    assert(triples.nonEmpty)
    val labelOf = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val grid = labelOf.keys.filter(d => d < 100000L && d % 20 == 0).toSeq
    assert(grid.nonEmpty)
    grid.foreach { d =>
      val family = byComponent(labelOf(d)).map(_.getLong(0)).toSet
      assert(Set(d, d + 100000L, d + 200000L).subsetOf(family),
        s"doc $d: family $family lacks its manufactured triple")
    }
  }

  test("pipeline report funnel is chained, monotone, and consistent with the stages") {
    val rows = graft.operators.Components
      .dedupPipelineReport(spark, SparkTestSession.Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.map(t => (t._1, t._2)).toSeq === Seq((1L, "raw"), (2L, "exact"), (3L, "near_cc")))
    // chained: each stage's input is the previous stage's output
    assert(rows(0)._3 === rows(0)._4)
    assert(rows(1)._3 === rows(0)._4)
    assert(rows(2)._3 === rows(1)._4)
    // monotone shrinking (exact dups are jaccard-1, so CC subsumes exact)
    assert(rows(1)._4 < rows(1)._3 && rows(2)._4 < rows(2)._3)
    // consistent with the stage operators themselves
    val nComponents = graft.operators.Components
      .membership(spark, SparkTestSession.Sf0001)
      .select("component").distinct().count()
    assert(rows(2)._4 === nComponents)
    assert(rows(0)._6 === 0.0)
    // the KMV estimate rides every stage within its ~1/sqrt(K-2) error
    // band (13% at K=64; allow 3x for the fixture's small counts)
    rows.foreach { case (_, stage, _, exact, kmvEst, _) =>
      assert(math.abs(kmvEst - exact).toDouble / exact <= 0.40,
        s"stage $stage: KMV estimate $kmvEst vs exact $exact")
    }
    graft.tools.CacheRegistry.releaseShared()
  }

  test("keep-best survivor: quality argmax with min-id tiebreak") {
    val out = Components.dedupKeepBest(spark, SparkTestSession.Sf0001).collect()
    // one row per multi-member family; the fixture plants ~200 of them
    assert(out.length >= 190)
    assert(out.forall(_.getLong(1) >= 2L))
    // policy_differs is exactly "quality argmax != min-id default"
    assert(out.forall(r => r.getBoolean(4) === (r.getLong(2) != r.getLong(0))))
    // exact-copy pairs tie on quality (identical text) so min id survives;
    // near-dup tails shift the score, flipping some argmaxes — the fixture
    // must exercise BOTH outcomes or the policy is vacuous
    val differs = out.count(_.getBoolean(4))
    assert(differs > 0 && differs < out.length)
    assert(out.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // every-20th docs chain copy + near-dup into 3-member families
    assert(out.count(_.getLong(1) === 3L) >= 25)
    graft.tools.CacheRegistry.releaseShared()
  }
}
