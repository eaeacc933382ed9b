package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.enrich.Retry
import graft.enrich.Retry.{BadBatch, RateLimited}
import graft.operators.Dedup

class DedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("exact dedup finds exactly the planted re-crawl copies") {
    val out = Dedup.dedupExact(spark, SparkTestSession.Sf0001).collect()
    // every 4th doc (0,4,...,496) is duplicated once → 125 groups of 2
    assert(out.length === 125)
    assert(out.forall(_.getLong(1) === 2L))
    // kept id is the original (min), never the +100000 copy
    assert(out.forall(_.getLong(2) < 100000L))
  }

  test("minhash LSH recovers exact duplicates with jaccard 1.0") {
    val out = Dedup.dedupMinhashLsh(spark, SparkTestSession.Sf0001).collect()
    // (orig, orig+100000) re-crawl pairs; docs divisible by 20 ALSO pair
    // their +100000 and +200000 copies at the same id distance, so filter
    // to pairs whose left side is an original
    val exactPairs = out.filter(r =>
      r.getLong(0) < 100000L && r.getLong(1) - r.getLong(0) === 100000L)
    assert(exactPairs.length === 125)
    assert(exactPairs.forall(_.getDouble(2) === 1.0))
    // near-dup tails rank high but below 1.0
    val nearPairs = out.filter(r =>
      r.getLong(0) < 100000L && r.getLong(1) - r.getLong(0) === 200000L)
    assert(nearPairs.nonEmpty)
    assert(nearPairs.forall(r => r.getDouble(2) >= 0.5 && r.getDouble(2) < 1.0))
  }

  test("simhash: exact duplicates at hamming 0") {
    val out = Dedup.dedupSimhash(spark, SparkTestSession.Sf0001).collect()
    val exact = out.filter(r =>
      r.getLong(0) < 100000L && r.getLong(1) - r.getLong(0) === 100000L)
    assert(exact.length === 125)
    assert(exact.forall(_.getInt(2) === 0))
  }

  test("ngram jaccard (banded candidates) recovers planted exact + near dups") {
    val out = Dedup.dedupNgramJaccard(spark, SparkTestSession.Sf0001).collect()
    val exactPairs = out.filter(r =>
      r.getLong(0) < 100000L && r.getLong(1) - r.getLong(0) === 100000L)
    assert(exactPairs.length === 125)
    assert(exactPairs.forall(_.getDouble(2) === 1.0))
    // near-dup tail (3 appended tokens) keeps bigram jaccard high enough
    // that all 4 bands of its minhash signature still collide
    val nearPairs = out.filter(r =>
      r.getLong(0) < 100000L && r.getLong(1) - r.getLong(0) === 200000L)
    assert(nearPairs.length === 100)
    assert(nearPairs.forall(r => r.getDouble(2) >= 0.3 && r.getDouble(2) < 1.0))
  }

  test("embedding cosine near-dup (hyperplane buckets) recovers perturbed vectors") {
    val out = Dedup.dedupEmbeddingCosine(spark, SparkTestSession.Sf0001).collect()
    // every 10th vector has a tiny-perturbation copy at +100000; the
    // perturbation moves each projection by ≪ plane-margin for almost all
    // vectors, so the pair shares a bucket and verifies at cos ≥ 0.99
    val planted = out.filter(r => r.getLong(1) - r.getLong(0) === 100000L)
    assert(planted.nonEmpty)
    assert(planted.forall(_.getDouble(2) >= 0.99))
  }

  test("substring dedup: copies fully duplicated, near-dup tails partial") {
    val out = Dedup.dedupSubstring(spark, SparkTestSession.Sf0001).collect()
    // columns: doc_id, n_windows, n_dup_windows, dup_frac, first/last pos
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
    val copies = out.filter(r =>
      r.getLong(0) >= 100000L && r.getLong(0) < 200000L)
    assert(copies.length === 125)
    assert(copies.forall(_.getDouble(3) === 1.0))
    // a near-dup's windows inside the original text re-occur there, so the
    // duplicated run starts at offset 1; the windows spanning the appended
    // tail are unique, so the fraction stays below 1 — the per-span
    // granularity doc-level hashing can't produce
    val tails = out.filter(_.getLong(0) >= 200000L)
    assert(tails.length === 100)
    assert(tails.forall(r =>
      r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0 && r.getLong(4) === 1L))
    // every original of a planted copy is itself fully duplicated
    val fullDocs = out.filter(_.getDouble(3) === 1.0).map(_.getLong(0)).toSet
    assert((0L until 500L).filter(i => i % 4 == 0 || i % 5 == 0)
      .forall(fullDocs.contains))
    graft.tools.CacheRegistry.releaseShared()
  }

  test("salted skew pair join equals the unsalted block join exactly") {
    import org.apache.spark.sql.functions._
    import graft.functions.ArrayExpressions
    val grams = Dedup.corpus(spark, SparkTestSession.Sf0001).select(
      col("doc_id"), col("lang"),
      ArrayExpressions.hashedWordNGrams(split(lower(col("text")), "\\s+"), 2).as("grams"))
    val salted = ArrayExpressions.saltedBlockPairJoin(grams, Seq("lang"), "doc_id", 8)
      .select(col("a_doc_id"), col("b_doc_id"))
    val x = grams.select(col("lang"), col("doc_id").as("a_doc_id"))
    val y = grams.select(col("lang"), col("doc_id").as("b_doc_id"))
    val plain = x.join(y, Seq("lang")).filter(col("a_doc_id") < col("b_doc_id"))
      .select(col("a_doc_id"), col("b_doc_id"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("incremental dedup: every planted re-crawl doc resolves against the base") {
    val out = Dedup.dedupIncremental(spark, SparkTestSession.Sf0001).collect()
    val byId = out.map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getString(3))).toMap
    // the delta batch is exactly the fixture's synthetic re-crawl: 125
    // exact copies (+100000) and 100 near-dups (+200000)
    assert(out.length === 225)
    // every exact copy matches its base original at jaccard 1.0
    (0L until 500L by 4).foreach { d =>
      val (m, j, v) = byId(d + 100000L)
      assert(m === Some(d), s"delta ${d + 100000} should match base $d")
      assert(j === Some(1.0))
      assert(v === "dup_of_base")
    }
    // near-dups (3 appended tokens): banding is probabilistic (collision
    // prob ≈ 1−(1−s⁴)⁴ ≈ 0.99 at their jaccard), so a FEW may miss
    // candidate generation — same contract as the full dedup_minhash_lsh.
    // Those that match must resolve to their base original (min-id
    // tiebreak beats the equal-jaccard in-batch twin), below 1.0 but
    // above the 0.5 verify threshold; misses read as 'new'.
    val nearVerdicts = (0L until 500L by 5).map { d =>
      val (m, j, v) = byId(d + 200000L)
      if (v == "dup_of_base") {
        assert(m === Some(d), s"delta ${d + 200000} should match base $d")
        assert(j.exists(x => x >= 0.5 && x < 1.0))
      } else assert(v === "new", s"unexpected verdict $v for ${d + 200000}")
      v
    }
    assert(nearVerdicts.count(_ == "dup_of_base") >= 90,
      "banding should catch the overwhelming majority of near-dups")
  }

  test("incremental dedup verdicts agree with the full minhash pair set") {
    // every (base, delta) pair the FULL dedup finds must also be found by
    // the incremental path (same bands, same threshold) — the incremental
    // query is a restriction of the pair set, never a weaker one
    val full = Dedup.dedupMinhashLsh(spark, SparkTestSession.Sf0001).collect()
      .filter(r => r.getLong(0) < Dedup.DeltaIdFloor && r.getLong(1) >= Dedup.DeltaIdFloor)
      .map(r => (r.getLong(1), r.getLong(0))).toSet
    val inc = Dedup.dedupIncremental(spark, SparkTestSession.Sf0001).collect()
      .filter(_.getString(3) == "dup_of_base")
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // inc keeps only the BEST match per delta doc; it must be one of full's
    assert(inc.subsetOf(full))
    // and every delta doc with any base pair in full got a verdict
    assert(full.map(_._1).subsetOf(inc.map(_._1)))
  }

  test("429 retry: succeeds after rate-limited attempts without sleeping") {
    var calls = 0
    var slept = 0L
    val r = Retry.withRateLimitRetry(maxRetries = 5, backoffMs = 30000L,
      sleep = ms => slept += ms) { () =>
      calls += 1
      if (calls < 3) throw RateLimited() else "ok"
    }
    assert(r === "ok")
    assert(calls === 3)
    assert(slept === 60000L)
  }

  test("semantic dedup matches a naive recompute and drops one side of each planted pair") {
    val out = Dedup.dedupSemantic(spark, SparkTestSession.Sf0001).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap

    // naive recompute on the SAME assignment inputs (training itself is
    // pinned by IvfKMeansSpec): collect (id, v, cluster), add centroid cos,
    // then per-cluster pairwise cosines at tau=0.95
    import org.apache.spark.sql.functions._
    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val cents = graft.operators.IvfKMeans.trainCentroids(e)
    val all = graft.operators.IvfKMeans
      .assign(Dedup.withPerturbed(e, 100000L), cents)
      .collect()
      .map(r => (r.getLong(0),
        r.getSeq[Double](1).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val cmap = cents.toMap
    val withC = all.map { case (id, v, cl) => (id, v, cl, cos(v, cmap(cl))) }
    val byCluster = withC.groupBy(_._3)
    def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000.0
    assert(out.size === all.length)
    withC.foreach { case (id, v, cl, cc) =>
      val peers = byCluster(cl).filter(_._1 != id)
      val close = peers.filter(p => cos(v, p._2) >= 0.95)
      val nPrior = close.count(p => p._4 < cc || (p._4 == cc && p._1 < id))
      val (ocl, occ, onClose, oKeep) = out(id)
      assert(ocl === cl, s"cluster vec $id")
      assert(occ === r4(cc), s"centroid_cos vec $id")
      assert(onClose === close.length.toLong, s"n_close vec $id")
      assert(oKeep === (if (nPrior == 0) 1L else 0L), s"keep vec $id")
    }
    // planted ground truth: each same-cluster (orig, perturbed) pair loses
    // exactly one member when isolated (n_close == 1 on both sides)
    val planted = withC.filter(_._1 >= 100000L).map { case (pid, _, pcl, _) =>
      (pid - 100000L, pid, pcl)
    }
    assert(planted.nonEmpty)
    val sameCluster = planted.filter { case (a, b, pcl) =>
      withC.find(_._1 == a).exists(_._3 == pcl)
    }
    // the perturbation is small: most pairs co-assign
    assert(sameCluster.length * 2 >= planted.length,
      s"only ${sameCluster.length}/${planted.length} pairs co-assigned")
    sameCluster.foreach { case (a, b, _) =>
      if (out(a)._3 == 1L && out(b)._3 == 1L) {
        assert(out(a)._4 + out(b)._4 === 1L, s"pair ($a,$b) keep flags")
      }
    }
    // dropped rows exist and every drop has a close witness
    assert(out.values.exists(_._4 == 0L))
    out.foreach { case (id, (_, _, nc, k)) => if (k == 0L) assert(nc > 0L) }
  }

  test("semantic corpus-clean keeps exactly the keep=1 rows with their payload") {
    val flags = Dedup.dedupSemantic(spark, SparkTestSession.Sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    val out = Dedup.dedupSemanticClean(spark, SparkTestSession.Sf0001).collect()
    val outIds = out.map(_.getLong(0)).toSet
    assert(outIds === flags.filter(_._2 == 1L).keySet)
    assert(out.length < flags.size, "nothing was pruned")
    // payload witness: norms match a direct recompute
    import org.apache.spark.sql.functions._
    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"),
        graft.functions.VectorFunctions.asDouble(col("embedding")).as("v"))
    val norms = Dedup.withPerturbed(e, 100000L).collect()
      .map { r =>
        val v = r.getSeq[Double](1)
        r.getLong(0) ->
          math.floor(math.sqrt(v.map(x => x * x).sum) * 10000 + 0.5) / 10000.0
      }.toMap
    out.foreach(r => assert(r.getDouble(1) === norms(r.getLong(0)),
      s"v_norm vec ${r.getLong(0)}"))
  }

  test("400 bisect isolates the poison element and keeps the rest") {
    val poison = 13
    def call(batch: Seq[Int]): Seq[Int] =
      if (batch.contains(poison)) throw BadBatch() else batch.map(_ * 2)
    val out = Retry.withBisect((1 to 20).toSeq, call,
      (i: Int) => if (i == poison) None else Some(i * 2))
    assert(out === (1 to 20).filter(_ != poison).map(_ * 2))
  }
}
