package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-3 ANN coverage: the production-usable approximate paths
  * (multi-table LSH, IVF nprobe) and the shuffle-discipline fix to the
  * multi-probe dedup. */
class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def recallByMethod: Map[String, Double] = {
    val rows = graft.operators.AnnRecall.annRecall(spark, SparkTestSession.Sf0001).collect()
    rows.groupBy(_.getString(0)).map { case (m, rs) =>
      m -> rs.map(_.getDouble(3)).sum / rs.length
    }
  }

  test("ivf nprobe=2 clears the production recall bar and beats single-cell") {
    val r = recallByMethod
    assert(r("ivf_nprobe") >= 0.8, s"ivf_nprobe recall ${r("ivf_nprobe")}")
    assert(r("ivf_nprobe") >= r("ivf_kmeans"))
  }

  test("multi-table LSH recalls far above single-table and multi-probe") {
    val r = recallByMethod
    // Near-uniform fixture vectors: LSH recall tracks scan fraction, so the
    // honest claim is ordering + a floor, not a point value (SCALING.md).
    assert(r("lsh_multitable") > r("lsh_multiprobe"))
    assert(r("lsh_multitable") > r.getOrElse("lsh", 0.0))
    assert(r("lsh_multitable") >= 0.4)
  }

  test("approximate results are true subsets of each query's scored space") {
    val out = graft.operators.IvfKMeans.kmeansNprobeSearch(spark, SparkTestSession.Sf0001).collect()
    assert(out.length === 15) // 5 queries × top-3
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.values.foreach { rs =>
      val ranks = rs.map(_.getLong(2)).sorted
      assert(ranks.toSeq === Seq(1L, 2L, 3L))
      val cosines = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("multi-table LSH returns full ranked top-3 per query") {
    val out = graft.operators.Similarity.annLshMultitable(spark, SparkTestSession.Sf0001).collect()
    assert(out.length === 15)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length === 15)
  }

  test("multi-probe dedup exchange carries id pairs only, not vectors (round-3 fix)") {
    val plan = graft.operators.Similarity.annLshMultiprobe(spark, SparkTestSession.Sf0001)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    val vectorCarrying = exchanges.filter(l => l.contains("nv#") || l.contains("qv#"))
    assert(vectorCarrying.isEmpty,
      s"exchange still carries vector columns:\n${vectorCarrying.mkString("\n")}")
  }
}
