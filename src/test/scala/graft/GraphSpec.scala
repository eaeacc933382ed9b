package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf0001

  private def round9(x: Double): Double = math.floor(x * 1e9 + 0.5) / 1e9

  test("pagerank matches an exact driver recomputation with identical rounding") {
    val out = Graph.pagerank(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

    // naive single-threaded PageRank with the SAME 9dp-round-then-
    // decimal-sum arithmetic the distributed plan pins
    val pairs = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
        concat(lit("s"), col("l_suppkey")).as("s"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1)))
    val edges = pairs.flatMap { case (c, s) => Seq((c, s), (s, c)) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val n = deg.size
    var pr: Map[String, Double] = deg.map { case (k, _) => k -> round9(1.0 / n) }
    for (_ <- 1 to 5) {
      val mass = edges
        .map { case (src, dst) =>
          dst -> BigDecimal(round9(pr(src) / deg(src)))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      pr = mass.map { case (k, m) =>
        k -> round9(0.15 / n + 0.85 * m.toDouble)
      }
    }
    val expected = pr.toSeq
      .map { case (k, p) => (k, deg(k), p) }
      .sortBy { case (k, _, p) => (-p, k) }
      .take(20)
    assert(out.toSeq === expected)

    // structural sanity: mass conserved (teleport keeps the total at 1),
    // rank strictly positive, result ordered
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
    assert(out.forall(_._3 > 0.0))
    assert(out.map(-_._3).toSeq === out.map(-_._3).toSeq.sorted)
    // suppliers sit on one side of every edge, so on this bipartite graph
    // they absorb the bulk of the mass — the top node must be a supplier
    assert(out.head._1.startsWith("s"))
  }
}
