package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfKMeans, Similarity}

class IvfKMeansSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("k-means cells partition the corpus and are non-degenerate") {
    val cells = IvfKMeans.kmeansCells(spark, SparkTestSession.Sf0001).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(cells.values.sum === 500L)
    assert(cells.size >= 2, s"training collapsed to ${cells.size} cell(s)")
  }

  test("IVF search recall vs brute force is reasonable for same-cell queries") {
    val ivf = IvfKMeans.kmeansSearch(spark, SparkTestSession.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.annBruteForce(spark, SparkTestSession.Sf0001).collect()
      .filter(_.getLong(2) <= 3) // top-3 of the brute-force top-5
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    // cells scan ~1/8 of the corpus; true neighbors are usually same-cell
    assert(recall >= 0.4, s"recall $recall too low: ivf=$ivf brute=$brute")
  }
}
