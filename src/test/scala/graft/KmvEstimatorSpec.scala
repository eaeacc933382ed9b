package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.functions.{BottomKSketch, KmvValues}

/** Pins the single-source KMV estimator (ADVICE r10): the driver-side
  * scalar [[KmvValues.estimate]] and the batch Column
  * [[KmvValues.estimateColumn]] must agree on every buffer regime —
  * unsaturated, saturated, and the degenerate non-positive k-th hash —
  * so the streaming set-ops reader and the oracle-checked batch queries
  * cannot drift apart. */
class KmvEstimatorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val k = KmvValues.K

  test("scalar and Column estimators agree across all buffer regimes") {
    val buffers: Seq[Array[Long]] = Seq(
      Array.emptyLongArray,                          // empty
      Array.tabulate(40)(i => (i + 1) * 1000L),      // unsaturated → exact
      Array.tabulate(k)(i => (i + 1) * 16777L),      // saturated → estimator
      Array.tabulate(k)(i => i.toLong - (k - 1)),    // k-th hash = 0 → guard
      Array.tabulate(k)(i => i * 3000000000L)        // first hash = 0, k-th > 0
    )
    val spk = spark
    import spk.implicits._
    val df = buffers.map(_.toSeq).toDF("arr")
      .select(KmvValues.estimateColumn(col("arr"), k).as("est"))
    val colEsts = df.collect().map(_.getLong(0)).toSeq
    val scalarEsts = buffers.map(KmvValues.estimate(_))
    assert(colEsts === scalarEsts)
    // the guard regimes are actually exercised (not all on one branch)
    assert(scalarEsts(1) === 40L)
    assert(scalarEsts(3) === k.toLong) // degenerate → exact length
    assert(scalarEsts(2) > k)          // genuine estimator path
  }

  test("BottomK merge applies the min-value rule across the K-boundary trim") {
    // a: hashes 0..K-1 with value 5.0 — its LAST kept hash is K-1
    val a = (0 until k).foldLeft(BottomKSketch.zero)((b, i) =>
      BottomKSketch.reduce(b, (i.toLong, 5.0)))
    // b: a colliding copy of hash K-1 with the SMALLER value 2.0, plus
    // K-1 fillers far above the boundary
    val bInput = ((k - 1).toLong, 2.0) +: (0 until k - 1).map(i =>
      (100000L + i, 9.0))
    val b = bInput.foldLeft(BottomKSketch.zero)((buf, p) =>
      BottomKSketch.reduce(buf, p))
    // the duplicate straddles the trim: merge stops at n == K having taken
    // a's copy first — the fix must still apply min(5.0, 2.0)
    val ab = BottomKSketch.merge(a, b)
    val ba = BottomKSketch.merge(b, a)
    assert(ab.h.toSeq === ba.h.toSeq)
    assert(ab.v.toSeq === ba.v.toSeq)
    val idx = ab.h.indexOf((k - 1).toLong)
    assert(idx >= 0 && ab.v(idx) === 2.0)
  }
}
