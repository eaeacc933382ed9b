package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bottom-k distinct-HASH sketch that returns the kept hashes themselves
  * (a Theta-sketch sample in the sense of Dasgupta et al. 2016, built on
  * the KMV selection rule of Beyer et al. 2007) — the SET-ALGEBRA form of
  * [[KmvSketch]]: where KmvSketch finishes to a distinct-count estimate,
  * this finishes to the sorted hash array, so downstream code can compose
  * sketches — union = sorted-distinct-merge-and-trim, intersection via
  * the inclusion ratio inside the union sketch — and estimate |A∪B|,
  * |A∩B|, and Jaccard from two fixed-size summaries without ever joining
  * the underlying key sets (`q_kmv_set_ops`).
  *
  * k=256 here (vs KmvSketch's 64): set-operation estimates compound the
  * union estimator's error with the inclusion-ratio's binomial error, so
  * the sketch buys the extra precision (SE ≈ 1/√(k−2) ≈ 6%; the fixture
  * calibration across all three SFs observed ≤ 0.108 relative error on
  * every estimate, which is what the query's ε=0.15 contract pins).
  * State stays a bounded sorted array — ≤ k longs, partial-aggregated
  * map-side, mergeable in any order — and the result depends only on the
  * input SET, so the DuckDB oracle replays it exactly and the full hash
  * gate covers the estimates.
  */
object KmvValues extends Aggregator[Long, Array[Long], Array[Long]] {
  val K = 256

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert-distinct, keep sorted, trim to K — O(log k) search + O(k)
    * shift on the bounded buffer (same discipline as [[KmvSketch]]). */
  override def reduce(b: Array[Long], h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (ins >= K) b // larger than everything we keep
      else {
        val n = math.min(b.length + 1, K)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted distinct merge, trimmed to K
    val out = new Array[Long](math.min(a.length + b.length, K))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { j += 1; b(j - 1) }
        else if (j >= b.length) { i += 1; a(i - 1) }
        else if (a(i) < b(j)) { i += 1; a(i - 1) }
        else if (a(i) > b(j)) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) }
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(b: Array[Long]): Array[Long] = b

  /** 2³² — the hash space of the 32-bit md5-prefix hashes every KMV
    * consumer feeds these sketches. */
  val HashSpace: Double = 4294967296.0

  /** THE scalar KMV estimator (single source — ADVICE r10 flagged the
    * drift risk of per-site copies): exact when the sketch is
    * unsaturated or its k-th hash is non-positive (degenerate input —
    * the estimator would divide by ≤0), else the unbiased
    * (k−1)·2³²/h₍ₖ₎ of Beyer et al. 2007. Used by the streaming
    * set-ops reader; [[estimateColumn]] is its Column twin. */
  def estimate(arr: Array[Long], k: Int = K): Long =
    if (arr.length < k || arr(k - 1) <= 0L) arr.length.toLong
    else math.floor((k - 1) * HashSpace / arr(k - 1) + 0.5).toLong

  /** Column twin of [[estimate]] — same guard, same constants, same
    * rounding, so the batch queries (`q_kmv_set_ops` et al.) and the
    * driver-side scalar can only change together. KmvEstimatorSpec pins
    * the two equal over saturated / unsaturated / zero-hash buffers. */
  def estimateColumn(arr: Column, k: Int): Column =
    when(size(arr) < k || element_at(arr, k) <= 0L, size(arr).cast("long"))
      .otherwise(floor(lit((k - 1) * HashSpace) / element_at(arr, k) + lit(0.5))
        .cast("long"))

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
