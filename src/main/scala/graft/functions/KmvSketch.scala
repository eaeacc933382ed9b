package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch [Beyer et al., SIGMOD
  * 2007] — the DETERMINISTIC approximate-distinct: keep the k smallest
  * DISTINCT hash values seen; if fewer than k exist the count is exact,
  * otherwise D̂ = (k−1)·2³² / h₍ₖ₎ (the unbiased KMV estimator over
  * 32-bit hashes). State is a bounded sorted array (≤ k longs — fixed
  * size, mergeable by sorted-merge-and-trim), so it aggregates partially
  * map-side and shuffles k values per group like any sketch; unlike
  * HLL++ the result depends only on the SET of inputs, never on
  * partitioning or merge order, which is what makes `q_kmv_distinct`
  * hash-check an estimate VALUE against a DuckDB replay while
  * `q_approx_distinct` (HLL) can only hash-check its error CONTRACT
  * (estimate-within-envelope alongside the exact count).
  *
  * The standard error is ~1/√(k−2) (≈13% at k=64); KmvSketchSpec pins
  * the observed error and the partition-independence claim.
  */
object KmvSketch extends Aggregator[Long, Array[Long], Long] {
  val K = 64

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert-distinct, keep sorted, trim to K — O(log k) search + O(k)
    * shift on the bounded buffer. */
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

  override def finish(b: Array[Long]): Long = KmvValues.estimate(b, K)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
