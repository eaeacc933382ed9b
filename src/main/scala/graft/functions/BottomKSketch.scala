package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k-by-hash VALUE sample — the per-group form of the sampling
  * rule behind `q_quantile_sketch` (keep the rows whose row-key hashes
  * are the k smallest: a uniform sample that depends only on the input
  * SET, Cohen & Kaplan 2007), packaged as a mergeable [[Aggregator]] so
  * it runs under `groupBy` with bounded state: ≤ k (hash, value) pairs
  * per group, partial-aggregated map-side, merged by sorted-merge-and-
  * trim exactly like [[KmvSketch]] (same buffer discipline, carrying a
  * value alongside each hash).
  *
  * `finish` returns the sample VALUES sorted ascending — order
  * statistics of that array are type-1 quantile estimates, and because
  * selection is hash-determined the whole output is reproducible in any
  * engine (the DuckDB oracle replays it as a per-group
  * `row_number() OVER (PARTITION BY g ORDER BY hash) <= k`). Per-group
  * quantiles with O(k) state is the 100 TB shape: an exact per-group
  * percentile needs every group's values sorted somewhere, this needs
  * k rows per group on the shuffle regardless of group size.
  */
/** [[BottomKSketch]]'s buffer: parallel arrays sorted by hash (the
  * selection key). Top-level so the Aggregator's extends clause can name
  * it without a cyclic reference. */
case class BottomKBuf(h: Array[Long], v: Array[Double])

object BottomKSketch extends Aggregator[(Long, Double), BottomKBuf, Array[Double]] {
  val K = 256
  type Buf = BottomKBuf
  private def Buf(h: Array[Long], v: Array[Double]) = BottomKBuf(h, v)

  override def zero: Buf = Buf(Array.emptyLongArray, Array.emptyDoubleArray)

  override def reduce(b: Buf, in: (Long, Double)): Buf = {
    val (hash, value) = in
    val pos = java.util.Arrays.binarySearch(b.h, hash)
    if (pos >= 0) {
      // duplicate hash (a genuine 64-bit collision of row keys): keep the
      // SMALLER value — an order-independent tiebreak, so the sketch stays
      // deterministic even on a colliding input
      if (value >= b.v(pos)) b
      else { val v = java.util.Arrays.copyOf(b.v, b.v.length); v(pos) = value; Buf(b.h, v) }
    } else {
      val ins = -pos - 1
      if (ins >= K) b
      else {
        val n = math.min(b.h.length + 1, K)
        val h = new Array[Long](n); val v = new Array[Double](n)
        System.arraycopy(b.h, 0, h, 0, ins)
        System.arraycopy(b.v, 0, v, 0, ins)
        h(ins) = hash; v(ins) = value
        System.arraycopy(b.h, ins, h, ins + 1, n - ins - 1)
        System.arraycopy(b.v, ins, v, ins + 1, n - ins - 1)
        Buf(h, v)
      }
    }
  }

  override def merge(a: Buf, b: Buf): Buf = {
    val cap = math.min(a.h.length + b.h.length, K)
    val h = new Array[Long](cap); val v = new Array[Double](cap)
    var i = 0; var j = 0; var n = 0
    while (n < cap && (i < a.h.length || j < b.h.length)) {
      val takeA =
        if (i >= a.h.length) false
        else if (j >= b.h.length) true
        else a.h(i) <= b.h(j)
      val (th, tv) =
        if (takeA) { i += 1; (a.h(i - 1), a.v(i - 1)) }
        else { j += 1; (b.h(j - 1), b.v(j - 1)) }
      if (n == 0 || h(n - 1) != th) { h(n) = th; v(n) = tv; n += 1 }
      else v(n - 1) = math.min(v(n - 1), tv) // collision: same min-value rule
    }
    // K-boundary collision (ADVICE r10): when the trim stops the loop at
    // n == cap, a duplicate of the LAST kept hash may still sit unconsumed
    // at the head of either input (inputs are sorted and internally
    // distinct, so it can only be at position i / j) — apply the same
    // min-value rule there, or the merge result depends on which side the
    // duplicate arrived from.
    if (n > 0) {
      if (i < a.h.length && a.h(i) == h(n - 1)) v(n - 1) = math.min(v(n - 1), a.v(i))
      if (j < b.h.length && b.h(j) == h(n - 1)) v(n - 1) = math.min(v(n - 1), b.v(j))
    }
    if (n == cap) Buf(h, v)
    else Buf(java.util.Arrays.copyOf(h, n), java.util.Arrays.copyOf(v, n))
  }

  override def finish(b: Buf): Array[Double] = {
    val out = java.util.Arrays.copyOf(b.v, b.v.length)
    java.util.Arrays.sort(out)
    out
  }

  override def bufferEncoder: Encoder[Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
