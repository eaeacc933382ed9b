package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types._

/** Codegen'd array kernels for the dedup operators. Spark's higher-order
  * functions run their lambdas interpreted (boxed, one virtual call per
  * element); these expressions compile the three dedup hot loops into
  * primitive Java:
  *
  *   - [[SortedIntersectCount]] — |a ∩ b| of two sorted distinct string
  *     arrays by linear merge (no per-pair hash set);
  *   - [[AffineMinHash]]       — all k minhashes in ONE pass over the
  *     hashed-shingle array (vs k interpreted transforms);
  *   - [[SimHash60]]           — 60-bit simhash in one pass over the
  *     hashed-token array (vs a 60× explode + two shuffles).
  *
  * Results are bit-identical to the composed-built-ins forms the DuckDB
  * oracles mirror (set sizes, mins, and sign counts are order-independent
  * integers — no float reassociation anywhere).
  */
object ArrayExpressions {

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def sortedLongIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def hashedWordNGrams(tokens: Column, n: Int): Column =
    ColumnBridge.column(HashedWordNGrams(ColumnBridge.expression(tokens), n))

  def positionalWordNGrams(tokens: Column, n: Int): Column =
    ColumnBridge.column(PositionalWordNGrams(ColumnBridge.expression(tokens), n))

  def hashedWords60(tokens: Column): Column =
    ColumnBridge.column(HashedWords60(ColumnBridge.expression(tokens)))

  def maxLongMultiplicity(a: Column): Column =
    ColumnBridge.column(MaxLongMultiplicity(ColumnBridge.expression(a)))

  /** Skew-hardened all-pairs join inside blocks. Oversized blocks are the
    * dedup failure mode at scale (one boilerplate cluster → one straggler
    * task); salting bounds per-task work: the LEFT side gets salt
    * h(id) mod k, the RIGHT side is replicated to every salt, so the result
    * is EXACTLY the unsalted pair set but split across k tasks per block.
    * Cost: k× replication of one side — the standard trade.
    */
  def saltedBlockPairJoin(
      df: org.apache.spark.sql.DataFrame,
      blockCols: Seq[String],
      idCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    def side(tag: String, salted: Boolean) = {
      val renamed = df.columns.foldLeft(df) { (d, c) =>
        if (blockCols.contains(c)) d else d.withColumnRenamed(c, s"${tag}_$c")
      }
      if (salted) renamed.withColumn("salt", pmod(hash(col(s"${tag}_$idCol")), lit(k)))
      else renamed.withColumn("salt", explode(sequence(lit(0), lit(k - 1))))
    }
    side("a", salted = true)
      .join(side("b", salted = false), blockCols :+ "salt")
      .filter(col(s"a_$idCol") < col(s"b_$idCol"))
      .drop("salt")
  }

  def affineMinHash(hashes: Column, as: Seq[Long], bs: Seq[Long], prime: Long): Column =
    ColumnBridge.column(AffineMinHash(ColumnBridge.expression(hashes), as, bs, prime))

  def simHash60(hashes: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(hashes)))
}

/** Sorted distinct ARRAY<LONG> of md5-derived 32-bit hashes of word
  * n-grams, built in ONE pass from the token array. Fuses what was
  * sequence → transform(concat_ws) → array_distinct → sort_array →
  * transform(md5/conv) — five interpreted array passes materializing
  * intermediate string arrays — into a single per-row kernel. The hash is
  * identical to the SQL oracle's
  * `CAST('0x' || substring(md5(gram), 1, 8) AS BIGINT)`. */
case class HashedWordNGrams(child: Expression, n: Int)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val count = toks.numElements() - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val md = HashedWordNGrams.digest.get()
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedup of the sorted array
    var w = 0
    var r = 0
    while (r < count) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWordNGrams =
    copy(child = newChild)
}

object HashedWordNGrams {
  /** MessageDigest is not thread-safe; one per task thread. */
  private[functions] val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** Position-preserving variant of [[HashedWordNGrams]]: element i is the
  * hash of the n-gram STARTING at token i (no sort, no dedup), so
  * `posexplode` recovers (offset, window-hash) pairs. This is the kernel
  * exact-substring dedup needs — a duplicated ≥n-token substring is
  * exactly a run of duplicated n-token windows, and runs are only visible
  * when offsets survive. Hash is identical to [[HashedWordNGrams]]'s
  * (`CAST('0x' || substring(md5(gram), 1, 8) AS BIGINT)` in the oracle). */
case class PositionalWordNGrams(child: Expression, n: Int)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val count = toks.numElements() - n + 1
    if (count <= 0) return new GenericArrayData(Array.empty[Long])
    val md = HashedWordNGrams.digest.get()
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(' '.toByte)
        md.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PositionalWordNGrams =
    copy(child = newChild)
}

/** Order- and multiplicity-preserving md5 token hashes: element i is the
  * first 60 bits of md5(token_i) — `CAST('0x' || substring(md5(w), 1, 15)
  * AS BIGINT)` in the SQL oracle. Feeds [[SimHash60]], which needs the full
  * token MULTISET (unlike the deduped [[HashedWordNGrams]]). */
case class HashedWords60(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val md = HashedWordNGrams.digest.get()
    val out = new Array[Long](toks.numElements())
    var i = 0
    while (i < out.length) {
      md.reset()
      md.update(toks.getUTF8String(i).getBytes)
      val d = md.digest()
      var v = 0L
      var b = 0
      while (b < 8) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = v >>> 4 // first 15 hex chars = high 60 bits of the 8-byte prefix
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HashedWords60 =
    copy(child = newChild)
}

/** Max multiplicity of any value in a long array (the mode's count):
  * sort a copy, return the longest equal run — O(n log n) and one pass,
  * vs the O(u·n) nested-lambda form the DuckDB oracle mirrors
  * (`list_max(list_transform(list_distinct(hw), v -> len(list_filter(hw,
  * x -> x = v))))`). Feeds the Gopher-style top-word-fraction repetition
  * metric over [[HashedWords60]] token hashes. Empty input → 0. */
case class MaxLongMultiplicity(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData].toLongArray()
    if (a.isEmpty) return 0
    java.util.Arrays.sort(a)
    var best = 1
    var run = 1
    var i = 1
    while (i < a.length) {
      if (a(i) == a(i - 1)) run += 1 else run = 1
      if (run > best) best = run
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): MaxLongMultiplicity =
    copy(child = newChild)
}

/** |a ∩ b| where both inputs are SORTED arrays of distinct longs. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    while (i < x.numElements() && j < y.numElements()) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { n += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $x.numElements() && $j < $y.numElements()) {
         |  long $xv = $x.getLong($i); long $yv = $y.getLong($j);
         |  if ($xv == $yv) { $n++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** |a ∩ b| where both inputs are SORTED arrays of distinct strings. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var n = 0
    while (i < x.numElements() && j < y.numElements()) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |while ($i < $x.numElements() && $j < $y.numElements()) {
         |  int $c = $x.getUTF8String($i).compareTo($y.getUTF8String($j));
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** For each seed k: min over the hash array of (a_k·h + b_k) mod prime.
  * Input ARRAY<LONG>, output ARRAY<LONG> of as.length minhashes. */
case class AffineMinHash(child: Expression, as: Seq[Long], bs: Seq[Long], prime: Long)
    extends UnaryExpression {

  require(as.length == bs.length)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData]
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < h.numElements()) {
      val v = h.getLong(i)
      var s = 0
      while (s < k) {
        val m = (as(s) * v + bs(s)) % prime
        if (m < mins(s)) mins(s) = m
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val k = as.length
      val aArr = ctx.addReferenceObj("minhashA", as.toArray, "long[]")
      val bArr = ctx.addReferenceObj("minhashB", bs.toArray, "long[]")
      val mins = ctx.freshName("mins"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val v = ctx.freshName("v"); val m = ctx.freshName("m")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $h.numElements(); $i++) {
         |  long $v = $h.getLong($i);
         |  for (int $s = 0; $s < $k; $s++) {
         |    long $m = ($aArr[$s] * $v + $bArr[$s]) % ${prime}L;
         |    if ($m < $mins[$s]) $mins[$s] = $m;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AffineMinHash =
    copy(child = newChild)
}

/** 60-bit simhash over an ARRAY<LONG> of token hashes: bit i of the result
  * is set iff more tokens have bit i set than clear (ties → clear), the
  * standard charikar sign-of-sum. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val h = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](60)
    var i = 0
    while (i < h.numElements()) {
      val v = h.getLong(i)
      var b = 0
      while (b < 60) {
        if (((v >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val counts = ctx.freshName("counts"); val i = ctx.freshName("i")
      val v = ctx.freshName("v"); val b = ctx.freshName("b")
      val out = ctx.freshName("out")
      s"""
         |int[] $counts = new int[60];
         |for (int $i = 0; $i < $h.numElements(); $i++) {
         |  long $v = $h.getLong($i);
         |  for (int $b = 0; $b < 60; $b++) {
         |    if ((($v >> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 60; $b++) {
         |  if ($counts[$b] > 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
