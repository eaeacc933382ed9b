package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Nearest-centroid assignment — the k-means/IVF hot loop as ONE codegen'd
  * kernel: argmin over k centroids of ‖v−c_k‖², ties → lowest cluster id.
  *
  * The composed-from-built-ins form (k `aggregate(zip_with(...))` folds +
  * `array_min` over (d2, id) structs) is semantically identical but
  * generates ~k·dim expression nodes: whole-stage codegen emits a huge
  * method (slow first-call JIT) and each element trip goes through lambda
  * plumbing. This kernel is a tight primitive loop over `ArrayData
  * .getDouble` with the centroid matrix attached as a reference object.
  *
  * Float parity with the DuckDB oracle (which replays training as
  * `(list_dot_product(v,v) − 2·list_dot_product(v,c)) + list_dot_product(c,c)`):
  *   - v·v and v·c accumulate left-to-right, one product per step — the
  *     same IEEE sequence as the SQL fold;
  *   - ‖c‖² is precomputed ONCE per centroid on the driver with the same
  *     left-to-right order ([[NearestCentroid.normSq]]);
  *   - d2 evaluates as (vv − 2·vc) + cc, matching the SQL operator order;
  *   - comparison is strict `<` while scanning cluster ids in ascending
  *     order, so equal distances keep the lowest id — the window's
  *     `ORDER BY d2, cluster` tie-break.
  *
  * Cluster ids are carried explicitly (not 0..k−1) because Lloyd
  * iterations can empty a cell, dropping its id from the update.
  */
case class NearestCentroid(child: Expression, ids: Seq[Int], centroids: Seq[Seq[Double]])
    extends UnaryExpression {

  require(ids.length == centroids.length && ids.nonEmpty)
  require(ids == ids.sorted, "cluster ids must be ascending for tie-breaking")

  override def dataType: DataType = IntegerType

  private lazy val cents: Array[Array[Double]] = centroids.map(_.toArray).toArray
  private lazy val idArr: Array[Int] = ids.toArray
  private lazy val ccArr: Array[Double] = cents.map(NearestCentroid.normSq)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    var vv = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); vv += x * x; i += 1 }
    var best = idArr(0)
    var bestD2 = Double.PositiveInfinity
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      var vc = 0.0
      i = 0
      val m = math.min(n, c.length)
      while (i < m) { vc += v.getDouble(i) * c(i); i += 1 }
      val d2 = vv - 2.0 * vc + ccArr(k)
      if (d2 < bestD2) { bestD2 = d2; best = idArr(k) }
      k += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cRef = ctx.addReferenceObj("centroids", cents, "double[][]")
      val idRef = ctx.addReferenceObj("clusterIds", idArr, "int[]")
      val ccRef = ctx.addReferenceObj("centroidNormSq", ccArr, "double[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val vv = ctx.freshName("vv"); val vc = ctx.freshName("vc"); val d2 = ctx.freshName("d2")
      val x = ctx.freshName("x"); val c = ctx.freshName("c"); val m = ctx.freshName("m")
      val best = ctx.freshName("best"); val bestD2 = ctx.freshName("bestD2")
      s"""
         |int $n = $v.numElements();
         |double $vv = 0.0;
         |for (int $i = 0; $i < $n; $i++) { double $x = $v.getDouble($i); $vv += $x * $x; }
         |int $best = $idRef[0];
         |double $bestD2 = Double.POSITIVE_INFINITY;
         |for (int $k = 0; $k < $cRef.length; $k++) {
         |  double[] $c = $cRef[$k];
         |  double $vc = 0.0;
         |  int $m = java.lang.Math.min($n, $c.length);
         |  for (int $i = 0; $i < $m; $i++) { $vc += $v.getDouble($i) * $c[$i]; }
         |  double $d2 = $vv - 2.0 * $vc + $ccRef[$k];
         |  if ($d2 < $bestD2) { $bestD2 = $d2; $best = $idRef[$k]; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** Coarse-quantizer residual `v − c[cluster]` as one codegen'd kernel —
  * the IVFADC encode path (Jégou et al., TPAMI 2011 §IV.A quantizes the
  * RESIDUAL, not the vector). Element-wise IEEE subtraction is exact and
  * order-free, so the DuckDB replay
  * (`list_transform(generate_series(1, dim), i -> v[i] - cv[i])`) is
  * bit-identical by construction. The centroid matrix rides along as a
  * reference object indexed by cluster id (ids may be sparse after Lloyd
  * empties a cell, hence the id→row lookup rather than positional access).
  */
case class CentroidResidual(left: Expression, right: Expression,
    ids: Seq[Int], centroids: Seq[Seq[Double]])
    extends BinaryExpression {

  require(ids.length == centroids.length && ids.nonEmpty)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  /** id → centroid row; ids are small non-negative ints (≤ initial K). */
  private lazy val lookup: Array[Array[Double]] = {
    val t = new Array[Array[Double]](ids.max + 1)
    ids.zip(centroids).foreach { case (id, c) => t(id) = c.toArray }
    t
  }

  override def nullSafeEval(v0: Any, cl0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    val c = lookup(cl0.asInstanceOf[Int])
    val n = v.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = v.getDouble(i) - (if (i < c.length) c(i) else 0.0)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cl) => {
      val cRef = ctx.addReferenceObj("centroidLookup", lookup, "double[][]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val out = ctx.freshName("out")
      s"""
         |int $n = $v.numElements();
         |double[] $c = $cRef[$cl];
         |double[] $out = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = $v.getDouble($i) - ($i < $c.length ? $c[$i] : 0.0);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CentroidResidual =
    copy(left = newLeft, right = newRight)
}

object CentroidResidual {
  /** Column API: `v` ARRAY<DOUBLE>, `cluster` INT; pairs are (id, centroid). */
  def column(v: Column, cluster: Column, centroids: Seq[(Int, Array[Double])]): Column = {
    val sorted = centroids.sortBy(_._1)
    ColumnBridge.column(CentroidResidual(
      ColumnBridge.expression(v), ColumnBridge.expression(cluster),
      sorted.map(_._1), sorted.map(_._2.toSeq)))
  }
}

object NearestCentroid {
  /** Left-to-right acc + x·x — the same fold order as list_dot_product. */
  private[functions] def normSq(c: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < c.length) { acc += c(i) * c(i); i += 1 }
    acc
  }

  /** Column API: `v` must be ARRAY<DOUBLE>; pairs are (clusterId, centroid). */
  def column(v: Column, centroids: Seq[(Int, Array[Double])]): Column = {
    val sorted = centroids.sortBy(_._1)
    ColumnBridge.column(NearestCentroid(
      ColumnBridge.expression(v), sorted.map(_._1), sorted.map(_._2.toSeq)))
  }
}
