package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** All sign-of-projection LSH buckets for one vector in ONE codegen pass:
  * element t of the result is the [[VectorFunctions.hyperplaneBucketT]]
  * bucket for multiplier `mults(t)` — bit j set iff
  * Σᵢ v[i] · ((i·mult + j·97) mod 101 − 50)/100 > 0, with the same strict
  * left-to-right f64 accumulation as the `zip_with`+`aggregate` fold it
  * replaces (identical buckets, bit for bit — the DuckDB oracles are
  * unchanged).
  *
  * The fold form evaluates interpreted — boxed lambdas per element, and it
  * MATERIALIZES each 64-element plane per row per plane. That made LSH
  * bucketing the dominant cost of the NSW graph build (T·P interpreted
  * 64-element folds per vector on the scan's input partitioning). This
  * kernel is the same integer plane arithmetic fused into a primitive
  * loop: plane elements are recomputed on the fly (two int ops), nothing
  * allocates, and the whole (tables × planes × dims) triple loop inlines
  * into WholeStageCodegen.
  *
  * Plane indices follow the vector's length (all engine call sites score
  * 64-dim vectors; the fold form pinned planes at 64 elements and
  * null-padded shorter vectors — mismatched dims never reach bucketing
  * because the P13 guard drops them first).
  */
case class HyperplaneBuckets(child: Expression, mults: Seq[Int], numPlanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Int](mults.length)
    var t = 0
    while (t < mults.length) {
      val mult = mults(t)
      var bucket = 0
      var j = 0
      while (j < numPlanes) {
        val jo = j * 97
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += v.getDouble(i) * (((i * mult + jo) % 101 - 50) / 100.0)
          i += 1
        }
        if (acc > 0.0) bucket |= (1 << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val multArr = ctx.addReferenceObj("hpMults", mults.toArray, "int[]")
      val out = ctx.freshName("out"); val n = ctx.freshName("n")
      val t = ctx.freshName("t"); val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val mult = ctx.freshName("mult"); val jo = ctx.freshName("jo")
      val bucket = ctx.freshName("bucket"); val acc = ctx.freshName("acc")
      s"""
         |int $n = $v.numElements();
         |int[] $out = new int[${mults.length}];
         |for (int $t = 0; $t < ${mults.length}; $t++) {
         |  int $mult = $multArr[$t];
         |  int $bucket = 0;
         |  for (int $j = 0; $j < $numPlanes; $j++) {
         |    int $jo = $j * 97;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += $v.getDouble($i) * ((($i * $mult + $jo) % 101 - 50) / 100.0);
         |    }
         |    if ($acc > 0.0) $bucket |= (1 << $j);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** Column API: `v` must already be ARRAY<DOUBLE> (callers cast). */
  def column(v: Column, mults: Seq[Int], numPlanes: Int): Column =
    ColumnBridge.column(
      HyperplaneBuckets(ColumnBridge.expression(v), mults, numPlanes))
}
