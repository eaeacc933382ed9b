package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{CosineSimilarity, HashedWordNGrams, HashedWords60, SimHash60, SortedLongIntersectCount}

/** SQL surface for the engine's custom Catalyst expressions, so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works alongside the
  * Column API. Two registration paths:
  *
  *   - `--conf spark.sql.extensions=graft.GraftExtensions` at session build
  *     (the standard SparkSessionExtensions hook);
  *   - [[GraftExtensions.register]] on an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def toDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[graft] val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (es: Seq[Expression]) => CosineSimilarity(toDoubleArray(es(0)), toDoubleArray(es(1)))),
    ("sorted_long_intersect_count",
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName, "sorted_long_intersect_count"),
      (es: Seq[Expression]) => SortedLongIntersectCount(es(0), es(1))),
    ("simhash60",
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (es: Seq[Expression]) => SimHash60(es(0))),
    ("hashed_words60",
      new ExpressionInfo(classOf[HashedWords60].getName, "hashed_words60"),
      (es: Seq[Expression]) => HashedWords60(es(0))),
    ("hashed_word_ngrams",
      new ExpressionInfo(classOf[HashedWordNGrams].getName, "hashed_word_ngrams"),
      (es: Seq[Expression]) => HashedWordNGrams(es(0), litInt(es(1), "n")))
  )

  /** Register all engine functions on a live session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
