package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.operators.Profile

/** Semantic checks for the column-profiling report: the tri-state
  * injection rates the `games` view plants must surface in exactly the
  * null/empty/distinct columns built to expose them, and the report must
  * be layout-invariant (the KMV sketch depends only on the value set). */
class ProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf0001

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("profile is layout-invariant and surfaces the planted tri-state structure") {
    val g = Tables.games(spark, dir)
    val base = Profile.profileOn(g).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows(Profile.profileOn(g)) === rows(Profile.profileOn(g.repartition(7))),
      "profile must not depend on layout")

    val n = g.count()
    // universeId: unique primary key, never null
    assert(base("universeId").getAs[Long]("n_null") === 0L)
    assert(base("universeId").getAs[Long]("n_distinct") === n)
    // description: nulls from %17 and %19 injection, empties from %23
    val desc = base("description")
    val expNull = g.filter(col("description").isNull).count()
    val expEmpty = g.filter(col("description") === "").count()
    assert(desc.getAs[Long]("n_null") === expNull && expNull > 0)
    assert(desc.getAs[Long]("n_empty") === expEmpty && expEmpty > 0)
    // descriptionFetched: a boolean — exactly two distinct values, and the
    // unsaturated KMV sketch must be EXACT (the k-minimum-values property)
    val bf = base("descriptionFetched")
    assert(bf.getAs[Long]("n_distinct") === 2L)
    assert(bf.getAs[Long]("distinct_kmv") === 2L,
      "KMV below saturation is exact by construction")
    // gameplayDescription: %3 nulls
    assert(base("gameplayDescription").getAs[Long]("n_null") ===
      g.filter(col("gameplayDescription").isNull).count())
    // null_frac is the rounded ratio of the two integer columns it sits next to
    base.values.foreach { r =>
      val expect = math.floor(r.getAs[Long]("n_null").toDouble /
        r.getAs[Long]("n") * 10000 + 0.5) / 10000
      assert(r.getAs[Double]("null_frac") === expect)
    }
  }
}
