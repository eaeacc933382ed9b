package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quality, TextAnalysis}

class QualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("prune cascade attributes each game to its FIRST matching reason") {
    val out = Quality.pruneCascade(spark, SparkTestSession.Sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // reasons partition the games: everything sums to total + orphan row
    val total = out.view.filterKeys(_ != "orphan embeddings").values.sum
    assert(total === 500L)
    assert(out.contains("missing embedding"))
    assert(out.contains("kept"))
    // zero players never fires in the fixture (n_chars >= 48)
    assert(!out.contains("zero players"))
  }

  test("tri-state predicates: needsDescription excludes known-blank") {
    val r = Quality.tristatePredicates(spark, SparkTestSession.Sf0001).head()
    val has = r.getLong(0); val needs = r.getLong(1); val knownBlank = r.getLong(2)
    assert(has + needs + knownBlank === 500L) // states partition the table
    assert(knownBlank > 0)                    // %19 rows: fetched, null
  }

  test("lang-id is deterministic and covers every input language") {
    val out = TextAnalysis.langId(spark, SparkTestSession.Sf0001).collect()
    val langs = out.map(_.getString(0)).distinct.sorted
    assert(langs === Array("de", "en", "es", "fr", "zh"))
    assert(out.map(_.getLong(2)).sum === 500L)
  }
}
