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

  test("T2 collation variants: UNICODE_CI vs binary vs lower() diverge as documented") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // accent/case fixtures: the three orderings disagree on exactly these
    val names = Seq("apple", "Apple", "Zebra", "banana", "éclair", "Eclair")
    val df = names.toDF("name")
    def order(c: org.apache.spark.sql.Column): Seq[String] =
      df.orderBy(c, col("name")).collect().map(_.getString(0)).toSeq

    val binary = order(col("name"))
    val lowerCi = order(lower(col("name")))
    val icu = order(collate(col("name"), "UNICODE_CI"))

    // binary UTF-8: ALL uppercase before lowercase, é (U+00E9) after z
    assert(binary.indexOf("Zebra") < binary.indexOf("apple"))
    assert(binary.last === "éclair")
    // lower()-CI fixes the case split but é still sorts after z
    assert(lowerCi.indexOf("apple") < lowerCi.indexOf("Zebra"))
    assert(lowerCi.last === "éclair")
    // ICU UNICODE_CI: case-insensitive AND accent-aware — éclair sorts
    // with Eclair (secondary difference), well before Zebra; this is the
    // ordering closest to the reference's localeCompare (games.get.ts:63)
    assert(icu.indexOf("éclair") === icu.indexOf("Eclair") + 1)
    assert(icu.indexOf("éclair") < icu.indexOf("Zebra"))
    // and all three genuinely differ on this fixture set
    assert(binary != lowerCi)
    assert(lowerCi != icu)
    assert(binary != icu)

    // the engine query runs end-to-end on the fixture tables
    assert(Quality.gamesListIcu(spark, SparkTestSession.Sf0001).count() === 50)
  }

  test("lang-id is deterministic and covers every input language") {
    val out = TextAnalysis.langId(spark, SparkTestSession.Sf0001).collect()
    val langs = out.map(_.getString(0)).distinct.sorted
    assert(langs === Array("de", "en", "es", "fr", "zh"))
    assert(out.map(_.getLong(2)).sum === 500L)
  }
}
