package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextSearch

class TextSearchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def games = Seq(
    // (universeId, rootPlaceId, name, description, gameplayDescription, playerCount)
    (1L, 11L, "mega obby tower", Some("a hard obby"), Some("gp"), Some(0L)),  // title contains (not prefix)
    (2L, 12L, "racing fun", Some("obby racing mix"), Some("gp"), Some(0L)),   // desc contains
    (3L, 13L, "pets", Some("cats"), Some("an obby adventure"), Some(0L)),     // gameplay only
    (4L, 14L, "obby", Some("x"), None, Some(0L)),                             // exact title
    (5L, 15L, "obby world", None, None, Some(0L)),                            // prefix title
    (6L, 16L, "nothing", Some(""), Some(""), Some(0L)),                       // blank fields
    (7L, 17L, "misc", Some("superobbyx inside"), None, Some(0L))              // substring-of-word
  ).toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount")

  test("first-match-wins cascade assigns exactly one matchType per game") {
    val out = TextSearch.search(games, "obby", 100).collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getDouble(4))).toMap
    assert(out(1)._1 === "title")
    assert(out(2)._1 === "description")
    assert(out(3)._1 === "gameplayDescription")
    assert(!out.contains(6L)) // blank never matches
  }

  test("title band with exact and prefix bonuses (pc=0 → factor 0.8)") {
    val out = TextSearch.search(games, "obby", 100).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(4) === 120.0) // (100+50)*0.8 exact
    assert(out(5) === 100.0) // (100+25)*0.8 prefix
    assert(out(1) === 80.0)  // 100*0.8 plain containment
  }

  test("word-match counts substrings of words (reference semantics)") {
    // doc 7: description "superobbyx inside" — whole-query 'obby' IS a
    // substring, word-frac = 1 → (50 + 20*1) * 0.8 = 56
    val out = TextSearch.search(games, "obby", 100).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(7) === 56.0)
  }

  test("T8: limit clamps to [1, 100]") {
    assert(TextSearch.clampLimit(0) === 1)
    assert(TextSearch.clampLimit(-5) === 1)
    assert(TextSearch.clampLimit(50) === 50)
    assert(TextSearch.clampLimit(1000) === 100)
  }

  test("results ordered by score desc with universeId tiebreak") {
    val out = TextSearch.search(games, "obby", 100).collect()
    val scores = out.map(_.getDouble(4))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  // ------------------------------------------------- posting-list serving

  /** games plus a doc whose fields contain the phrase WORDS but never the
    * phrase — and in DIFFERENT fields — so the per-word posting
    * intersection admits it as a candidate and the cascade must prune it. */
  private def phraseGames = games.unionByName(Seq(
    (8L, 18L, "tower defense", Some("an obby here"), None: Option[String], Some(0L))
  ).toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount"))

  private def indexed(g: org.apache.spark.sql.DataFrame, q: String) = {
    val postings = TextSearch.postingsOf(g)
    TextSearch.searchIndexedFrames(
      g, postings, postings.select($"word").distinct(), q, 100)
  }

  test("indexed single-word search ≡ full-scan search") {
    val scan = TextSearch.search(phraseGames, "obby", 100).collect().toSeq
    val idx = indexed(phraseGames, "obby").collect().toSeq
    assert(idx === scan)
  }

  test("indexed batch search ≡ cross-join batch search (mixed single- and multi-word queries)") {
    val qs = Seq("obby", "obby tower", "racing")
    val scan = TextSearch.searchMany(phraseGames, qs, 5).collect().toSeq
    val postings = TextSearch.postingsOf(phraseGames)
    val idx = TextSearch.searchManyIndexed(phraseGames, postings,
      postings.select($"word").distinct(), qs, 5).collect().toSeq
    assert(idx === scan)
  }

  test("indexed phrase search ≡ full-scan search; cross-field candidate pruned") {
    val scan = TextSearch.search(phraseGames, "obby tower", 100).collect().toSeq
    val idx = indexed(phraseGames, "obby tower").collect().toSeq
    assert(idx === scan)
    // doc 1 ("mega obby tower") matches; doc 8 has both words but split
    // across fields — a candidate, but the cascade must reject it
    val ids = idx.map(_.getLong(0)).toSet
    assert(ids.contains(1L))
    assert(!ids.contains(8L))
  }
}
