package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.io.CompatIO
import graft.operators.{Similarity, TextSearch}

/** Golden end-to-end (SURVEY §5.2): reference-format JSON fixtures →
  * CompatIO ingest → the two flagship query surfaces → exact expected
  * outputs, scores hand-computed from the reference formulas. */
class GoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fixture(name: String): String =
    getClass.getResource(s"/golden/$name").getPath

  test("golden text search over games.json") {
    val games = CompatIO.readGamesJson(spark, fixture("games.json"))
    val out = TextSearch.search(games, "obby", 10).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      // (100+25 prefix) × pop(250→1.0)
      (101L, "title", 125.0),
      // (100+50 exact) × pop(absent→0.8)
      (104L, "title", 120.0),
      // (50+20·1) × pop(0→0.8)
      (102L, "description", 56.0),
      // (25+15·1) × pop(absent→0.8)
      (103L, "gameplayDescription", 32.0)))
  }

  test("golden similar search over embeddings.json (orphan dropped, NaN kept)") {
    val games = CompatIO.readGamesJson(spark, fixture("games.json"))
    val emb = CompatIO.readEmbeddingsJson(spark, fixture("embeddings.json"))
    val out = Similarity.similarSearchOn(games, emb, 101L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    // orphan embedding 999 has no game row → dropped by the inner join
    assert(!out.exists(_._1 == 999L))
    // zero-vector 104 → NaN similarity; NaN sorts first under desc
    assert(out.head._1 === 104L && out.head._2.isNaN)
    // cos([.8,.6],[1,0]) = 0.8 × pop(0→0.8) = 0.64
    assert(out(1) === ((102L, 0.64)))
    // orthogonal → 0.0 × 0.8
    assert(out(2) === ((103L, 0.0)))
  }
}
