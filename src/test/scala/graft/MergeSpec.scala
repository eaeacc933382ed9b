package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.operators.Merge

class MergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def existing = Seq(
    (1L, 10L, "old-one", Some("desc1"), Some("gp1"), Some(5L)),
    (2L, 20L, "old-two", None, Some("gp2"), None)
  ).toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount")

  private def fresh = Seq(
    (2L, 21L, "new-two", Some("fresh-desc"), Option.empty[String], Some(99L)),
    (3L, 30L, "new-three", None, None, Some(7L))
  ).toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount")

  test("J1: matched rows overwrite name/rootPlaceId but keep enrichments") {
    val out = Merge.mergeUpsert(existing, fresh, "universeId",
      overwriteCols = Seq("rootPlaceId", "name"),
      coalesceCols = Seq.empty,
      keepCols = Seq("description", "gameplayDescription", "playerCount"))
      .orderBy("universeId").collect()
    assert(out.length === 3)
    // 1: existing-only, untouched
    assert(out(0) === Row(1L, 10L, "old-one", "desc1", "gp1", 5L))
    // 2: matched — fresh name/rootPlaceId, existing enrichments (incl nulls)
    assert(out(1) === Row(2L, 21L, "new-two", null, "gp2", null))
    // 3: fresh-only insert, enrichments null
    assert(out(2) === Row(3L, 30L, "new-three", null, null, null))
  }

  test("J1b: coalesce description prefers fresh, falls back to existing") {
    val out = Merge.mergeUpsert(existing, fresh, "universeId",
      overwriteCols = Seq("rootPlaceId", "name"),
      coalesceCols = Seq("description"),
      keepCols = Seq("gameplayDescription", "playerCount"))
      .orderBy("universeId").collect()
    assert(out(0).getString(3) === "desc1")      // existing kept
    assert(out(1).getString(3) === "fresh-desc") // fresh wins
  }

  test("merge is idempotent: merging a table with itself preserves it") {
    val g = existing
    val out = Merge.mergeUpsert(g, g, "universeId",
      overwriteCols = Seq("rootPlaceId", "name"),
      coalesceCols = Seq.empty,
      keepCols = Seq("description", "gameplayDescription", "playerCount"))
    assert(out.orderBy("universeId").collect() === g.orderBy("universeId").collect())
  }
}
