package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.enrich.{EnrichmentClient, GameDetail, LlmAnalysis, StubEnrichmentClient}
import graft.pipeline.Commands

object CommandsSpec {
  /** Details client exercising every merge path: ids %3==0 are MISSING from
    * the response (J3 path); returned ids get a blank description when
    * %2!=0 (→ null, known-blank) and no `playing` when %5==0 (→ 0).
    * Top-level so the mapPartitions closure stays serializable. */
  class DetailsClient extends StubEnrichmentClient(8) {
    override def gameDetails(ids: Seq[Long]): Seq[GameDetail] =
      ids.filter(_ % 3 != 0).map { id =>
        GameDetail(id,
          description = if (id % 2 == 0) Some(s"fresh $id") else Some("  "),
          playing = if (id % 5 == 0) None else Some(id * 2))
      }
  }
}

class CommandsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  import CommandsSpec.DetailsClient

  // (universeId, rootPlaceId, name, description, descriptionFetched, gameplayDescription, playerCount)
  private def games = Seq(
    (1L, 10L, "a", Some("have desc"), true, None: Option[String], Some(7L)),  // not in work set
    (2L, 20L, "b", None, false, None, Some(5L)),                              // never fetched → returned, fresh
    (3L, 30L, "c", None, false, None, None),                                  // never fetched → MISSING → known-blank
    (4L, 40L, "d", Some(""), true, None, Some(1L)),                           // blank → refetch → fresh
    (5L, 50L, "e", Some("keep me"), true, None, None),                        // only pc missing → returned (blank desc → null!)
    (9L, 90L, "f", None, true, None, None)                                    // known-blank, pc missing → MISSING → desc stays null
  ).toDF("universeId", "rootPlaceId", "name", "description", "descriptionFetched",
    "gameplayDescription", "playerCount")

  test("downloadDescriptions merge rules across all paths") {
    val out = Commands.downloadDescriptions(spark, games, new DetailsClient)
      .orderBy("universeId").collect()
      .map(r => r.getLong(0) -> r).toMap

    // 1: untouched
    assert(out(1L).getAs[String]("description") === "have desc")
    assert(out(1L).getAs[Long]("playerCount") === 7L)
    // 2: returned, fresh desc + playing 4
    assert(out(2L).getAs[String]("description") === "fresh 2")
    assert(out(2L).getAs[Boolean]("descriptionFetched"))
    assert(out(2L).getAs[Long]("playerCount") === 4L)
    // 3: missing from response, needed desc → known-blank null, pc untouched
    assert(out(3L).isNullAt(out(3L).fieldIndex("description")))
    assert(out(3L).getAs[Boolean]("descriptionFetched"))
    assert(out(3L).isNullAt(out(3L).fieldIndex("playerCount")))
    // 4: blank refetch → fresh desc, playing 8
    assert(out(4L).getAs[String]("description") === "fresh 4")
    assert(out(4L).getAs[Long]("playerCount") === 8L)
    // 5: in work set for pc only, returned blank desc → overwritten to null
    //    (reference overwrites description for every returned row), playing None → 0
    assert(out(5L).isNullAt(out(5L).fieldIndex("description")))
    assert(out(5L).getAs[Long]("playerCount") === 0L)
    // 9: missing, did NOT need desc (known-blank) → desc stays null, pc stays null
    assert(out(9L).isNullAt(out(9L).fieldIndex("description")))
    assert(out(9L).isNullAt(out(9L).fieldIndex("playerCount")))
  }

  test("downloadDescriptions is idempotent for fully-resolved rows") {
    val once = Commands.downloadDescriptions(spark, games, new DetailsClient)
    val twice = Commands.downloadDescriptions(spark, once, new DetailsClient)
    // rows 2 and 4 are fully resolved after one pass and must not change;
    // 3 and 9 stay known-blank with null pc → re-enter the work set only
    // for playerCount and remain stable because they are missing again
    assert(twice.orderBy("universeId").collect() === once.orderBy("universeId").collect())
  }

  test("processGamesFromSearch chains merge and embedding stages") {
    val existing = Seq((1L, 10L, "one", Option.empty[String], Option.empty[String], Option.empty[Long]))
      .toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount")
    val fresh = Seq((1L, 11L, "one-new", Option.empty[String], Option.empty[String], Some(9L)),
        (2L, 22L, "two", Option.empty[String], Option.empty[String], Some(3L)))
      .toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount")
    val emptyExisting = Seq.empty[Long].toDF("doc_id")
    val (merged, embedded) =
      Commands.processGamesFromSearch(spark, existing, fresh, emptyExisting, new StubEnrichmentClient(4))
    assert(merged.count() === 2L)
    assert(merged.filter($"universeId" === 1L).head().getAs[Long]("playerCount") === 9L)
    val vecs = embedded.collect()
    assert(vecs.length === 2)
    assert(vecs.forall(_.getSeq[Double](1).length === 4))
  }
}
