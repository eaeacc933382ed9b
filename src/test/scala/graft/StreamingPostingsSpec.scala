package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.model.Schemas
import graft.operators.TextSearch
import graft.streaming.StreamingPostingsIndex

class StreamingPostingsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def gamesDf(rows: Seq[(Long, Long, String, Option[String], Option[String], Option[Long])]) =
    rows.toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount")

  test("streamed postings index upserts docs and serves the batch cascade") {
    val dropDir = Files.createTempDirectory("graft-pidx-drops").toString
    val idxDir = Files.createTempDirectory("graft-pidx-state").toString
    val ckptDir = Files.createTempDirectory("graft-pidx-ckpt").toString

    val initial = gamesDf(Seq(
      (1L, 10L, "alphaville tycoon", Some("build a merge empire"), Some("gp one"), Some(5L)),
      (2L, 20L, "uniqoldname arena", Some("desc2 stays"), None, None)))

    // drop A updates game 2: name overwritten (old name token must STOP
    // matching — the delete half of the postings upsert), description null
    // (enrichment kept, so its words must KEEP matching); drop B inserts
    // games 4 and 5. Disjoint keys so micro-batch order can't matter.
    gamesDf(Seq((2L, 21L, "uniqnewname arena", None, None, None)))
      .coalesce(1).write.parquet(s"$dropDir/a")
    gamesDf(Seq(
      (4L, 40L, "merge masters", Some("freshly inserted"), None, None),
      (5L, 50L, "idle five", None, None, Some(100L))))
      .coalesce(1).write.parquet(s"$dropDir/b")

    val idx = new StreamingPostingsIndex(spark, idxDir, initial, keepVersions = 1)
    val stream = spark.readStream
      .schema(Schemas.game)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dropDir/*")
    assert(idx.start(stream, ckptDir).awaitTermination(120000L))

    // streamed postings ≡ re-tokenizing the final snapshot from scratch
    val fin = idx.currentGames()
    val rebuilt = TextSearch.postingsOf(fin)
      .as[(Long, String)].collect().toSet
    val streamed = idx.currentPostings().as[(Long, String)].collect().toSet
    assert(streamed === rebuilt)
    assert(idx.currentDictionary().as[String].collect().toSet ===
      rebuilt.map(_._2))

    // indexed serving off the committed version ≡ the full-scan cascade on
    // the final snapshot (same guarantee f6_text_search_indexed pins);
    // "merge empire" exercises the multi-word posting-intersection path
    // the server inherits from searchIndexedFrames
    for (q <- Seq("merge", "uniqnewname", "desc2", "arena", "merge empire")) {
      val servedRows = idx.searchCurrent(q, 10).collect().toSeq
      val scanRows = TextSearch.search(fin, q, 10).collect().toSeq
      assert(servedRows === scanRows, s"query '$q'")
    }
    // the inserted doc is searchable by its gathered name; its batch-row
    // description is NOT — the J1 policy keeps enrichment fields off the
    // gather stream (keepCols reads the existing side, null for inserts),
    // and the postings tokenize the MERGED row, so the index agrees with
    // the snapshot rather than with the raw batch
    assert(idx.searchCurrent("masters", 10).collect().map(_.getLong(0)).toSeq === Seq(4L))
    assert(idx.searchCurrent("freshly", 10).isEmpty)
    assert(fin.filter(col("universeId") === 4L).select("description")
      .collect().head.isNullAt(0))
    // the overwritten name's old token is gone; the kept enrichment text
    // of the UPDATED doc still matches
    assert(idx.searchCurrent("uniqoldname", 10).isEmpty)
    assert(idx.searchCurrent("desc2", 10).collect().map(_.getLong(0)).toSeq === Seq(2L))

    // replay of a committed batch id is a no-op (foreachBatch retry safety)
    val before = idx.postingsVersions().max
    idx.upsertBatch(gamesDf(Seq((9L, 90L, "ghost", None, None, None))), batchId = 0L)
    assert(idx.postingsVersions().max === before)
    assert(idx.searchCurrent("ghost", 10).isEmpty)

    // keep-last-1 retention: only the final version's tables survive
    assert(idx.postingsVersions() === Seq(before))
  }
}
