package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.model.Schemas
import graft.operators.{Merge, TextSearch}
import graft.streaming.{StreamingChangeFeed, StreamingPostingsIndex}

/** The CDC-fed postings maintainer (round-11 verdict #1 refit): crawl rows
  * merge into the LAKE through a [[StreamingChangeFeed]]; the maintainer
  * tails the preimage feed and commits bucket-pruned postings deltas. The
  * parity assertions carried over from the full-commit maintainer: streamed
  * ≡ rebuilt postings (set equality through one tokenizer), served ≡ the
  * full-scan cascade, J1 policy visible through the index, replay no-op,
  * retention — plus the refit's own claims: per-delta writes touch a
  * strict subset of buckets and a strict subset of state bytes.
  */
class StreamingPostingsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def gamesDf(rows: Seq[(Long, Long, String, Option[String], Option[String], Option[Long])]) =
    rows.toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount")

  test("CDC-fed postings index upserts docs bucket-pruned and serves the batch cascade") {
    val dropDir = Files.createTempDirectory("graft-pidx-drops").toString
    val tableDir = Files.createTempDirectory("graft-pidx-table").toString + "/games"
    val feedDir = Files.createTempDirectory("graft-pidx-feed").toString
    val stateDir = Files.createTempDirectory("graft-pidx-state").toString
    val ckptDir = Files.createTempDirectory("graft-pidx-ckpt").toString
    val idxCkptDir = Files.createTempDirectory("graft-pidx-ickpt").toString

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

    // the lake + preimage feed the maintainer tails (J1 policy: gather
    // fields overwrite, enrichment fields persist)
    val cf = new StreamingChangeFeed(spark, tableDir, feedDir, initial,
      "universeId",
      overwriteCols = Seq("rootPlaceId", "name"), coalesceCols = Seq.empty,
      keepCols = Seq("description", "gameplayDescription", "playerCount"),
      buckets = 4, feedPreimages = true)
    // maintainer bootstraps at the table's v0 (the one corpus-sized build)
    val idx = new StreamingPostingsIndex(spark, tableDir, feedDir, stateDir,
      buckets = 8, keepVersions = 1)
    assert(idx.currentVersion === 0L)

    val stream = spark.readStream
      .schema(Schemas.game)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dropDir/*")
    assert(cf.start(stream, ckptDir).awaitTermination(120000L))
    // tail the feed live (the stream is a trigger; catchUp applies whole
    // emitted versions)
    assert(idx.start(idxCkptDir).awaitTermination(120000L))

    // streamed postings ≡ re-tokenizing the final LAKE table from scratch
    val fin = Merge.readTable(spark, tableDir).drop("bucket", "gen")
    val rebuilt = TextSearch.postingsOf(fin)
      .select(col("universeId"), col("word"))
      .as[(Long, String)].collect().toSet
    val streamed = idx.currentPostings()
      .select(col("universeId"), col("word"))
      .as[(Long, String)].collect().toSet
    assert(streamed === rebuilt)
    assert(idx.currentDictionary().as[String].collect().toSet ===
      rebuilt.map(_._2))

    // indexed serving off the pinned (table, postings) version ≡ the
    // full-scan cascade on the final snapshot (same guarantee
    // f6_text_search_indexed pins); "merge empire" exercises the
    // multi-word posting-intersection path
    for (q <- Seq("merge", "uniqnewname", "desc2", "arena", "merge empire")) {
      val servedRows = idx.searchCurrent(q, 10).collect().toSeq
      val scanRows = TextSearch.search(fin, q, 10).collect().toSeq
      assert(servedRows === scanRows, s"query '$q'")
    }
    // the inserted doc is searchable by its gathered name; its batch-row
    // description is NOT — the J1 policy keeps enrichment fields off the
    // gather stream (keepCols reads the existing side, null for inserts),
    // and the postings tokenize the post-image of the MERGED row, so the
    // index agrees with the lake rather than with the raw batch
    assert(idx.searchCurrent("masters", 10).collect().map(_.getLong(0)).toSeq === Seq(4L))
    assert(idx.searchCurrent("freshly", 10).isEmpty)
    assert(fin.filter(col("universeId") === 4L).select("description")
      .collect().head.isNullAt(0))
    // the overwritten name's old token is gone; the kept enrichment text
    // of the UPDATED doc still matches
    assert(idx.searchCurrent("uniqoldname", 10).isEmpty)
    assert(idx.searchCurrent("desc2", 10).collect().map(_.getLong(0)).toSeq === Seq(2L))

    // two feed versions applied on top of the bootstrap
    assert(idx.currentVersion === 2L)

    // replay of an applied feed version is a no-op (returns None, no
    // version minted, no state touched)
    assert(idx.applyFeedVersion(2) === None)
    assert(idx.currentVersion === 2L)

    // keep-last-1 retention: only the final version's manifest survives
    assert(idx.postingsVersions() === Seq(2L))
  }

  test("delta commits are bucket-pruned: writes touch a strict subset of buckets and bytes") {
    val tableDir = Files.createTempDirectory("graft-pidx2-table").toString + "/games"
    val feedDir = Files.createTempDirectory("graft-pidx2-feed").toString
    val stateDir = Files.createTempDirectory("graft-pidx2-state").toString

    // a corpus wide enough that its words span all 16 buckets
    val initial = gamesDf((1L to 60L).map(i =>
      (i, i + 100L, s"game$i word$i", Some(s"body$i common"), None, None)))
    val cf = new StreamingChangeFeed(spark, tableDir, feedDir, initial,
      "universeId",
      overwriteCols = Seq("rootPlaceId", "name"), coalesceCols = Seq.empty,
      keepCols = Seq("description", "gameplayDescription", "playerCount"),
      buckets = 4, feedPreimages = true)
    val idx = new StreamingPostingsIndex(spark, tableDir, feedDir, stateDir,
      buckets = 16, keepVersions = 4)

    // one small change batch: 2 of 60 docs
    cf.applyBatch(gamesDf(Seq(
      (7L, 207L, "renamedseven only", None, None, None),
      (61L, 261L, "brandnew game", None, None, None))), 0L)
    val stats = idx.applyFeedVersion(1).get
    assert(stats.touchedBuckets > 0)
    assert(stats.touchedBuckets < stats.totalBuckets,
      s"expected a strict bucket subset, touched ${stats.touchedBuckets}/${stats.totalBuckets}")
    assert(stats.writtenBytes < stats.stateBytes,
      s"expected written ${stats.writtenBytes} < state ${stats.stateBytes}")
    // and the pruned commit still yields exact parity with a full rebuild
    val fin = Merge.readTable(spark, tableDir).drop("bucket", "gen")
    val rebuilt = TextSearch.postingsOf(fin)
      .select(col("universeId"), col("word")).as[(Long, String)].collect().toSet
    val streamed = idx.currentPostings()
      .select(col("universeId"), col("word")).as[(Long, String)].collect().toSet
    assert(streamed === rebuilt)
  }
}
