package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Merge
import graft.streaming.{StreamingChangeFeed, StreamingIncrementalDedup,
  StreamingIvmView, StreamingPostingsIndex}

/** The composed incremental story, end-to-end (round-11 verdict #8): one
  * crawl batch flows
  *
  *   crawl docs → [[StreamingIncrementalDedup]] (admission against stored
  *   bands) → admitted rows J1-merge into the LAKE through
  *   [[StreamingChangeFeed]] (manifest commit + preimage feed drain) →
  *   the feed log fans out to BOTH maintainer consumers:
  *   [[StreamingPostingsIndex]] (bucket-pruned postings delta) and
  *   [[StreamingIvmView]] (complete-mode delta aggregation) —
  *
  * and at the end of each batch the search index, the lake table, and
  * the materialized view are all fresh, while every stage's WRITE is
  * change-sized: the dedup state grows by admitted docs only, the lake
  * rewrites touched buckets only, the feed log holds change rows only,
  * and the postings commit touches a strict subset of buckets and bytes.
  * Per-stage rows/bytes are printed as the PIPELINE narrative NOTES.md
  * quotes.
  */
class StreamingPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  private def toGames(docs: org.apache.spark.sql.DataFrame) = docs.select(
    col("doc_id").as("universeId"),
    (col("doc_id") + 1000L).as("rootPlaceId"),
    concat(lit("game "), col("doc_id")).as("name"),
    col("text").as("description"),
    lit(null).cast("string").as("gameplayDescription"),
    lit(null).cast("long").as("playerCount"))

  private def dirBytes(path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def go(q: org.apache.hadoop.fs.Path): Long =
      if (!fs.exists(q)) 0L
      else fs.listStatus(q).map(st =>
        if (st.isDirectory) go(st.getPath) else st.getLen).sum
    go(p)
  }

  test("crawl → dedup admission → lake + CDC → postings + IVM, nothing corpus-sized on the hot path") {
    val root = Files.createTempDirectory("graft-pipeline").toString
    val seed = docsDf((1L to 60L).map(i =>
      (i, s"token${i}a token${i}b token${i}c shared corpus body number $i")))

    // the three stateful tiers, seeded from the same corpus
    val dedup = new StreamingIncrementalDedup(spark, s"$root/dedup", seed)
    val cf = new StreamingChangeFeed(spark, s"$root/table", s"$root/feed",
      toGames(seed), "universeId",
      overwriteCols = Seq("rootPlaceId", "name"), coalesceCols = Seq("description"),
      keepCols = Seq("gameplayDescription", "playerCount"),
      buckets = 8, retainVersions = 8, feedPreimages = true)
    val idx = new StreamingPostingsIndex(spark, s"$root/table", s"$root/feed",
      s"$root/postings", buckets = 16, keepVersions = 8)
    val ivmBase = Merge.ivmBaseAgg(Merge.readTable(spark, s"$root/table")
      .drop("bucket", "gen"))

    // one crawl batch: 2 exact re-crawls of admitted docs (rejected), one
    // near-dup (rejected), 3 genuinely new docs (admitted)
    val crawl = docsDf(Seq(
      (501L, "token7a token7b token7c shared corpus body number 7"),  // dup of 7
      (502L, "token19a token19b token19c shared corpus body number 19"), // dup of 19
      (503L, "token3a token3b token3c shared corpus body number 3 tail"), // near-dup of 3
      (601L, "freshalpha freshbeta freshgamma unique first new doc"),
      (602L, "freshdelta fresheps freshzeta unique second new doc"),
      (603L, "freshlambda freshmu freshnu unique third new doc")))

    // STAGE 1: admission — only the 3 new docs survive
    dedup.admitBatch(crawl, 0L)
    val verdicts = dedup.currentVerdicts().filter(col("batch_id") === 0L)
      .select(col("delta_id"), col("verdict")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(verdicts(501L) === "dup_of_base" && verdicts(502L) === "dup_of_base")
    assert(verdicts(503L) === "dup_of_base")
    val admittedIds = verdicts.collect { case (id, "new") => id }.toSet
    assert(admittedIds === Set(601L, 602L, 603L))
    val admitted = crawl.filter(col("doc_id").isin(admittedIds.toSeq.map(Long.box): _*))

    // STAGE 2: lake merge + CDC drain — one version, change-sized feed
    val tableBytesBefore = dirBytes(s"$root/table")
    cf.applyBatch(toGames(admitted), 0L)
    val feedRows = cf.feed().filter(col("version") === 1).collect()
    assert(feedRows.map(_.getAs[Long]("universeId")).toSet === admittedIds)
    assert(feedRows.forall(_.getAs[String]("op") === "insert"))

    // STAGE 3a: postings maintainer tails the feed — bucket-pruned commit
    val pStats = idx.applyFeedVersion(1).get
    assert(pStats.touchedBuckets < pStats.totalBuckets,
      s"postings commit must be bucket-pruned: ${pStats.touchedBuckets}/${pStats.totalBuckets}")
    assert(pStats.writtenBytes < pStats.stateBytes,
      s"postings write must be change-sized: ${pStats.writtenBytes}/${pStats.stateBytes}")
    // the new doc is searchable through the served index; the REJECTED
    // near-dup's tail token never entered the corpus
    assert(idx.searchCurrent("freshalpha", 10).collect()
      .map(_.getLong(0)).toSeq === Seq(601L))
    assert(idx.searchCurrent("tail", 10).isEmpty)

    // STAGE 3b: the IVM view tails the SAME feed log — live complete-mode
    // aggregation, served view ≡ direct recompute over the final table
    val feedSchema = cf.feed().drop("version").schema
    val q = StreamingIvmView.startComplete(
      StreamingIvmView.deltaStream(
        StreamingIvmView.readFeed(spark, s"$root/feed", feedSchema)),
      "pipeline_ivm", s"$root/ivm-ckpt", Trigger.AvailableNow())
    assert(q.awaitTermination(120000L))
    val served = StreamingIvmView.currentView(spark, ivmBase, "pipeline_ivm")
      .orderBy(col("shard")).collect().toSeq
    val recomputed = Merge.ivmBaseAgg(Merge.readTable(spark, s"$root/table")
      .drop("bucket", "gen")).orderBy(col("shard")).collect().toSeq
    assert(served === recomputed, "served view diverges from recompute")

    // the lake itself: merged table holds seed + admitted, nothing else
    val table = Merge.readTable(spark, s"$root/table")
    assert(table.count() === 63)
    assert(table.filter(col("universeId") === 503L).isEmpty)

    // the narrative line: per-stage volumes for NOTES.md
    println(s"PIPELINE crawl_rows=6 admitted=${admittedIds.size} " +
      s"feed_rows=${feedRows.length} feed_bytes=${dirBytes(s"$root/feed")} " +
      s"table_bytes_before=$tableBytesBefore table_bytes=${dirBytes(s"$root/table")} " +
      s"postings_written=${pStats.writtenBytes} postings_state=${pStats.stateBytes} " +
      s"postings_buckets=${pStats.touchedBuckets}/${pStats.totalBuckets}")

    // STAGE 4: a second crawl that is ALL redeliveries — the whole
    // pipeline is a no-op: no dedup version, no lake version, no feed
    // rows, no postings commit
    val tableVersions = Merge.tableVersions(spark, s"$root/table").max
    dedup.admitBatch(crawl, 1L)
    val admitted2 = dedup.currentVerdicts().filter(col("batch_id") === 1L)
      .filter(col("verdict") === "new")
    assert(admitted2.isEmpty, "redelivered crawl must admit nothing")
    assert(Merge.tableVersions(spark, s"$root/table").max === tableVersions)
    assert(idx.currentVersion === 1L)

    // STAGE 5 (round-13): TAKEDOWN round trip — delete doc 601 and prove
    // NO tier returns it afterwards, with every write change-sized
    val delStats = cf.applyDelete(col("universeId") === 601L)
    assert(delStats.deletedRows === 1 && delStats.touchedBuckets === 1)
    // the lake: gone at the new version, intact at the pinned old one
    assert(Merge.readTable(spark, s"$root/table")
      .filter(col("universeId") === 601L).isEmpty)
    assert(!Merge.readTableAt(spark, s"$root/table", 1)
      .filter(col("universeId") === 601L).isEmpty)
    // the feed carries the delete op with its preimage
    val delFeed = cf.feed().filter(col("version") === delStats.version).collect()
    assert(delFeed.length === 1 && delFeed.head.getAs[String]("op") === "delete")
    assert(delFeed.head.getAs[String]("pre_name") === "game 601")
    // postings maintainer consumes it: bucket-pruned commit, the doc
    // stops serving (stale postings recomputed from the PREIMAGE text)
    val pDel = idx.applyFeedVersion(delStats.version).get
    assert(pDel.touchedBuckets < pDel.totalBuckets,
      s"takedown commit must be bucket-pruned: ${pDel.touchedBuckets}/${pDel.totalBuckets}")
    assert(idx.searchCurrent("freshalpha", 10).isEmpty,
      "a deleted doc must stop serving from the postings index")
    // other docs are untouched
    assert(idx.searchCurrent("freshdelta", 10).collect()
      .map(_.getLong(0)).toSeq === Seq(602L))
    // the IVM view absorbs the delete delta (−1 row, −f(pre)) and still
    // equals a direct recompute over the post-delete table
    val q2 = StreamingIvmView.startComplete(
      StreamingIvmView.deltaStream(
        StreamingIvmView.readFeed(spark, s"$root/feed", feedSchema)),
      "pipeline_ivm", s"$root/ivm-ckpt", Trigger.AvailableNow())
    assert(q2.awaitTermination(120000L))
    val served2 = StreamingIvmView.currentView(spark, ivmBase, "pipeline_ivm")
      .orderBy(col("shard")).collect().toSeq
    val recomputed2 = Merge.ivmBaseAgg(Merge.readTable(spark, s"$root/table")
      .drop("bucket", "gen")).orderBy(col("shard")).collect().toSeq
    assert(served2 === recomputed2, "served view diverges after the delete")
    // dedup admission state: the removed doc stops matching — its exact
    // text re-crawled under a new id is admitted as NEW again
    val dDel = dedup.removeDocs(Seq(601L).toDF("doc_id"),
      dedup.bandsVersions().max + 1).get
    assert(dDel.touchedBuckets > 0)
    val recrawl = docsDf(Seq(
      (701L, "freshalpha freshbeta freshgamma unique first new doc")))
    dedup.admitBatch(recrawl, dedup.bandsVersions().max)
    val v701 = dedup.currentVerdicts().filter(col("delta_id") === 701L)
      .select(col("verdict")).head().getString(0)
    assert(v701 === "new",
      "a taken-down doc's text must stop matching the admission state")
    println(s"TAKEDOWN lake_touched=${delStats.touchedBuckets} " +
      s"postings_buckets=${pDel.touchedBuckets}/${pDel.totalBuckets} " +
      s"postings_written=${pDel.writtenBytes} dedup_buckets=${dDel.touchedBuckets}")
  }
}
