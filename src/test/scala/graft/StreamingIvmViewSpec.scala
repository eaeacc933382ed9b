package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.operators.Merge
import graft.streaming.{StreamingChangeFeed, StreamingIvmView}

class StreamingIvmViewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cols = Seq("universeId", "rootPlaceId", "name", "description",
    "gameplayDescription", "playerCount")

  private def mk(rows: Seq[(Long, Long, String, Option[String], Option[String], Option[Long])]) =
    rows.toDF(cols: _*)

  test("the live view off the feed log equals the batch recompute, |shards| state") {
    val dropDir = Files.createTempDirectory("ivm-drops").toString
    val tableDir = Files.createTempDirectory("ivm-table").toString + "/games"
    val feedDir = Files.createTempDirectory("ivm-feed").toString
    val ckptW = Files.createTempDirectory("ivm-ckpt-w").toString
    val ckptV = Files.createTempDirectory("ivm-ckpt-v").toString

    val initial = mk((0L until 60L).map(id =>
      (id, id * 10, s"base-$id", Option.when(id % 3 == 0)(s"d$id"),
        Option.when(id % 4 == 0)(s"g$id"), Some(id % 7))))
    mk(Seq((3L, 31L, "three v2", Some("d3v2"), None, Some(9L)),
        (64L, 640L, "sixty-four", None, None, Some(100L))))
      .coalesce(1).write.parquet(s"$dropDir/a")
    mk(Seq((7L, 71L, "seven v2", None, None, Some(2L)),
        (11L, 111L, "eleven v2", None, None, None)))
      .coalesce(1).write.parquet(s"$dropDir/b")

    // writer + tail with preimages on (what view maintenance needs)
    val cf = new StreamingChangeFeed(spark, tableDir, feedDir, initial,
      "universeId", overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
      coalesceCols = Seq("description"), keepCols = Seq("gameplayDescription"),
      buckets = 16, feedPreimages = true)
    val stream = spark.readStream.schema(Schemas.game)
      .option("maxFilesPerTrigger", 1).parquet(s"$dropDir/*")
    cf.start(stream, ckptW).awaitTermination(120000L)
    assert(cf.emittedVersion === 2)

    // base = view creation over the snapshot the tail started at (v0)
    val base = Merge.ivmBaseAgg(Merge.readTableAt(spark, tableDir, 0)
      .selectExpr(cols: _*))

    // live view: file stream over the feed log, complete-mode deltas
    val feedSchema = cf.feed().drop("version").schema
    val q = StreamingIvmView.startComplete(
      StreamingIvmView.deltaStream(
        StreamingIvmView.readFeed(spark, feedDir, feedSchema)),
      "ivm_deltas", ckptV)
    q.processAllAvailable()
    try {
      // served view == the batch recompute over the final table
      val served = StreamingIvmView
        .currentView(spark, base, "ivm_deltas")
        .orderBy("shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = Merge.ivmBaseAgg(Merge.readTable(spark, tableDir)
          .selectExpr(cols: _*))
        .orderBy("shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(served.toSeq === want.toSeq,
        "live view diverges from the batch recompute")
      // the insert (key 64, playerCount 100) and the null-transition
      // update (11: 4 -> null) both flowed through the deltas
      val s4 = served.find(_._1 === 4L).get
      assert(s4._2 === 7L, "shard 4 gained the inserted key 64")
      // state is |shards|-bounded: the delta table holds at most 10 rows
      assert(spark.table("ivm_deltas").count() <= 10L)
    } finally q.stop()
  }

  test("min/max view: a takedown that evicts a shard extremum recomputes exactly (verdict r13 #6)") {
    val dropDir = Files.createTempDirectory("ivmm-drops").toString
    val tableDir = Files.createTempDirectory("ivmm-table").toString + "/games"
    val feedDir = Files.createTempDirectory("ivmm-feed").toString
    val ckptW = Files.createTempDirectory("ivmm-ckpt-w").toString
    val ckptV = Files.createTempDirectory("ivmm-ckpt-v").toString

    // base: playerCount = id % 7 (max 6); the crawl inserts key 64 with
    // playerCount 100 — shard 4's new maximum — and a later TAKEDOWN
    // deletes it, so the true max falls BACK to the base value: the case
    // a candidates-only view serves wrong (it would keep 100)
    val initial = mk((0L until 60L).map(id =>
      (id, id * 10, s"base-$id", Option.when(id % 3 == 0)(s"d$id"),
        Option.when(id % 4 == 0)(s"g$id"), Some(id % 7))))
    mk(Seq((64L, 640L, "sixty-four", None, None, Some(100L))))
      .coalesce(1).write.parquet(s"$dropDir/a")

    val cf = new StreamingChangeFeed(spark, tableDir, feedDir, initial,
      "universeId", overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
      coalesceCols = Seq("description"), keepCols = Seq("gameplayDescription"),
      buckets = 16, feedPreimages = true, retainVersions = 8)
    val stream = spark.readStream.schema(Schemas.game)
      .option("maxFilesPerTrigger", 1).parquet(s"$dropDir/*")
    cf.start(stream, ckptW).awaitTermination(120000L)
    val st = cf.applyDelete(col("universeId") === 64L)
    assert(st.deletedRows === 1)

    val base = Merge.ivmMinMaxBase(Merge.readTableAt(spark, tableDir, 0)
      .selectExpr(cols: _*))
    val feedSchema = cf.feed().drop("version").schema
    val q = StreamingIvmView.startComplete(
      StreamingIvmView.minMaxDeltaStream(
        StreamingIvmView.readFeed(spark, feedDir, feedSchema)),
      "ivm_mm_deltas", ckptV)
    q.processAllAvailable()
    try {
      val served = StreamingIvmView.currentMinMaxView(spark, base,
        "ivm_mm_deltas", cf.currentTable())
        .orderBy("shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val want = Merge.ivmMinMaxBase(Merge.readTable(spark, tableDir)
          .selectExpr(cols: _*))
        .orderBy("shard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(served.toSeq === want.toSeq,
        "served min/max view diverges from the batch recompute")
      // the takedown's eviction is visible: shard 4's max is back at the
      // base value, not the deleted crawl's 100
      assert(served.find(_._1 === 4L).get._2 === 6L)
      assert(spark.table("ivm_mm_deltas").count() <= 10L)
    } finally q.stop()
  }
}
