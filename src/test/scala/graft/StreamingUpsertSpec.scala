package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Schemas
import graft.streaming.StreamingUpsert

class StreamingUpsertSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("micro-batched gather stream merges into versioned snapshots") {
    val dropDir = Files.createTempDirectory("graft-drops").toString
    val snapDir = Files.createTempDirectory("graft-snaps").toString
    val ckptDir = Files.createTempDirectory("graft-ckpt2").toString

    val initial = Seq(
      (1L, 10L, "one", Some("desc1"), Some("gp1"), Some(5L)),
      (2L, 20L, "two", Some("desc2"), None: Option[String], None: Option[Long])
    ).toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount")

    // two file drops with DISJOINT keys so micro-batch order can't matter:
    // drop A updates game 2, drop B inserts games 4 and 5
    Seq((2L, 21L, "two v2", Option.empty[String], Option.empty[String], Option.empty[Long]))
      .toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount")
      .coalesce(1).write.parquet(s"$dropDir/a")
    Seq((4L, 40L, "four", Option.empty[String], Option.empty[String], Option.empty[Long]),
        (5L, 50L, "five", Option.empty[String], Option.empty[String], Option.empty[Long]))
      .toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount")
      .coalesce(1).write.parquet(s"$dropDir/b")

    // keepVersions=1: retention must prune superseded snapshots BETWEEN
    // micro-batches without disturbing the serving path
    val upsert = new StreamingUpsert(spark, snapDir, initial, keepVersions = 1)
    val stream = spark.readStream
      .schema(Schemas.game)
      .option("maxFilesPerTrigger", 1) // one drop per micro-batch
      .parquet(s"$dropDir/*")
    val q = upsert.start(stream, ckptDir)
    q.awaitTermination(120000L)

    val fin = upsert.currentSnapshot().orderBy("universeId").collect()
    assert(fin.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 5L))
    val two = fin(1)
    assert(two.getString(2) === "two v2")        // name overwritten
    assert(two.getLong(1) === 21L)               // rootPlaceId overwritten
    assert(two.getString(3) === "desc2")         // enrichment preserved
    assert(fin(0).getString(2) === "one")        // untouched row intact

    // retention: with keepVersions=1 only the final snapshot survives
    // (initial v0 + two batches → v1, v2; v0 and v1 pruned mid-stream)
    val survivors = new java.io.File(snapDir).list().toSeq
      .filter(_.startsWith("snapshot-v")).sorted
    assert(survivors === Seq("snapshot-v2"))
  }
}
