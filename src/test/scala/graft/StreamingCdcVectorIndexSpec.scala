package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Merge
import graft.streaming.{StreamingCdcVectorIndex, StreamingChangeFeed, SubCommitSchemeMismatch}

/** The ONE-INGEST-SPINE composition (round-14): the vector index
  * maintained off the lake's CDC feed — inserts become NSW insertions,
  * updates re-link (remove + re-insert: edges bind to vector values),
  * deletes cascade as remove + edge repair. The lake's version sequence
  * is the single source of truth for what the index serves. */
class StreamingCdcVectorIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("feed-driven index tracks the lake through inserts, updates, and takedowns") {
    val dropDir = Files.createTempDirectory("cvi-drops").toString
    val tableDir = Files.createTempDirectory("cvi-table").toString + "/vectors"
    val feedDir = Files.createTempDirectory("cvi-feed").toString
    val idxDir = Files.createTempDirectory("cvi-idx").toString
    val ckptW = Files.createTempDirectory("cvi-ckpt-w").toString
    val ckptI = Files.createTempDirectory("cvi-ckpt-i").toString

    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val initial = e.filter(col("vec_id") < 300)
    // drop a: pure inserts; drop b: inserts + an UPDATE of id 5's vector
    // (negated — the re-link must bind the graph to the NEW geometry)
    e.filter(col("vec_id") >= 300 && col("vec_id") < 400)
      .coalesce(1).write.parquet(s"$dropDir/a")
    e.filter(col("vec_id") >= 400)
      .unionByName(e.filter(col("vec_id") === 5L)
        .select(col("vec_id"), expr("transform(v, x -> -x)").as("v")))
      .coalesce(1).write.parquet(s"$dropDir/b")

    val cf = new StreamingChangeFeed(spark, tableDir, feedDir, initial,
      "vec_id", overwriteCols = Seq("v"), coalesceCols = Seq.empty,
      keepCols = Seq.empty, buckets = 16, retainVersions = 8)
    val vecSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vec_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    val stream = spark.readStream.schema(vecSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dropDir/*")
    cf.start(stream, ckptW).awaitTermination(240000L)

    val cvi = new StreamingCdcVectorIndex(spark, idxDir, initial)
    val feedSchema = cf.feed().drop("version").schema
    cvi.start(feedDir, feedSchema, ckptI).awaitTermination(240000L)

    // the index's vector set IS the lake's current table
    def lakeVecs() = Merge.readTable(spark, tableDir)
      .select(col("vec_id"), col("v")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def idxVecs() = cvi.currentVectors().collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val (lk, ix) = (lakeVecs(), idxVecs())
    assert(ix.keySet === lk.keySet, "index members == lake members")
    val orig5 = e.filter(col("vec_id") === 5L).head().getSeq[Double](1)
    assert(ix(5L) === lk(5L) && ix(5L) === orig5.map(x => -x),
      "the update re-linked id 5 under its NEW (negated) vector")
    // the re-inserted node is connected and never self-linked
    val edges5 = cvi.index.currentKnn().filter(col("src") === 5L)
      .select("dst").collect().map(_.getLong(0))
    assert(edges5.nonEmpty && !edges5.contains(5L))

    // TAKEDOWN: one lake delete cascades through the same feed — restart
    // the index query on the same checkpoint; it drains only the new
    // version
    val victim = 304L
    // through the key-based entry point: the compliance path a real
    // takedown request takes (Bloom-pruned find when fragments exist)
    cf.applyDeleteKeys("vec_id", Seq(victim))
    cvi.start(feedDir, feedSchema, ckptI).awaitTermination(240000L)
    assert(!idxVecs().keySet.contains(victim))
    assert(cvi.search().filter(col("neighbor_id") === victim).isEmpty,
      "a lake takedown must stop being served by the vector tier")
    // repair left nothing dangling
    val ids = cvi.currentVectors().select("vec_id")
      .collect().map(_.getLong(0)).toSet
    val dsts = cvi.index.currentKnn().select("dst")
      .collect().map(_.getLong(0)).toSet
    assert(dsts.subsetOf(ids), "no dangling adjacency after the cascade")

    // DELETE-THEN-REINSERT bundled into ONE index micro-batch (two lake
    // versions drained while the index query is down): the key's last op
    // is an insert, but it must still be REMOVED first or the insertion
    // anti-join keeps the stale pre-delete vector
    val bounced = 310L
    cf.applyDeleteKeys("vec_id", Seq(bounced))
    cf.applyBatch(e.filter(col("vec_id") === bounced)
      .select(col("vec_id"), expr("transform(v, x -> -x)").as("v")), 99L)
    cvi.start(feedDir, feedSchema, ckptI).awaitTermination(240000L)
    val bouncedVec = idxVecs()(bounced)
    assert(bouncedVec === e.filter(col("vec_id") === bounced)
      .head().getSeq[Double](1).map(x => -x),
      "a delete+reinsert bundle must serve the REINSERTED vector")
    assert(idxVecs().keySet === lakeVecs().keySet)
  }

  test("version-scheme guard: an undrained upgrade gets a named refusal, not a double-apply (round 17)") {
    val idxDir = Files.createTempDirectory("cvi-scheme").toString
    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val initial = e.filter(col("vec_id") < 100)
    val cvi = new StreamingCdcVectorIndex(spark, idxDir, initial)
    assert(StreamingCdcVectorIndex.recordedScheme(spark, idxDir) ===
      Some(StreamingCdcVectorIndex.SubCommitsPerBatch),
      "a fresh store records the scheme it is written under")

    // batch 0 carries a DELETE — the op whose replay is NOT idempotent
    // past the version guard (the deleted counter double-counts and the
    // rebuild dial fires early); apply it directly, which is exactly the
    // state after a crash BETWEEN the store commit and the checkpoint
    // commit: the store holds the batch, the checkpoint would replay it
    val batch = e.filter(col("vec_id") === 5L)
      .select(lit("delete").as("op"), col("vec_id"), col("v"),
        lit(1).as("version"))
      .unionByName(e.filter(col("vec_id") === 200L)
        .select(lit("insert").as("op"), col("vec_id"), col("v"),
          lit(1).as("version")))
    cvi.applyFeedBatch(batch, 0L)
    val (atBuild0, deleted0) = cvi.index.buildInfo()
    assert(deleted0 === 1L, "the delete landed once")

    // SAME-scheme replay (the crash-recovery path the guard must keep
    // working): versions re-derive identically, the store no-ops
    cvi.applyFeedBatch(batch, 0L)
    assert(cvi.index.buildInfo() === ((atBuild0, deleted0)),
      "a same-scheme replay is suppressed by the numeric version guard")

    // "UPGRADE": the store was written by a binary deriving 3 sub-commits
    // per batch (simulated by re-stamping the marker the old binary would
    // have left); the undrained checkpoint still holds batch 0. The new
    // binary must REFUSE to attach — under the wider scheme batch 0 would
    // replay at strictly larger versions and slip past the guard.
    val marker = java.nio.file.Paths.get(idxDir, "_subcommit_scheme")
    // drop the checksum sidecar the Hadoop local FS wrote for the stamp —
    // this simulation writes the marker bytes directly
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(idxDir, "._subcommit_scheme.crc"))
    java.nio.file.Files.write(marker, "3\n".getBytes("UTF-8"))
    val refusal = intercept[SubCommitSchemeMismatch] {
      new StreamingCdcVectorIndex(spark, idxDir, initial)
    }
    assert(refusal.getMessage.contains("Drain") &&
      refusal.getMessage.contains("acceptSchemeChange"),
      s"the refusal must name the recovery rule, got: ${refusal.getMessage}")
    // the refusal fired BEFORE any store access: nothing moved
    assert(cvi.index.buildInfo() === ((atBuild0, deleted0)))

    // drain acknowledged: the operator re-attaches explicitly, the marker
    // is re-stamped, and the maintainer works — including the replay
    // guard for post-drain batches
    val cvi2 = new StreamingCdcVectorIndex(spark, idxDir, initial,
      acceptSchemeChange = true)
    assert(StreamingCdcVectorIndex.recordedScheme(spark, idxDir) ===
      Some(StreamingCdcVectorIndex.SubCommitsPerBatch))
    val batch1 = e.filter(col("vec_id") === 201L)
      .select(lit("insert").as("op"), col("vec_id"), col("v"),
        lit(2).as("version"))
    cvi2.applyFeedBatch(batch1, 1L)
    assert(cvi2.currentVectors().filter(col("vec_id") === 201L).count() === 1L)
    cvi2.applyFeedBatch(batch1, 1L) // replay still no-ops
    assert(cvi2.index.buildInfo() === ((atBuild0, deleted0)),
      "post-drain replays stay suppressed")
  }
}
