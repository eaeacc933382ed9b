package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Merge

/** Streaming lake writer + CHANGE-DATA-FEED tail over the
  * manifest-committed incremental table ([[graft.operators.Merge]]): each
  * micro-batch of fresh rows is merge-upserted as a new table version
  * through `Merge.upsertRound`, and after every commit the tail DRAINS the
  * new versions' change feeds — `Merge.readChanges(v-1, v)` per version —
  * into an append-only feed log that downstream consumers (index
  * maintainers, replicas, audit) read instead of re-diffing the table.
  * This is the streaming face of `j1_merge_changes`, exactly as
  * StreamingPostingsIndex is the streaming face of the postings artifact.
  *
  * Exactly-once is layered, cheapest mechanism first:
  *
  *   - '''Feed emission is idempotent by layout.''' Each version's rows
  *     land at `feedDir/version=v` with `SaveMode.Overwrite`, and the
  *     `_EMITTED` pointer advances (temp + rename) only after the write —
  *     a crash between the two re-emits the SAME rows over themselves.
  *   - '''Batch replay is absorbed by merge idempotence.''' A
  *     `foreachBatch` replay re-merges rows the table already holds:
  *     overwrite takes the same values, coalesce sees the same non-nulls,
  *     keep reads the already-merged side — so the duplicate version is
  *     CONTENT-IDENTICAL and its change feed is EMPTY (readChanges'
  *     null-safe compare drops every row). Consumers observe
  *     exactly-once without any writer-side dedup bookkeeping;
  *     the spec pins the empty re-feed.
  *
  * Scale: the drain prices changes, not the table — readChanges opens
  * only the manifest-diff buckets (SCALING.md "CDC reads price the
  * changes"), and the feed log grows with changed rows. The writer's
  * `retainVersions` must cover the drain lag (a crashed drain catches up
  * on the next batch), hence the `>= 2` floor; versions older than the
  * window VACUUM as usual once drained.
  *
  * `feedPreimages = true` drains the feed WITH `pre_<c>` preimage
  * columns — what a downstream incremental view (StreamingIvmView)
  * needs to compute update deltas without re-reading the table.
  */
class StreamingChangeFeed(
    spark: SparkSession, tablePath: String, feedDir: String,
    initial: DataFrame, key: String,
    overwriteCols: Seq[String], coalesceCols: Seq[String], keepCols: Seq[String],
    buckets: Int, retainVersions: Int = 4,
    feedPreimages: Boolean = false) extends Serializable {
  require(retainVersions >= 2,
    s"retainVersions must be >= 2 so the drain can read v-1, got $retainVersions")

  @transient private lazy val fs = new Path(feedDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private def emittedPointer = new Path(feedDir, "_EMITTED")

  // bootstrap v0 from the initial snapshot if the table has no committed
  // manifest yet; pre-existing history is NOT re-fed (the pointer starts
  // at the version the tail first observes)
  if (Merge.tableVersions(spark, tablePath).isEmpty) {
    Merge.upsertIncrementalRounds(spark, tablePath, initial, Seq.empty, key,
      overwriteCols, coalesceCols, keepCols, buckets,
      retainVersions = retainVersions)
  }
  if (!fs.exists(emittedPointer))
    writeEmitted(Merge.tableVersions(spark, tablePath).max)

  /** The retention the next sweep will ACTUALLY enforce — the writer's
    * dial clamped by the table's persisted takedown-grace policy
    * (round 14): the drain-lag backpressure guard must budget against
    * this, or a grace persisted by any past delete would let undrained
    * versions expire and wedge the feed. Re-read per commit — a delete
    * may persist a grace at any version. */
  private def effectiveRetain: Int = {
    val eff = Merge.effectiveRetention(spark, tablePath, retainVersions)
    // fail fast BEFORE minting a version (the guard runs first): a grace
    // of 0 clamps retention to 1, the drain can never read v-1, and every
    // batch would commit a version whose changes are immediately
    // unrecoverable — the exact wedge-with-loss this guard exists to
    // prevent. Grace 0 is valid for plain lake tables (immediate physical
    // takedown, MergeSpec-pinned); a CDC-fed table needs grace >= 1.
    require(eff >= 2,
      s"the table's persisted takedownGrace clamps retention to $eff (< 2): " +
        "a change feed needs v-1 readable to drain v — use " +
        "takedownGraceVersions >= 1 on CDC-fed tables, or re-baseline " +
        "consumers from a snapshot")
    eff
  }

  /** Last version whose feed is fully emitted (committed pointer). */
  def emittedVersion: Int = {
    val in = fs.open(emittedPointer)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
    finally in.close()
  }

  private def writeEmitted(v: Int): Unit = {
    val tmp = new Path(feedDir, "_EMITTED.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(emittedPointer, false)
    require(fs.rename(tmp, emittedPointer), s"pointer commit failed: $emittedPointer")
  }

  /** Emit every committed-but-undrained version's changes to the feed
    * log, one `version=v` dir per version, pointer last. Re-entrant and
    * crash-safe: per-version Overwrite + pointer-after-data means any
    * prefix of a crashed drain is simply redone. */
  def drainFeed(): Unit = {
    val retained = Merge.tableVersions(spark, tablePath)
    val current = retained.max
    val emitted = emittedVersion
    // each drain step reads readChanges(v-1, v), so version `emitted` must
    // still be retained; if retention has overtaken the drain lag the feed
    // has LOST changes and retrying forever would just wedge (ADVICE r11
    // #3) — fail with the recovery options instead
    if (emitted < current && !retained.contains(emitted))
      sys.error(
        s"change feed at $feedDir has fallen behind retention: last emitted " +
          s"version $emitted is expired (retained: ${retained.mkString(",")}). " +
          s"Changes between $emitted and ${retained.min} are unrecoverable from " +
          "the log — re-baseline consumers from a table snapshot " +
          "(Merge.readTable) and reset _EMITTED to the snapshot version, or " +
          "raise retainVersions so it covers the worst-case drain lag.")
    ((emitted + 1) to current).foreach { v =>
      Merge.readChanges(spark, tablePath, v - 1, v, key,
          withPreimage = feedPreimages)
        .write.mode(SaveMode.Overwrite).parquet(s"$feedDir/version=$v")
      writeEmitted(v)
    }
  }

  /** The emitted feed log: every change row with its `version` column —
    * what a downstream consumer tails. */
  def feed(): DataFrame = {
    val versions = fs.listStatus(new Path(feedDir)).map(_.getPath.getName)
      .filter(_.startsWith("version=")).sorted
    val paths = versions.map(v => s"$feedDir/$v")
    require(paths.nonEmpty, s"no feed versions emitted under $feedDir yet")
    spark.read.option("basePath", feedDir).parquet(paths.toIndexedSeq: _*)
  }

  /** Merge one micro-batch as a new table version, then drain. Empty
    * batches commit nothing (no version burned, nothing to feed).
    *
    * Backpressure guard (ADVICE r11 #3): a crashed post-commit drain leaves
    * the table one version ahead of the feed, and each retry used to mint
    * ANOTHER version — after `retainVersions - 1` consecutive failures the
    * un-drained manifests would be vacuumed and the feed permanently
    * wedged. Minting now refuses once the next version would push the
    * drain lag past what retention covers: the batch fails WITHOUT burning
    * a version, the already-committed versions drain on the next attempt
    * (drainFeed is re-entrant), and no change is ever lost. */
  def applyBatch(batch: Dataset[Row], batchId: Long): Unit = {
    if (!batch.isEmpty) {
      val next = Merge.tableVersions(spark, tablePath).max + 1
      if (next - emittedVersion > effectiveRetain - 1)
        drainFeed() // catch up in place; throws only if retention already lost versions
      Merge.upsertRound(spark, tablePath, batch.toDF(), key,
        overwriteCols, coalesceCols, keepCols, buckets,
        retainVersions = retainVersions)
      drainFeed()
    }
  }

  /** TAKEDOWN entry point (round-13): [[Merge.deleteWhere]] as a new table
    * version, drained like any other — the feed carries the removed rows
    * as `op = delete` with null post-images (and preimages when the feed
    * is drained with them), which is exactly what the maintainer tier
    * consumes to cascade the takedown with zero state scans. A no-match
    * delete burns no version and feeds nothing. Call it from the same
    * single-writer loop as the merge batches (between triggers, or as a
    * control event in the ingest stream) — the lake's version sequence is
    * one axis. */
  def applyDelete(predicate: org.apache.spark.sql.Column): Merge.DeleteStats = {
    val next = Merge.tableVersions(spark, tablePath).max + 1
    if (next - emittedVersion > effectiveRetain - 1)
      drainFeed()
    val st = Merge.deleteWhere(spark, tablePath, predicate,
      retainVersions = retainVersions)
    drainFeed()
    st
  }

  /** KEY-BASED takedown (round-14): [[Merge.deleteKeys]] — the find phase
    * is served through the table's Bloom fragments when present, so a
    * takedown request names its touched buckets without scanning the
    * table. Same version axis and drain discipline as [[applyDelete]]. */
  def applyDeleteKeys(column: String, values: Seq[Long]): Merge.DeleteStats = {
    val next = Merge.tableVersions(spark, tablePath).max + 1
    if (next - emittedVersion > effectiveRetain - 1)
      drainFeed()
    val st = Merge.deleteKeys(spark, tablePath, column, values,
      retainVersions = retainVersions)
    drainFeed()
    st
  }

  def currentTable(): DataFrame = Merge.readTable(spark, tablePath)

  /** Attach to a stream of fresh rows. */
  def start(freshStream: DataFrame, checkpointDir: String): StreamingQuery =
    freshStream.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) => applyBatch(batch, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
