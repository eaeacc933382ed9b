package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, StructType}

/** ONE INGEST SPINE for the vector index (round-14; the round-13 backlog
  * item): the graph-ANN maintainer driven by the LAKE'S CHANGE FEED
  * instead of a raw vector stream — the same ordered, exactly-once,
  * preimage-bearing log that already feeds the postings index and the
  * IVM views:
  *
  *   crawl → [[StreamingChangeFeed]] (lake version + CDC drain)
  *     → feed log (`version=` parquet dirs)
  *       → postings ([[StreamingPostingsIndex]]) — text tier
  *       → IVM views ([[StreamingIvmView]]) — analytics tier
  *       → THIS — the vector-serving tier
  *
  * Why it matters at 100 TB: every maintainer consuming one log means
  * one ordering, one replay story, one takedown path — a delete commits
  * ONCE in the lake and cascades everywhere, instead of N bespoke ingest
  * pipes that can disagree about what exists.
  *
  * Feed semantics per micro-batch (a batch may bundle several lake
  * versions — the per-key LAST op by feed `version` wins):
  *   - `insert` → NSW insertion (search-then-connect, change-sized);
  *   - `update` → REMOVE + RE-INSERT: graph edges bind to vector VALUES,
  *     so a changed embedding must re-link (an in-place row update would
  *     leave the graph's geometry stale — the postings maintainer
  *     recomputes a doc's postings for the same reason);
  *   - `delete` → [[StreamingNswIndex.removeBatch]] + the round-14
  *     [[StreamingNswIndex.repairBatch]] edge repair, so sustained
  *     takedowns do not erode serve recall (TakedownRecallScale's
  *     measured cadence) — and the round-15 REBUILD POLICY: when the
  *     cumulative deleted fraction since the last full build crosses
  *     `rebuildAtDeletedFraction`, [[StreamingNswIndex.maybeRebuild]]
  *     retrains over the survivors from inside this same loop, so the
  *     serve tier's recall floor is a configuration even when every
  *     takedown arrives through the change feed.
  *
  * Exactly-once: versions are derived from the foreachBatch id
  * (4·id+1 remove, 4·id+2 insert, 4·id+3 repair, 4·id+4 policy
  * rebuild), and every commit is replay-guarded by the store — a
  * crashed batch re-applies only its missing sub-commits.
  *
  * UPGRADE CONSTRAINT — MECHANICALLY ENFORCED (round 17; was a
  * documented-only rule, ADVICE r15 #2 / verdict r16 #1): round 14
  * derived sub-versions as 3·id+k; round 15 widened to 4·id+k for the
  * rebuild slot. The replay guard compares versions NUMERICALLY, so a
  * checkpointed stream that crashed BETWEEN a store commit and its
  * checkpoint commit and is then upgraded replays that batch at strictly
  * larger versions — the guard no longer suppresses the re-application
  * (inserts stay id-idempotent through the anti-join, but a
  * delete-then-reinsert key would be re-removed and double-counted in
  * the buildinfo deleted counter, firing the rebuild dial early). The
  * store now RECORDS the scheme it was written under
  * (`_subcommit_scheme`, persisted at creation next to the store's
  * manifests) and the maintainer REFUSES to attach to a store recorded
  * under a different scheme ([[SubCommitSchemeMismatch]]) — the drain
  * rule is a refusal, not a footnote. Recovery: drain under the OLD
  * binary (Trigger.AvailableNow completes cleanly — the last batch's
  * checkpoint commits), then re-attach with
  * `acceptSchemeChange = true`, which re-stamps the marker; attaching
  * with a fresh store rebuild is always safe. Pre-guard stores carry no
  * marker and adopt the current scheme at first attach — the historical
  * 3→4 migration predates every store this code can meet, and all
  * FUTURE scheme changes get the mechanical refusal. */
class StreamingCdcVectorIndex(spark: SparkSession, indexDir: String,
    initial: DataFrame, key: String = "vec_id", vecCol: String = "v",
    keepVersions: Int = 4,
    rebuildAtDeletedFraction: Double = 0.5,
    acceptSchemeChange: Boolean = false,
    collapseStagger: Int = 0) extends Serializable {

  import StreamingCdcVectorIndex._

  // scheme gate BEFORE the store opens: a mismatched attach must not get
  // as far as reading (let alone committing) state
  checkOrStampScheme(spark, indexDir, acceptSchemeChange)

  val index = new StreamingNswIndex(spark, indexDir,
    initial.select(col(key).as("vec_id"), col(vecCol).as("v")),
    keepVersions = keepVersions,
    rebuildAtDeletedFraction = rebuildAtDeletedFraction,
    collapseStagger = collapseStagger)

  /** The feed log as a stream WITH its `version` partition column — the
    * vector tier needs per-key ordering (delete-then-insert vs
    * insert-then-delete differ), unlike the order-free IVM aggregation. */
  def readFeed(feedDir: String, feedSchema: StructType): DataFrame =
    spark.readStream
      .schema(StructType(feedSchema.fields :+
        org.apache.spark.sql.types.StructField("version", IntegerType)))
      .option("basePath", feedDir)
      .parquet(s"$feedDir/version=*")

  /** Apply one feed micro-batch. Idempotent under foreachBatch replay:
    * each sub-commit's version is derived from `batchId` and the store
    * no-ops on already-committed versions. */
  def applyFeedBatch(batch: Dataset[Row], batchId: Long): Unit = {
    if (batch.isEmpty) return
    // a batch may bundle several drained versions: the key's LAST op (by
    // feed version) decides its final state, but a key whose bundle
    // contains ANY departure (delete or update at any version) must be
    // REMOVED first — a delete-then-reinsert bundle classified by its
    // last op alone would neither remove nor insert (the insertion
    // anti-join sees the key as already present) and serve the stale
    // pre-delete vector forever
    val df = batch.toDF()
    val w = Window.partitionBy(col(key)).orderBy(desc("version"))
    val last = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val removed = df.filter(col("op") === "delete" || col("op") === "update")
      .select(col(key).as("vec_id")).distinct()
    val upserts = last.filter(col("op") =!= "delete")
      .select(col(key).as("vec_id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
    val anyRemoved = !removed.isEmpty
    if (anyRemoved)
      index.removeBatch(removed, SubCommitsPerBatch * batchId + 1)
    if (!upserts.isEmpty) // commits at SubCommitsPerBatch·id+2
      index.insertBatch(upserts, SubCommitsPerBatch * batchId + 1)
    // repair only when something departed — a pure-insert batch has no
    // dangling edges to find, and the detection scan is not free
    if (anyRemoved) {
      index.repairBatch(SubCommitsPerBatch * batchId + 3)
      // the rebuild dial: a cheap driver-side counter read per
      // departure-bearing batch; retrains only when crossed
      index.maybeRebuild(SubCommitsPerBatch * batchId + 4)
    }
  }

  def start(feedDir: String, feedSchema: StructType,
      checkpointDir: String): StreamingQuery =
    readFeed(feedDir, feedSchema).writeStream
      .foreachBatch((b: Dataset[Row], id: Long) => applyFeedBatch(b, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  def search(): DataFrame = index.search()
  def currentVectors(): DataFrame = index.currentVectors()
}

object StreamingCdcVectorIndex {

  /** Store-version slots one foreachBatch id expands into (remove /
    * insert / repair / policy rebuild). CHANGING THIS IS A VERSION-SCHEME
    * CHANGE: the store's `_subcommit_scheme` marker records the value it
    * was written under, and [[checkOrStampScheme]] refuses a mismatched
    * attach — see the class scaladoc's upgrade constraint. */
  val SubCommitsPerBatch: Int = 4

  /** The scheme the store at `indexDir` was written under; None for a
    * fresh (or pre-guard) store. Delegates to the shared guard
    * ([[SubCommitScheme]] — round 18 hoisted the round-17 mechanism so
    * every batchId-deriving maintainer stamps, not just this one). */
  private[graft] def recordedScheme(
      spark: SparkSession, indexDir: String): Option[Int] =
    SubCommitScheme.recorded(spark, indexDir)

  /** The mechanical upgrade guard — see [[SubCommitScheme.checkOrStamp]]
    * (hoisted round 18; the refusal semantics are round 17's). */
  private[graft] def checkOrStampScheme(
      spark: SparkSession, indexDir: String, accept: Boolean): Unit =
    SubCommitScheme.checkOrStamp(spark, indexDir, SubCommitsPerBatch,
      accept, "vector-index")
}
