package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Merge

/** Streaming ingestion of game snapshots: each micro-batch of freshly
  * gathered rows is merge-upserted (J1 policy) into a VERSIONED snapshot —
  * `foreachBatch` is the escape hatch that lets an arbitrary batch
  * transform (here the full-outer merge) run per micro-batch.
  *
  * Snapshots live in [[VersionedState]]: immutable parquet versions at
  * batchId-derived numbers with an atomic commit pointer (retry-safe, and
  * a restarted writer resumes from it) and keep-last-K retention — the
  * same copy-on-write + commit-pointer shape Delta/Iceberg implement
  * natively; on a lakehouse this whole class collapses to
  * `foreachBatch(MERGE INTO games USING batch ...)`.
  */
class StreamingUpsert(spark: SparkSession, baseDir: String, initial: DataFrame,
    keepVersions: Int = 3) extends Serializable {

  private val state = new VersionedState(spark, baseDir, keepVersions)
  if (state.latest.isEmpty) state.commit(0L, Map("snapshot" -> initial))

  def currentSnapshot(): DataFrame = state.read("snapshot")

  /** J1 merge of one micro-batch into the latest snapshot. A batch whose
    * version is already committed (replay) is a no-op. */
  def mergeBatch(batch: Dataset[Row], batchId: Long): Unit = {
    val target = batchId + 1
    if (state.latest.exists(_ >= target)) return
    if (!batch.isEmpty) {
      val merged = Merge.mergeUpsert(
        currentSnapshot(), batch.toDF(), "universeId",
        overwriteCols = Seq("rootPlaceId", "name"),
        coalesceCols = Seq.empty,
        keepCols = Seq("description", "gameplayDescription", "playerCount"))
      state.commit(target, Map("snapshot" -> merged))
    }
  }

  /** Attach to a stream of fresh game rows; one file per micro-batch
    * (version = batchId + 1 — scheme factor 1, stamped at attach so any
    * future widening gets the [[SubCommitScheme]] refusal — round 18). */
  def start(freshStream: DataFrame, checkpointDir: String,
      acceptSchemeChange: Boolean = false): StreamingQuery = {
    SubCommitScheme.checkOrStamp(spark, baseDir, 1, acceptSchemeChange,
      "streaming-upsert")
    freshStream.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) => mergeBatch(batch, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
