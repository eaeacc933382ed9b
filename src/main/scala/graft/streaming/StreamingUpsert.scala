package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Merge

/** Streaming ingestion of game snapshots: each micro-batch of freshly
  * gathered rows is merge-upserted (J1 policy) into a VERSIONED snapshot —
  * `foreachBatch` is the escape hatch that lets an arbitrary batch
  * transform (here the full-outer merge) run per micro-batch.
  *
  * Snapshots are immutable parquet versions (v0, v1, ...) with the latest
  * pointer advanced after each successful write — the same
  * copy-on-write + commit-pointer shape Delta/Iceberg implement natively;
  * on a lakehouse this whole class collapses to
  * `foreachBatch(MERGE INTO games USING batch ...)`.
  */
class StreamingUpsert(spark: SparkSession, baseDir: String, initial: DataFrame)
    extends Serializable {

  @volatile private var currentVersion: Int = 0
  initial.write.parquet(s"$baseDir/v0")

  def currentSnapshot(): DataFrame = spark.read.parquet(s"$baseDir/v$currentVersion")

  /** J1 merge of one micro-batch into the latest snapshot. */
  def mergeBatch(batch: Dataset[Row], batchId: Long): Unit = {
    if (!batch.isEmpty) {
      val merged = Merge.mergeUpsert(
        currentSnapshot(), batch.toDF(), "universeId",
        overwriteCols = Seq("rootPlaceId", "name"),
        coalesceCols = Seq.empty,
        keepCols = Seq("description", "gameplayDescription", "playerCount"))
      val next = currentVersion + 1
      merged.write.parquet(s"$baseDir/v$next")
      currentVersion = next
    }
  }

  /** Attach to a stream of fresh game rows; one file per micro-batch. */
  def start(freshStream: DataFrame, checkpointDir: String): StreamingQuery =
    freshStream.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) => mergeBatch(batch, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
