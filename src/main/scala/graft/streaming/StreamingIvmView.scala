package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.Merge

/** Live INCREMENTAL VIEW MAINTENANCE — the streaming face of
  * `j1_merge_ivm`, and the last stage of the lake's CDC chain:
  *
  *   StreamingChangeFeed (writer + tail, `feedPreimages = true`)
  *     → feed log (`version=` parquet dirs)
  *       → this view (file stream over the log → complete-mode delta agg)
  *
  * The feed log IS a streamable source: each drained version lands as an
  * immutable `version=v` dir, so a parquet file stream over the log
  * discovers new versions as they commit — no coupling to the writer
  * beyond the directory. The view is served as base ⊕ cumulative deltas:
  * the base aggregate is paid ONCE (view creation over the snapshot the
  * tail started at), and the running aggregation folds every feed row
  * through the SAME [[Merge.ivmDeltaAgg]] expression tree the batch
  * refresh uses (the StreamingProfile shared-tree convention), holding
  * exactly |shards| state rows forever. At 100 TB: the table scan
  * happens once; every refresh after is change-proportional, and any
  * number of downstream views can tail the same log without touching
  * the table at all.
  */
object StreamingIvmView {

  /** The feed log as a stream. `feedSchema` = the feed's columns WITHOUT
    * the `version` partition column (take `feed().drop("version").schema`
    * from the writer, or construct it); the glob skips `_EMITTED`. */
  def readFeed(spark: SparkSession, feedDir: String, feedSchema: StructType): DataFrame =
    spark.readStream.schema(feedSchema).parquet(s"$feedDir/version=*")

  /** Complete-mode running deltas — shared tree with the batch refresh. */
  def deltaStream(feed: DataFrame): DataFrame = Merge.ivmDeltaAgg(feed)

  def startComplete(out: DataFrame, name: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("500 milliseconds")): StreamingQuery =
    out.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** The served view: creation-time base ⊕ the memory sink's current
    * cumulative deltas. */
  def currentView(spark: SparkSession, base: DataFrame, deltaTable: String): DataFrame =
    Merge.ivmApply(base, spark.table(deltaTable))

  /** MIN/MAX twin (round-13 verdict #6): the same candidates/evictions
    * expression tree as the batch fold ([[Merge.ivmMinMaxDelta]]), run in
    * complete mode over the CUMULATIVE feed — still |shards| state rows.
    * The algebra is cumulative-safe: any departed candidate surfaces in
    * the eviction extrema, so the serve-time dirty test catches it. */
  def minMaxDeltaStream(feed: DataFrame): DataFrame = Merge.ivmMinMaxDelta(feed)

  /** Served min/max view: clean shards = base ⊕ candidates (no table
    * I/O); shards whose cumulative feed ever evicted a reigning extremum
    * recompute from the CURRENT table, restricted to them — the per-group
    * non-invertible-aggregate fallback, paid only at serve time and only
    * for dirty groups. */
  def currentMinMaxView(spark: SparkSession, base: DataFrame,
      deltaTable: String, tableNow: DataFrame): DataFrame =
    Merge.ivmMinMaxApply(base, spark.table(deltaTable), tableNow)
}
