package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Watermarked per-window quantile sketches — the APPEND-mode member of
  * the streaming sketch family. The complete-mode twins
  * ([[StreamingQuantiles]], [[StreamingCms]], [[StreamingKmvSetOps]])
  * hold one live sketch forever; this one tracks percentiles per EVENT-
  * TIME window: the same `Events.windowSketchAgg` expression the
  * oracle-checked batch query aggregates with, run under a watermark in
  * append mode, so each daily window's bottom-k sample finalizes when
  * the watermark passes its end, emits exactly once, and its k-row
  * buffer EVICTS from the state store. State is O(k · active windows ×
  * types) no matter how long the stream runs — the "p50/p90 latency per
  * window, forever" query a monitoring pipeline actually deploys —
  * and because selection is hash-determined, every emitted sample is
  * IDENTICAL to the batch build over that window.
  */
object StreamingWindowedQuantiles {

  /** The watermarked per-(window, type) sample stream — shares the
    * aggregation expression with the batch `ev_window_quantiles`. */
  def samplesAppend(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    graft.operators.Events.windowSketchAgg(
      events.withWatermark("ts", watermark))

  def startAppend(out: DataFrame, name: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("500 milliseconds")): StreamingQuery =
    out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()

  /** Production shape: append finalized window samples to a parquet sink,
    * whose `_spark_metadata` transaction log makes emission exactly-once
    * across crashes — a replayed micro-batch's files are never re-listed
    * (StreamingRecoverySpec pins this through the commit-log crash
    * window). */
  def startAppendParquet(out: DataFrame, path: String,
      checkpointDir: String): StreamingQuery =
    out.writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
