package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.OracleParity.pround

/** Streaming quality filtering — the continuous-ingest form of the Gopher
  * battery ([[graft.operators.Filtering.gopherQuality]]). A crawler feeds
  * documents as they arrive; the filter must (a) pass survivors through
  * with their metrics attached and (b) surface QUALITY DRIFT — a
  * collapsing keep-rate is how a bad crawl source, a parser regression,
  * or a spam wave first becomes visible, and waiting for the nightly
  * batch job to notice is the failure mode this module removes.
  *
  * Design:
  *   - the metric expressions are SHARED with the batch operator
  *     (`Filtering.withQualityMetrics`) — the parity test asserts
  *     streaming ≡ batch on identical documents, which is only a real
  *     guarantee because there is one projection, not two copies;
  *   - the pass-through is stateless (map-only, append mode) — per-row
  *     cost identical to the batch plan, no state store at all;
  *   - the keep-rate monitor is a watermarked tumbling-window aggregate:
  *     state is O(open windows), expired by the watermark, so the
  *     monitor runs forever at crawl scale.
  */
object StreamingQualityFilter {

  /** Document stream schema: the documents table plus arrival time. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Survivors with metrics attached — stateless, append-safe. */
  def filterStream(docs: DataFrame): DataFrame =
    graft.operators.Filtering.withQualityMetrics(docs, col("text"))
      .filter(col("keep") === 1L)
      .drop("text")

  /** Per-window ingest quality: arrivals, survivors, 4dp keep rate.
    * Watermarked so window state expires; append mode emits each window
    * once the watermark passes it (the alerting consumer's contract). */
  def keepRateStream(docs: DataFrame, window_ : String = "1 minute",
      horizon: String = "2 minutes"): DataFrame =
    graft.operators.Filtering.withQualityMetrics(docs, col("text"))
      .withWatermark("ts", horizon)
      .groupBy(window(col("ts"), window_))
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_kept"))
      .select(col("window.start").as("win_start"),
        col("n_docs"), col("n_kept"),
        pround(col("n_kept").cast("double") / col("n_docs"), 4).as("keep_rate"))

  def startMemorySink(out: DataFrame, name: String, checkpointDir: String,
      outputMode: String = "append",
      trigger: Trigger = Trigger.ProcessingTime("500 milliseconds")): StreamingQuery =
    out.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
