package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming face of the engine. The reference has no streaming
  * (SURVEY §2.9) — its "incremental" behavior is idempotent batch re-runs —
  * so this module is the forward-looking path: the SAME aggregations the
  * batch `Events` operators declare, run as an unbounded query with
  * watermarked event time.
  *
  * Scale design: file-source micro-batches discover new parquet
  * incrementally; the windowed aggregate keeps per-(window,type) state that
  * the 10-minute watermark bounds and evicts, so state size is
  * O(active windows × types), independent of stream length.
  */
object EventsStream {

  /** Schema of the events stream (ts pre-converted to TIMESTAMP). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** readStream over a directory of parquet drops (file source). */
  def readEvents(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Watermarked tumbling-window aggregation — the streaming twin of
    * graft.operators.Events.windowAgg. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Launch into an in-memory sink (tests / local smoke); production would
    * point writeStream at kafka/delta with a real checkpoint location. */
  def startMemorySink(agg: DataFrame, name: String, checkpointDir: String): StreamingQuery =
    agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
