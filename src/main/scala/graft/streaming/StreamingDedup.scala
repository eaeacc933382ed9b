package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming exact dedup — the continuous-ingest form of
  * [[graft.operators.Dedup.dedupExact]]. A crawler that re-sees documents
  * gets batch idempotence from anti-join re-runs (reference: the gather
  * pipeline's merge semantics); a STREAM of documents needs the same
  * guarantee online: emit each distinct content hash once, drop every
  * later arrival of the same content.
  *
  * Scale design: `dropDuplicatesWithinWatermark` keeps one state row per
  * content hash and EXPIRES it once the watermark passes the hash's
  * last-seen event time — state is O(distinct hashes per horizon), not
  * O(distinct hashes ever), which is what makes streaming dedup runnable
  * forever at crawl scale. The trade (re-admitting a duplicate that
  * returns after the horizon) is the documented semantics, and exactly
  * the re-crawl window a dedup-then-merge batch stage downstream absorbs.
  */
object StreamingDedup {

  /** Schema of the document stream: the documents table plus the arrival
    * (crawl) time the watermark runs on. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  /** readStream over a directory of parquet drops (file source). */
  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** First arrival per content hash within the watermark horizon. */
  def dedupStream(docs: DataFrame, horizon: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("text_hash")

  /** Launch into an in-memory sink (tests / local smoke); production
    * points writeStream at kafka/delta. Append mode — dedup emits each
    * survivor exactly once. The default trigger keeps the query live so
    * later file drops flow through the SAME dedup state (the memory sink
    * cannot recover a checkpoint across restarts). */
  def startMemorySink(out: DataFrame, name: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("500 milliseconds")): StreamingQuery =
    out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
