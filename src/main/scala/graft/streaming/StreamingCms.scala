package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Sketches

/** Continuous heavy-hitter tracking — the streaming twin of
  * `q_cms_heavy_hitters`. Frequency monitoring over an unbounded token /
  * domain / user-agent stream is the canonical case where exact streaming
  * aggregation dies: `groupBy(token).count()` state grows with the
  * VOCABULARY, which a crawl never stops growing. The count-min sketch
  * inverts that: the stream updates a fixed d×w counter table
  * (`Sketches.cmsCellsOn` — the SAME expression tree the oracle-checked
  * batch query uses), so state is bounded by the sketch size — 1024 cells
  * here — no matter how long the stream runs or how wide the vocabulary
  * gets. No watermark, no eviction dial: the bound is structural.
  *
  * The cells run in COMPLETE output mode (legitimate precisely because
  * the aggregate is sketch-sized — complete mode over an unbounded-key
  * aggregation would be the bug this module exists to avoid), so the sink
  * always holds the live sketch; any consumer answers point-frequency
  * queries from it with the same min-over-rows estimator, and sketches
  * from parallel streams merge by cell-wise addition.
  */
object StreamingCms {

  /** Document stream schema: the documents table plus arrival time. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  def tokens(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), "\\s+")).as("tok"))

  /** The live d×w counter table (state = sketch size, structurally). */
  def cellsStream(docs: DataFrame): DataFrame =
    Sketches.cmsCellsOn(tokens(docs))

  def startComplete(out: DataFrame, name: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("500 milliseconds")): StreamingQuery =
    out.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
