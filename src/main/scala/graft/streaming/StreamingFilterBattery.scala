package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Filtering

/** The whole map-only half of the filter battery, running CONTINUOUSLY —
  * the streaming counterpart of `flt_gopher_repetition`, `flt_pii_redact`
  * and `flt_c4_heuristics` (the quality half already streams via
  * [[StreamingQualityFilter]]). A crawler never delivers a corpus, it
  * delivers a stream; every per-document rule that is a stateless
  * projection should apply at ingest time rather than waiting for the
  * nightly batch — redacting PII BEFORE the bytes land in the lake is the
  * difference between a scrub and an incident.
  *
  * Design (the [[StreamingQualityFilter]] convention):
  *   - each stream applies the SAME `private[graft]` projection the batch
  *     query uses (`Filtering.repetitionProjection` / `piiProjection` /
  *     `c4Projection`) — one expression tree, not a streaming copy, so the
  *     streaming ≡ batch parity spec pins real equivalence;
  *   - all three are STATELESS (append mode, no watermark, no state
  *     store): per-row cost is identical to the batch plan, so at crawl
  *     scale the battery runs at parquet-scan speed forever. The two
  *     non-map-only filters are exactly the ones NOT here: `flt_line_dedup`
  *     needs cross-document line counts (streamable only with a stateful
  *     recurrence sketch) and `flt_lm_perplexity` needs corpus-wide tercile
  *     cutoffs (a trained-model broadcast in a real deployment).
  */
object StreamingFilterBattery {

  /** Document stream schema: the documents table plus arrival time. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Gopher repetition metrics + keep flag, per arriving document. */
  def repetitionStream(docs: DataFrame): DataFrame =
    Filtering.repetitionProjection(docs)

  /** PII audit counts + redacted-text fingerprint, per arriving document
    * that contained any identifier (the batch query's same filter). */
  def piiStream(docs: DataFrame): DataFrame =
    Filtering.piiProjection(docs)

  /** C4 line/page rules + keep flag, per arriving document. */
  def c4Stream(docs: DataFrame): DataFrame =
    Filtering.c4Projection(docs)

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
