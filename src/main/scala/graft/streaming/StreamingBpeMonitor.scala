package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Curation

/** Tokenizer-drift monitoring — the streaming face of `cur_bpe_fertility`.
  * A tokenizer is trained once (`index_build_bpe`) and then applied to a
  * corpus that keeps growing; the two numbers that tell a team their vocab
  * is going stale are FERTILITY (tokens per word — creeping up means the
  * corpus drifted away from the merges) and the OUT-OF-VOCABULARY rate
  * (words the stored vocab has never seen — new domains, new languages,
  * new slang). Both should be watched at ingest time, per source, not
  * discovered at the next training run.
  *
  * Design (the [[StreamingQualityFilter]] convention):
  *
  *   - the stream aggregates over the SAME `Curation.fertilityTokens`
  *     projection the batch query uses — exploded words LEFT-joined to the
  *     broadcast stored vocab — one expression tree, so the parity spec
  *     pins real equivalence, and an OOV word surfaces as a null token
  *     count instead of silently dropping (the reason the shared
  *     projection is a left join);
  *   - the vocab side is a STATIC frame (the committed `bpe-vocab`
  *     artifact): a stream-static broadcast join is stateless, so the only
  *     state is the COMPLETE-mode per-source aggregate — |sources| bounded
  *     rows forever, same as [[StreamingProfile]];
  *   - output per source: words seen, known-token total, OOV count, and
  *     the derived fertility over known words — each a sum/count, so the
  *     streamed report over any prefix equals the batch aggregate over the
  *     same rows (arrival-order-blind).
  */
object StreamingBpeMonitor {

  /** Document stream schema: the documents table plus arrival time. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType),
    StructField("ts", TimestampType)))

  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** The live per-source tokenizer report (state = one row per source):
    * n_words (all arrivals), n_tokens (known words only), n_oov. */
  def fertilityStream(docs: DataFrame, vocab: DataFrame): DataFrame =
    Curation.fertilityTokens(docs, vocab)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_tok")).as("n_tokens"),
        sum(when(col("n_tok").isNull, 1L).otherwise(0L)).as("n_oov"))

  def startMemorySink(out: DataFrame, name: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("500 milliseconds")): StreamingQuery =
    out.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
