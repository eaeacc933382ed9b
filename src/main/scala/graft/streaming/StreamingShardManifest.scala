package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Curation

/** Live shard-manifest maintenance — the streaming face of
  * `cur_shard_manifest`. As documents arrive, the per-shard counts and
  * the xor content fingerprint advance continuously, so the
  * reproducibility contract a trainer validates is ready the moment
  * ingest finishes instead of requiring a corpus-wide pass afterward.
  *
  * Works BECAUSE the batch manifest was designed mergeable: every column
  * (count, sum, min, max, bit_xor) is commutative/associative, so the
  * identical aggregation ([[Curation.manifestAgg]] over
  * [[Curation.manifestRows]] — shared expression trees, the
  * StreamingProfile convention) runs in complete mode with exactly
  * |shards| rows of state, and the streamed report over any ingested
  * prefix EQUALS the batch manifest of that prefix, arrival order
  * irrelevant. An order-dependent md5-chain fingerprint could not have
  * streamed this way — the design trade the batch scaladoc records.
  */
object StreamingShardManifest {

  /** Documents-shaped stream: what the manifest reads. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** The live manifest: |shards| bounded state rows. */
  def manifestStream(docs: DataFrame): DataFrame =
    Curation.manifestAgg(Curation.manifestRows(docs))

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
