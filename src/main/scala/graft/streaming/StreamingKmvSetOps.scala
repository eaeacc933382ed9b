package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Continuous set-overlap monitoring — the streaming twin of
  * `q_kmv_set_ops`. "How much does the incoming crawl overlap the corpus
  * we already have" is a question a 100 TB ingest wants answered
  * continuously, and exact streaming set intersection is unbounded-state
  * by definition (it must remember every key seen on both sides). The
  * KMV/Theta sketches invert that: the stream maintains ONE
  * `KmvValues` buffer per side — ≤ k hashes each, merged by the same
  * order-independent sorted-merge-and-trim the batch query shuffles —
  * so state is two sketch-sized rows forever, and every micro-batch the
  * sink holds sketches IDENTICAL to the batch build over the same
  * prefix (hash selection is arrival-order-blind).
  *
  * Runs in COMPLETE output mode (legitimate precisely because the
  * aggregate is two bounded buffers); union / intersection / Jaccard
  * estimates are read off the sink with the same pure-array arithmetic
  * the oracle-checked batch query pins, via [[estimates]].
  */
object StreamingKmvSetOps {

  /** Keyed-side stream: a side label and the key to sketch. */
  val schema: StructType = StructType(Seq(
    StructField("side", StringType),
    StructField("key", LongType)))

  def readKeys(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** The live per-side sketch table (state = one bounded buffer per
    * side, structurally). Same md5-derived 32-bit hash as the batch
    * query, so sketches are replayable in any engine. */
  def sketchStream(keys: DataFrame): DataFrame = {
    val kv = udaf(graft.functions.KmvValues)
    keys
      .select(col("side"),
        conv(substring(md5(col("key").cast("string")), 1, 8), 16, 10)
          .cast("long").as("h"))
      .groupBy(col("side")).agg(kv(col("h")).as("arr"))
  }

  /** Set-operation estimates from two sketch arrays — the identical
    * estimator arithmetic as the batch query (union =
    * sorted-distinct-merge trimmed to k; intersection via the inclusion
    * ratio inside the union sketch), exposed for reading the complete-
    * mode sink. Returns (est_a, est_b, est_union, est_inter). */
  def estimates(a: Array[Long], b: Array[Long]): (Long, Long, Long, Long) = {
    // the shared scalar estimator (KmvValues.estimate) — ADVICE r10:
    // a per-site copy here could drift from the batch column's arithmetic
    def est(arr: Array[Long]): Long = graft.functions.KmvValues.estimate(arr)
    val u = graft.functions.KmvValues.merge(a, b)
    val aSet = a.toSet; val bSet = b.toSet
    val ic = u.count(h => aSet.contains(h) && bSet.contains(h))
    val estU = est(u)
    val estI = math.floor(ic.toDouble * estU.toDouble / u.length + 0.5).toLong
    (est(a), est(b), estU, estI)
  }

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
