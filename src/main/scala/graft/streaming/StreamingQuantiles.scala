package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Sketches

/** Continuous per-group quantile tracking — the streaming twin of
  * `q_quantile_groups`. Live percentiles over an unbounded stream (p50 /
  * p90 latency or price per category) normally force a choice between
  * exact-but-unbounded (buffer every value per group) and opaque
  * approximations; the bottom-k-by-hash sample removes it: the stream
  * maintains one `BottomKSketch` buffer per group — ≤ k (hash, value)
  * pairs, merged by the same order-independent sorted-merge-and-trim the
  * batch query shuffles — so state is O(k·|groups|) no matter how long
  * the stream runs, and the sample (hence every estimate read off it) is
  * IDENTICAL to what the batch query computes over the same prefix,
  * because selection is hash-determined rather than arrival-ordered.
  *
  * Runs in COMPLETE output mode (legitimate precisely because the
  * aggregate is sketch-sized per group and the group dimension —
  * `l_returnflag` here — is a low-cardinality category, the only kind a
  * complete-mode quantile dashboard makes sense for); the sink always
  * holds the live per-group estimates. The shared expression tree
  * (`Sketches.quantileSamplesOn`) is the StreamingCms convention: batch
  * oracle-checks the semantics, streaming inherits them.
  */
object StreamingQuantiles {

  /** Lineitem-shaped value stream: row key (orderkey, linenumber),
    * group, and the measured value. */
  val schema: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_returnflag", StringType),
    StructField("l_extendedprice", DoubleType)))

  def readValues(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** The live per-group estimate table (state = k rows per group,
    * structurally). */
  def samplesStream(values: DataFrame): DataFrame =
    Sketches.quantileSamplesOn(Sketches.quantileGroupBase(values))

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
