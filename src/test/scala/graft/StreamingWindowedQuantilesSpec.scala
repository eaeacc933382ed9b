package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.Tables
import graft.streaming.{EventsStream, StreamingWindowedQuantiles}

/** Append-mode contract for the windowed quantile sketch: every real
  * window emits exactly once with a sample IDENTICAL to the batch build,
  * and closed windows EVICT — final state holds only the unexpired tail,
  * not the stream's history. */
class StreamingWindowedQuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("windowed samples append once per closed window, state evicts to the live tail") {
    val drop = Files.createTempDirectory("graft-swq-in").toString
    val ckpt = Files.createTempDirectory("graft-swq-ckpt").toString
    val ev = Tables.events(spark, SparkTestSession.Sf0001)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    val mid = ev.agg(expr("percentile(unix_timestamp(ts), 0.5)")).head().getDouble(0)
    // time-ordered drops so the watermark advances monotonically, then a
    // far-future sentinel to close every real window
    ev.filter(unix_timestamp(col("ts")) <= mid)
      .coalesce(1).write.mode("append").parquet(drop)
    ev.filter(unix_timestamp(col("ts")) > mid)
      .coalesce(1).write.mode("append").parquet(drop)
    ev.orderBy(col("ts").desc).limit(1)
      .withColumn("ts", col("ts") + expr("INTERVAL 30 DAYS"))
      .withColumn("event_id", lit(999999999L))
      .coalesce(1).write.mode("append").parquet(drop)

    val in = spark.readStream.schema(EventsStream.schema)
      .option("maxFilesPerTrigger", 1).parquet(drop)
    val q = StreamingWindowedQuantiles.startAppend(
      StreamingWindowedQuantiles.samplesAppend(in), "swq", ckpt,
      Trigger.AvailableNow())
    assert(q.awaitTermination(120000L), "stream did not drain within 120s")

    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (SparkTestSession.tsAt(r, 0), r.getString(1),
        r.getSeq[Double](2))).sortBy(t => (t._1, t._2)).toSeq
    val streamed = canon(spark.sql("SELECT w, et, arr FROM swq").collect())
    val batch = canon(graft.operators.Events.windowSketchAgg(ev).collect())
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "every real window must emit exactly once with the batch-identical sample")

    // eviction: closed windows leave the store as the watermark passes,
    // so PEAK state never holds the full window history (the first drop's
    // windows evict when the second drop advances the watermark), and the
    // final state is only the unexpired tail
    val stateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
    val nGroups = batch.length
    assert(stateRows.max < nGroups.toLong,
      s"peak state ${stateRows.max} must stay below the $nGroups-window history")
    assert(stateRows.last < nGroups / 2,
      s"closed windows must evict, final state ${stateRows.last} of $nGroups groups")
    q.stop()
  }
}
