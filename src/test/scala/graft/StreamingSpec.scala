package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.operators.Events
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming windowed counts equal the batch windowAgg result") {
    val tmp = Files.createTempDirectory("graft-stream").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    // simulate a file drop: one micro-batch worth of events (ts already
    // converted to a microsecond timestamp by the batch reader)
    Tables.events(spark, SparkTestSession.Sf0001)
      .write.mode("overwrite").parquet(tmp)

    val q = EventsStream.startMemorySink(
      EventsStream.windowedCounts(EventsStream.readEvents(spark, tmp)),
      "stream_out", ckpt)
    q.awaitTermination(120000L)

    val streamed = spark.sql(
      "SELECT window_start, event_type, n FROM stream_out ORDER BY 1, 2")
      .collect().map(r => (SparkTestSession.tsAt(r, 0), r.getString(1), r.getLong(2)))
    val batch = Events.windowAgg(spark, SparkTestSession.Sf0001)
      .select("window_start", "event_type", "n")
      .collect().map(r => (SparkTestSession.tsAt(r, 0), r.getString(1), r.getLong(2)))
    assert(streamed.nonEmpty)
    assert(streamed.toSet === batch.toSet)
  }
}
