package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.Tables
import graft.operators.Events

/** Streaming twin of the banded interval join. The batch rewrite
  * (`Events.bandedIntervalJoin`) is banding + a broadcast equi-join over a
  * STATIC interval table — which means the identical dataframe code runs
  * under Structured Streaming as a stream-static join with NO state at
  * all: each event computes its band, probes the broadcast band table,
  * re-checks the exact bounds, and is done. No watermark, no state store,
  * no retention dial — the strongest possible scaling story for
  * continuous incident attribution (contrast the stream-stream
  * attribution join, whose state the watermark must bound).
  */
class StreamingIntervalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("bandedIntervalJoin runs unchanged on a stream, stateless, batch-identical") {
    val drop = Files.createTempDirectory("graft-ivstream").toString
    val ckpt = Files.createTempDirectory("graft-ivstream-ckpt").toString
    val ev = Tables.events(spark, SparkTestSession.Sf0001)
      .select(unix_millis(col("ts")).as("ems"), col("user_id"))
    ev.coalesce(2).write.parquet(s"$drop/events")

    val intervals = Events.incidentWindows(spark)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$drop/events")
    // the SAME operator invocation as the batch query — that is the point
    val q = Events.bandedIntervalJoin(stream, intervals)
      .select(col("ems"), col("user_id"), col("incident_id"))
      .writeStream.outputMode("append").format("memory").queryName("iv_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    val finished = q.awaitTermination(120000L)
    assert(finished, "stream did not drain within 120s")

    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getInt(2))
    val streamed = spark.sql("SELECT * FROM iv_out").collect().map(key)
    val batch = Events.bandedIntervalJoin(ev, intervals)
      .select(col("ems"), col("user_id"), col("incident_id"))
      .collect().map(key)
    assert(streamed.nonEmpty)
    // multiset equality (duplicate events are legitimate matches twice)
    assert(streamed.groupBy(identity).view.mapValues(_.length).toMap ===
      batch.groupBy(identity).view.mapValues(_.length).toMap)

    // stateless: a stream-static inner join keeps NO state operator
    val stateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(stateRows.isEmpty || stateRows.forall(_ == 0L),
      s"stream-static interval join must hold no state, saw $stateRows")
  }
}
