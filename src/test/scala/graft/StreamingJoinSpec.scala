package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.Tables
import graft.streaming.{EventsStream, StreamingJoin}

class StreamingJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("stream-stream attribution join pairs equal the batch join pairs") {
    val tmp = Files.createTempDirectory("graft-sj").toString
    val ckpt = Files.createTempDirectory("graft-sj-ckpt").toString
    val ev = Tables.events(spark, SparkTestSession.Sf0001)
    ev.write.mode("overwrite").parquet(tmp)

    // two independent stream readers over the same drop directory — a real
    // deployment would read two topics; the join semantics are identical
    val q = StreamingJoin.startMemorySink(
      StreamingJoin.attributionPairs(
        EventsStream.readEvents(spark, tmp),
        EventsStream.readEvents(spark, tmp)),
      "sj_out", ckpt)
    q.awaitTermination(180000L)

    val streamed = spark.sql("SELECT p_id, v_id FROM sj_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
    val batch = p.join(v,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 48 HOURS"))
      .select(col("p_id"), col("v_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(batch.nonEmpty)
    assert(streamed === batch)
  }

  test("batch ev_attribution pair counts agree with the raw pair join") {
    // the grouped query's n_views must total the flat pair count (plus
    // zero-view purchases contributing nothing)
    val grouped = graft.operators.Events.attribution(spark, SparkTestSession.Sf0001)
    val totalViews = grouped.agg(sum(col("n_views"))).head().getLong(0)
    val zeroLag = grouped.filter(col("n_views") === 0)
      .filter(col("last_view_lag_s") =!= -1L).count()
    assert(zeroLag === 0L)

    val ev = Tables.events(spark, SparkTestSession.Sf0001)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    val pairs = p.join(v,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 48 HOURS"))
      .count()
    assert(totalViews === pairs)
  }
}
