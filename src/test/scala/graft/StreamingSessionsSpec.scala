package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.Tables
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.Ev

class StreamingSessionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("streaming sessionization emits watermark-closed sessions, withholds open ones") {
    import spark.implicits._
    val dropDir = Files.createTempDirectory("graft-sess-drops").toString
    val ckpt = Files.createTempDirectory("graft-sess-ckpt").toString

    val ev = Tables.events(spark, SparkTestSession.Sf0001)
      .select("user_id", "event_id", "ts").as[Ev].cache()
    val median = ev.select(percentile_approx(unix_timestamp(col("ts")), lit(0.5), lit(1000)))
      .head().getLong(0)
    // two time-ordered drops so the watermark advances between micro-batches
    ev.filter(unix_timestamp(col("ts")) <= median).coalesce(1).write.parquet(s"$dropDir/a_first")
    ev.filter(unix_timestamp(col("ts")) > median).coalesce(1).write.parquet(s"$dropDir/b_second")

    val stream = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Ev].schema)
      .option("maxFilesPerTrigger", 1)
      .option("latestFirst", "false")
      .parquet(s"$dropDir/*")
      .as[Ev]
    val q = StatefulSessions.sessionizeStream(spark, stream)
      .writeStream.outputMode("append").format("memory").queryName("sess_out")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000L)

    val streamed = spark.sql("SELECT * FROM sess_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        SparkTestSession.tsAt(r, 3), SparkTestSession.tsAt(r, 4)))
      .toSet

    // expected: every batch session that is CLOSED by a successor event
    // (all but each user's last), plus last sessions whose timeout
    // (end + 30 min) precedes the final watermark (max ts − 1 min delay)
    val batch = StatefulSessions.sessionize(spark, SparkTestSession.Sf0001).collect()
      .map(s => (s.user_id, s.session_id, s.n_events, s.session_start, s.session_end))
    val maxTs = SparkTestSession.tsAt(ev.agg(max(col("ts"))).head(), 0).getTime
    val finalWatermark = maxTs - 60L * 1000
    val lastPerUser = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val expected = batch.filter { case (u, sid, _, _, end) =>
      sid != lastPerUser(u) || end.getTime + 30 * 60 * 1000 < finalWatermark
    }.toSet

    assert(streamed.nonEmpty)
    assert(streamed === expected)
  }
}
