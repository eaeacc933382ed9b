package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.Tables
import graft.streaming.StreamingProfile

/** Streaming ≡ batch for the live data-quality profile: the counters and
  * the KMV distinct estimate must match the batch report over the same
  * prefix, with state bounded at |columns| rows. */
class StreamingProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("profile streams in complete mode, column-bounded state, batch-consistent") {
    val drop = Files.createTempDirectory("graft-sprof-in").toString
    val ckpt = Files.createTempDirectory("graft-sprof-ckpt").toString
    val g = Tables.games(spark, SparkTestSession.Sf0001)
    g.filter(col("universeId") % 2 === 0).coalesce(1).write.mode("append").parquet(drop)
    g.filter(col("universeId") % 2 =!= 0).coalesce(1).write.mode("append").parquet(drop)

    val in = StreamingProfile.readGames(spark, drop)
    val q = StreamingProfile.startComplete(
      StreamingProfile.profileStream(in), "sprof", ckpt, Trigger.AvailableNow())
    assert(q.awaitTermination(120000L), "stream did not drain within 120s")

    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val streamed = canon(spark.sql(
      "SELECT col, n, n_null, n_empty, len_sum, distinct_kmv FROM sprof").collect())
    val batch = canon(StreamingProfile.profileStream(g).collect())
    assert(streamed.nonEmpty)
    assert(streamed === batch, "streamed profile must equal the batch profile")

    // streamed counters must agree with the oracle-checked batch REPORT
    // where the two overlap (n, n_null, n_empty, distinct_kmv)
    val report = graft.operators.Profile.profileOn(g).collect()
      .map(r => r.getString(0) -> r).toMap
    streamed.foreach { case (c, n, nNull, nEmpty, _, kmv) =>
      val r = report(c)
      assert(n === r.getAs[Long]("n"), s"$c: n")
      assert(nNull === r.getAs[Long]("n_null"), s"$c: n_null")
      assert(nEmpty === r.getAs[Long]("n_empty"), s"$c: n_empty")
      assert(kmv === r.getAs[Long]("distinct_kmv"), s"$c: kmv")
    }

    // state = one row per column, while the stream carries 6x the rows
    val stateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(stateRows.nonEmpty && stateRows.max <= 6L,
      s"profile state must stay column-bounded, saw ${stateRows.toSeq}")
    q.stop()
  }
}
