package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.Tables
import graft.streaming.StreamingQuantiles

/** Streaming ≡ batch for the per-group bottom-k quantile sample, plus the
  * property the sketch is bought for: state bounded by k·|groups|, not by
  * stream length — asserted against Spark's own state metrics while the
  * stream carries three orders of magnitude more rows than groups.
  */
class StreamingQuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("per-group quantile sample streams in complete mode, group-bounded state, batch-identical") {
    val drop = Files.createTempDirectory("graft-squant-in").toString
    val ckpt = Files.createTempDirectory("graft-squant-ckpt").toString
    val li = Tables.lineitem(spark, SparkTestSession.Sf0001)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_returnflag"), col("l_extendedprice"))
    // two file drops in arrival order the hash-selection must be blind to
    li.filter(col("l_orderkey") % 2 === 0).coalesce(1).write.mode("append").parquet(drop)
    li.filter(col("l_orderkey") % 2 =!= 0).coalesce(1).write.mode("append").parquet(drop)

    val in = spark.readStream.schema(StreamingQuantiles.schema)
      .option("maxFilesPerTrigger", 1).parquet(drop)
    val q = StreamingQuantiles.startComplete(
      StreamingQuantiles.samplesStream(in), "squant_samples", ckpt,
      Trigger.AvailableNow())
    val finished = q.awaitTermination(120000L)
    assert(finished, "stream did not drain within 120s")

    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).sorted.toSeq
    val streamed = canon(
      spark.sql("SELECT g, est_p50, est_p90 FROM squant_samples").collect())
    val batch = canon(graft.operators.Sketches
      .quantileSamplesOn(graft.operators.Sketches.quantileGroupBase(li))
      .collect())
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "streamed per-group sample must equal the batch sample")

    // the bound that matters: state rows = |groups| (each holding a ≤k
    // buffer) while the stream carries vastly more rows than groups
    val nGroups = li.select(col("l_returnflag")).distinct().count()
    val nRows = li.count()
    assert(nRows > 100 * nGroups, s"fixture must dwarf groups, got $nRows/$nGroups")
    val stateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(stateRows.nonEmpty && stateRows.max <= nGroups,
      s"quantile state must stay group-bounded, saw ${stateRows.toSeq}")
    q.stop()
  }
}
