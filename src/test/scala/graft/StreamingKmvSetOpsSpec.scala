package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.Tables
import graft.streaming.StreamingKmvSetOps

/** Streaming ≡ batch for the two KMV set sketches, state bounded at two
  * buffer rows, and the driver-side estimator arithmetic must reproduce
  * the oracle-checked batch query's estimates on the same data. */
class StreamingKmvSetOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("kmv set sketches stream in complete mode, two-row state, batch-identical") {
    val drop = Files.createTempDirectory("graft-skmv-in").toString
    val ckpt = Files.createTempDirectory("graft-skmv-ckpt").toString
    val keys = Tables.orders(spark, SparkTestSession.Sf0001)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderpriority").as("side"), col("o_custkey").as("key"))
    // out-of-order drops: hash selection must be arrival-order-blind
    keys.filter(col("key") % 2 === 0).coalesce(1).write.mode("append").parquet(drop)
    keys.filter(col("key") % 2 =!= 0).coalesce(1).write.mode("append").parquet(drop)

    val in = spark.readStream.schema(StreamingKmvSetOps.schema)
      .option("maxFilesPerTrigger", 1).parquet(drop)
    val q = StreamingKmvSetOps.startComplete(
      StreamingKmvSetOps.sketchStream(in), "skmv_sketches", ckpt,
      Trigger.AvailableNow())
    assert(q.awaitTermination(120000L), "stream did not drain within 120s")

    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getSeq[Long](1))).sortBy(_._1).toSeq
    val streamed = canon(spark.sql("SELECT side, arr FROM skmv_sketches").collect())
    val batch = canon(StreamingKmvSetOps.sketchStream(keys).collect())
    assert(streamed.nonEmpty)
    assert(streamed === batch, "streamed sketches must equal batch sketches")

    // state = one buffer row per side, while the stream carries far more keys
    val stateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(stateRows.nonEmpty && stateRows.max <= 2L,
      s"set-sketch state must stay two rows, saw ${stateRows.toSeq}")
    q.stop()

    // the driver-side estimator must reproduce the oracle-checked batch
    // query's estimates from the streamed sketches
    val byName = streamed.toMap
    val (estA, estB, estU, estI) = StreamingKmvSetOps.estimates(
      byName("1-URGENT").toArray, byName("2-HIGH").toArray)
    val bq = graft.operators.Sketches
      .kmvSetOpsOn(Tables.orders(spark, SparkTestSession.Sf0001)).collect().head
    assert(estA === bq.getAs[Long]("est_a"))
    assert(estB === bq.getAs[Long]("est_b"))
    assert(estU === bq.getAs[Long]("est_union"))
    assert(estI === bq.getAs[Long]("est_inter"))
  }
}
