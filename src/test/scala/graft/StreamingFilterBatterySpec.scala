package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.{DataFrame, Row}

import graft.io.Tables
import graft.operators.Filtering
import graft.streaming.StreamingFilterBattery

/** Streaming ≡ batch parity for the map-only half of the filter battery.
  * Each stream applies the SAME shared projection the oracle-checked batch
  * query uses — so equality here proves the streaming path computes the
  * hash-verified semantics, not a parallel reimplementation of them. The
  * corpus is the real sf0.001 documents fixture, delivered as two file
  * drops so the parity spans multiple micro-batches.
  */
class StreamingFilterBatterySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def canon(rows: Array[Row]): Map[String, Int] =
    rows.map(_.toSeq.map {
      case d: Double => d.toString
      case x => String.valueOf(x)
    }.mkString("|")).groupBy(identity).view.mapValues(_.length).toMap

  test("repetition, pii, and c4 filters stream stateless and batch-identical") {
    val drop = Files.createTempDirectory("graft-fbat-in").toString
    val docs = Tables.documents(spark, SparkTestSession.Sf0001)
      .select(col("doc_id"), col("text"),
        timestamp_millis(col("doc_id") * 1000L).as("ts"))
    // two drops → at least two micro-batches under maxFilesPerTrigger=1
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(drop)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(drop)

    val cases: Seq[(String, DataFrame => DataFrame, DataFrame)] = Seq(
      ("rep", StreamingFilterBattery.repetitionStream,
        Filtering.gopherRepetition(spark, SparkTestSession.Sf0001)),
      ("pii", StreamingFilterBattery.piiStream,
        Filtering.piiRedact(spark, SparkTestSession.Sf0001)),
      ("c4", StreamingFilterBattery.c4Stream,
        Filtering.c4Heuristics(spark, SparkTestSession.Sf0001)))

    for ((name, mk, batch) <- cases) {
      val ckpt = Files.createTempDirectory(s"graft-fbat-ckpt-$name").toString
      val in = spark.readStream.schema(StreamingFilterBattery.schema)
        .option("maxFilesPerTrigger", 1).parquet(drop)
      val q = StreamingFilterBattery.startMemorySink(
        mk(in).drop("ts"), s"fbat_$name", ckpt, Trigger.AvailableNow())
      val finished = q.awaitTermination(120000L)
      assert(finished, s"$name stream did not drain within 120s")

      val streamed = spark.sql(s"SELECT * FROM fbat_$name").collect()
      assert(streamed.nonEmpty, s"$name produced no rows")
      assert(canon(streamed) === canon(batch.drop("ts").collect()),
        s"$name streaming output differs from the batch projection")

      // stateless: a pure projection keeps NO state operator
      val stateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
      assert(stateRows.isEmpty || stateRows.forall(_ == 0L),
        s"$name must hold no state, saw ${stateRows.toSeq}")
      q.stop()
    }
  }
}
