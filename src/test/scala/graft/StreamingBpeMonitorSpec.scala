package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.Tables
import graft.operators.{Curation, IndexBuild}
import graft.streaming.StreamingBpeMonitor

/** Streaming ≡ batch parity for the tokenizer-drift monitor. The stream
  * aggregates over the SAME shared `Curation.fertilityTokens` projection
  * the oracle-checked `cur_bpe_fertility` query uses, against the SAME
  * stored vocab artifact — so the streamed report over the full corpus
  * must equal the batch report row for row, and a vocab holdout must
  * surface as exactly the held-out words' per-source occurrence counts.
  */
class StreamingBpeMonitorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf0001

  private lazy val drop: String = {
    val d = Files.createTempDirectory("graft-bpemon-in").toString
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), col("source"),
        timestamp_millis(col("doc_id") * 1000L).as("ts"))
    // two drops → the parity spans multiple micro-batches
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(d)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(d)
    d
  }

  private def runMonitor(vocab: DataFrame, name: String): Map[String, (Long, Long, Long)] = {
    val ckpt = Files.createTempDirectory(s"graft-bpemon-ckpt-$name").toString
    val in = spark.readStream.schema(StreamingBpeMonitor.schema)
      .option("maxFilesPerTrigger", 1).parquet(drop)
    val q = StreamingBpeMonitor.startMemorySink(
      StreamingBpeMonitor.fertilityStream(in, vocab), s"bpemon_$name", ckpt,
      Trigger.AvailableNow())
    assert(q.awaitTermination(120000L), "monitor stream did not drain within 120s")
    val stateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
    val nSources = Tables.documents(spark, dir).select("source").distinct().count()
    assert(stateRows.nonEmpty && stateRows.max <= nSources,
      s"complete-mode state must be bounded by |sources|=$nSources, saw ${stateRows.toSeq}")
    q.stop()
    spark.sql(s"SELECT * FROM bpemon_$name").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("streamed fertility equals the batch report, zero OOV on the training corpus") {
    IndexBuild.buildBpe(spark, dir).collect() // commit the vocab artifact
    val streamed = runMonitor(Curation.storedBpeVocab(spark, dir), "full")
    val batch = Curation.bpeFertility(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed.keySet === batch.keySet)
    streamed.foreach { case (src, (nWords, nTokens, nOov)) =>
      assert((nWords, nTokens) === batch(src),
        s"source $src: streamed totals diverge from the batch report")
      assert(nOov === 0L, s"source $src: OOV impossible on the training corpus")
    }
  }

  test("a vocab holdout surfaces as exactly the held-out word's occurrence counts") {
    IndexBuild.buildBpe(spark, dir).collect()
    val full = Curation.storedBpeVocab(spark, dir)
    val holdout = "join"
    val expected = Tables.documents(spark, dir)
      .select(col("source"), explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word") === holdout)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(expected.nonEmpty, s"fixture must contain the holdout word '$holdout'")
    val holdoutTokens = full.filter(col("word") === holdout)
      .select(size(split(col("seq"), " ")).cast("long")).head().getLong(0)
    val streamed = runMonitor(full.filter(col("word") =!= holdout), "holdout")
    val fullRun = runMonitor(full, "full2")
    streamed.foreach { case (src, (nWords, nTokens, nOov)) =>
      assert(nOov === expected.getOrElse(src, 0L),
        s"source $src: OOV count must equal the held-out word's occurrences")
      val (fullWords, fullTokens, _) = fullRun(src)
      // word totals unaffected (OOV words still arrive); known-token totals
      // drop by exactly the held-out word's token length × its occurrences
      assert(nWords === fullWords)
      assert(nTokens === fullTokens - holdoutTokens * nOov,
        s"source $src: token deficit must be the held-out word's share")
    }
  }
}
