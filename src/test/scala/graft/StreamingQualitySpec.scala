package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingQualityFilter

class StreamingQualitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(s: Long) =
    Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(s))

  // one passing document (>=20 words, >=2 stopwords, clean tokens) and
  // assorted failing ones (too short / symbol runs / numeric runs)
  private val good =
    "the quick brown fox jumps over a lazy dog and then runs far away to " +
      "the deep green forest of the northern hills tonight"
  private val short_ = "too short to pass"
  private val hashy = good + " # # # # # # # # # # # # # # # # # # # #"
  private val nums = "12 345 67 89 01 23 45 67 89 01 23 45 67 89 01 23 45 67 89 01 23"

  test("streaming filter equals the batch projection and the window monitor tracks keep rate") {
    val in = Files.createTempDirectory("graft-squal-in").toString
    val ckptF = Files.createTempDirectory("graft-squal-ckpt-f").toString
    val ckptW = Files.createTempDirectory("graft-squal-ckpt-w").toString

    // window 1 (minute 0): 3 docs, 1 survivor; window 2 (minute 1): 2 docs, 1 survivor
    val batch1 = Seq((1L, good, t(5)), (2L, short_, t(10)), (3L, hashy, t(20)))
    val batch2 = Seq((4L, nums, t(65)), (5L, good, t(70)))
    batch1.toDF("doc_id", "text", "ts").write.mode("append").parquet(in)

    val qf = StreamingQualityFilter.startMemorySink(
      StreamingQualityFilter.filterStream(
        StreamingQualityFilter.readDocs(spark, in)), "squal_f", ckptF)
    val qw = StreamingQualityFilter.startMemorySink(
      StreamingQualityFilter.keepRateStream(
        StreamingQualityFilter.readDocs(spark, in), horizon = "10 seconds"),
      "squal_w", ckptW)
    try {
      qf.processAllAvailable(); qw.processAllAvailable()
      assert(spark.sql("SELECT doc_id FROM squal_f").collect()
        .map(_.getLong(0)).toSet === Set(1L))

      // second drop fills window 2; a third late arrival pushes the
      // watermark (max ts − 10 s) past both windows so append emits them
      batch2.toDF("doc_id", "text", "ts").write.mode("append").parquet(in)
      qf.processAllAvailable(); qw.processAllAvailable()
      Seq((6L, short_, t(200))).toDF("doc_id", "text", "ts")
        .write.mode("append").parquet(in)
      qw.processAllAvailable()

      // pass-through ≡ batch: the SAME projection over the same rows
      val streamed = spark.sql(
        "SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stop FROM squal_f")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
      val batchDf = (batch1 ++ batch2).toDF("doc_id", "text", "ts")
      val expected = graft.operators.Filtering
        .withQualityMetrics(batchDf, org.apache.spark.sql.functions.col("text"))
        .filter(org.apache.spark.sql.functions.col("keep") === 1L)
        .select("doc_id", "n_words", "mean_word_len", "symbol_ratio", "alpha_frac", "n_stop")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
      assert(streamed === expected)
      assert(streamed.map(_._1) === Set(1L, 5L))

      // the drift monitor: window 1 closed at 3 arrivals / 1 kept,
      // window 2 at 2 / 1 — the rate drop a consumer would alert on
      val ws = spark.sql(
        "SELECT n_docs, n_kept, keep_rate FROM squal_w ORDER BY win_start").collect()
      assert(ws.length === 2, s"both closed windows must emit, got ${ws.length}")
      assert((ws(0).getLong(0), ws(0).getLong(1), ws(0).getDouble(2)) === ((3L, 1L, 0.3333)))
      assert((ws(1).getLong(0), ws(1).getLong(1), ws(1).getDouble(2)) === ((2L, 1L, 0.5)))
    } finally { qf.stop(); qw.stop() }
  }
}
