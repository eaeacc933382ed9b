package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(s: Long) = Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(s))

  test("streaming dedup drops duplicates within AND across micro-batches with bounded state") {
    val in = Files.createTempDirectory("graft-sdedup-in").toString
    val ckpt = Files.createTempDirectory("graft-sdedup-ckpt").toString

    // batch 1: an in-batch duplicate (doc 3 repeats doc 1's content)
    Seq((1L, "aaa", t(0)), (2L, "bbb", t(1)), (3L, "aaa", t(2)))
      .toDF("doc_id", "text", "ts")
      .write.mode("append").parquet(in)
    val q = StreamingDedup.startMemorySink(
      StreamingDedup.dedupStream(StreamingDedup.readDocs(spark, in)), "sdedup", ckpt)
    try {
      q.processAllAvailable()
      // exactly ONE survivor per distinct content (the survivor among 1/3
      // is unspecified — dropDuplicates keeps whichever arrived first)
      val out1 = spark.sql("SELECT doc_id, text FROM sdedup").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(out1.map(_._2).toSet === Set("aaa", "bbb"))
      assert(out1.length === 2)

      // batch 2: doc 4 repeats "aaa" within the horizon (cross-batch dup —
      // must be dropped by the dedup state), doc 5 is new
      Seq((4L, "aaa", t(10)), (5L, "ccc", t(11)))
        .toDF("doc_id", "text", "ts")
        .write.mode("append").parquet(in)
      q.processAllAvailable()
      val all = spark.sql("SELECT doc_id, text FROM sdedup").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      // each distinct content exactly once — the same contract as batch
      // dropDuplicates over all five rows; doc 4 must NOT have re-emitted
      assert(all.map(_._2).toSet === Set("aaa", "bbb", "ccc"))
      assert(all.length === 3)
      assert(all.count(_._2 == "aaa") === 1, "cross-batch duplicate must not re-emit")
      assert(all.exists(_ == ((5L, "ccc"))))
    } finally q.stop()
  }
}
