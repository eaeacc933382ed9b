package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.operators.Dedup
import graft.streaming.StreamingIncrementalDedup

class StreamingIncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ≥3 tokens per doc (3-gram shingles), long enough that a 2-token tail
  // keeps the near-dup above the 0.5 verify threshold
  private val baseTexts = Seq(
    1L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    2L -> "one two three four five six seven eight nine ten",
    3L -> "red orange yellow green blue indigo violet pink brown black")

  private def docsDf(rows: Seq[(Long, String)]) = rows.toDF("doc_id", "text")

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  test("crawl admission: verdicts match the batch core, only new docs extend the state") {
    val dropDir = Files.createTempDirectory("graft-sinc-drops").toString
    val stateDir = Files.createTempDirectory("graft-sinc-state").toString
    val ckptDir = Files.createTempDirectory("graft-sinc-ckpt").toString

    // drop A: an exact re-crawl of base doc 1 (rejected) and a genuinely
    // new doc 102 (admitted). drop B: a near-dup of base doc 2 (rejected
    // against base) and an in-batch duplicate pair (210 admitted, its
    // exact copy 211 rejected keep-first). Drops are independent of each
    // other, so micro-batch arrival order can't matter.
    docsDf(Seq(
      101L -> baseTexts.head._2,
      102L -> "completely fresh crawl content with many unseen tokens here"))
      .coalesce(1).write.parquet(s"$dropDir/a")
    docsDf(Seq(
      201L -> (baseTexts(1)._2 + " appended tail"),
      210L -> "another brand new document text nobody has crawled before",
      211L -> "another brand new document text nobody has crawled before"))
      .coalesce(1).write.parquet(s"$dropDir/b")

    val idx = new StreamingIncrementalDedup(spark, stateDir, docsDf(baseTexts), keepVersions = 1)
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dropDir/*")
    assert(idx.start(stream, ckptDir).awaitTermination(120000L))

    val verdicts = idx.currentVerdicts().collect()
      .map(r => r.getLong(0) -> (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getString(3))).toMap
    assert(verdicts(101L) === (Some(1L), "dup_of_base"))
    assert(verdicts(102L) === (None, "new"))
    assert(verdicts(201L) === (Some(2L), "dup_of_base"))
    assert(verdicts(210L) === (None, "new"))
    assert(verdicts(211L) === (Some(210L), "dup_in_batch"))

    // only admitted docs are in the state; rejected docs added nothing
    val stateIds = idx.currentShingles().select("doc_id").as[Long].collect().toSet
    assert(stateIds === Set(1L, 2L, 3L, 102L, 210L))
    // bands ≡ a from-scratch rebuild over the admitted shingles (set
    // equality — the streamed-≡-rebuilt pin of the maintainer family),
    // and state growth is exactly 4 band rows per admitted doc
    val rebuilt = Dedup.bandedSignatures(idx.currentShingles())
      .as[(Long, Int, String)].collect().toSet
    val streamed = idx.currentBands().as[(Long, Int, String)].collect().toSet
    assert(streamed === rebuilt)
    assert(streamed.size === stateIds.size * 4)

    // admitted docs are immediately matchable: a near-dup of admitted doc
    // 102 resolves against it as dup_of_base (102 IS base now)
    idx.admitBatch(docsDf(Seq(
      301L -> "completely fresh crawl content with many unseen tokens here plus tail")), batchId = 5L)
    val v301 = idx.currentVerdicts().filter(col("delta_id") === 301L).collect().head
    assert(v301.getLong(1) === 102L)
    assert(v301.getString(3) === "dup_of_base")
    assert(!idx.currentShingles().select("doc_id").as[Long].collect().contains(301L))

    // replay of a committed batch id is a no-op (foreachBatch retry safety)
    val before = idx.bandsVersions().max
    idx.admitBatch(docsDf(Seq(999L -> "ghost doc that must never be judged")), batchId = 0L)
    assert(idx.bandsVersions().max === before)
    assert(idx.currentVerdicts().filter(col("delta_id") === 999L).isEmpty)

    // keep-last-1 retention
    assert(idx.bandsVersions() === Seq(before))

    // crawl input is arbitrary: the same id twice in one batch collapses
    // to ONE deterministic row (min text) — one verdict, one admission,
    // exactly 4 band rows; a duplicate would fan out every later verify
    idx.admitBatch(docsDf(Seq(
      400L -> "zz duplicate delivery of the very same doc id right here",
      400L -> "zz duplicate delivery of the very same doc id right here")), batchId = 6L)
    assert(idx.currentVerdicts().filter(col("delta_id") === 400L).count() === 1L)
    assert(idx.currentBands().filter(col("doc_id") === 400L).count() === 4L)
    assert(idx.currentShingles().filter(col("doc_id") === 400L).count() === 1L)

    // an id already ADMITTED is a redelivery, not a new doc: dropped
    // before judging (idempotent re-ingest — no verdict row, no state
    // change, no version minted, since the whole batch was redeliveries)
    val vBefore = idx.bandsVersions().max
    idx.admitBatch(docsDf(Seq(400L -> "zz changed text under a known id")), batchId = 7L)
    assert(idx.currentVerdicts().filter(col("batch_id") === 7L).isEmpty)
    assert(idx.currentBands().filter(col("doc_id") === 400L).count() === 4L)
    assert(idx.bandsVersions().max === vBefore)
  }
}
