package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Dedup

/** Continuous crawl admission — the streaming twin of `dedup_incremental`
  * + `index_build_minhash_bands`, and the dedup member of the
  * index-maintainer family (NSW graph: [[StreamingNswIndex]], IVF
  * quantizer: [[StreamingIvfIndex]], text postings:
  * [[StreamingPostingsIndex]]). New crawl documents arrive continuously;
  * each micro-batch is judged against the corpus admitted SO FAR and only
  * genuinely-new docs extend the state — the corpus stays deduplicated by
  * construction, without ever re-deduplicating it.
  *
  * Per micro-batch:
  *
  *   - the batch's shingle sets go through the SAME frames-based core as
  *     the batch query ([[Dedup.incrementalVerdictFrames]] — one pipeline,
  *     two serve tiers, the postings pattern): batch band signatures
  *     BROADCAST against the stored band table, the banded self-join
  *     within the batch, Jaccard ≥ 0.5 verification on id-pruned shingle
  *     fetches, one keep-first verdict row per doc;
  *   - docs with verdict `new` are ADMITTED: their shingle sets and band
  *     signatures append to the state tables. Rejected docs
  *     (`dup_of_base` / `dup_in_batch`) add NOTHING — state growth is
  *     bounded by admitted mass, not crawl volume (a re-crawl storm of
  *     known docs costs verdict compute only);
  *   - the verdict log appends, stamped with the batch id — the audit
  *     trail a crawl pipeline reads to account for rejected volume.
  *
  * Storage is [[VersionedState]]: retry-safe overwrite writes at
  * batchId-derived versions, an atomic commit pointer, keep-last-K
  * retention, replayed batches no-op. Admitted docs are immediately
  * matchable: a later near-dup of an admitted doc resolves against it
  * as `dup_of_base` (the admitted doc IS base by then).
  */
class StreamingIncrementalDedup(spark: SparkSession, baseDir: String,
    initialDocs: DataFrame, keepVersions: Int = 3) extends Serializable {

  private val state = new VersionedState(spark, baseDir, keepVersions)
  if (state.latest.isEmpty) {
    val sh = Dedup.shingledOf(Dedup.toksOf(initialDocs))
    state.commit(0L, Map(
      "shingles" -> sh,
      "bands" -> Dedup.bandedSignatures(sh),
      "verdicts" -> emptyVerdicts))
  }

  private def emptyVerdicts: DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
      StructField("delta_id", LongType), StructField("matched_id", LongType),
      StructField("jaccard", DoubleType), StructField("verdict", StringType),
      StructField("batch_id", LongType))))

  def currentShingles(): DataFrame = state.read("shingles")
  def currentBands(): DataFrame = state.read("bands")
  def currentVerdicts(): DataFrame = state.read("verdicts")

  /** Judge one micro-batch of `(doc_id, text)` rows against the admitted
    * corpus; admit the new, log every verdict. A batch whose version is
    * already committed (foreachBatch replay after a post-commit failure)
    * is a no-op — re-running it would double-admit. */
  def admitBatch(batch: Dataset[Row], batchId: Long): Unit = {
    val target = batchId + 1
    if (state.latest.exists(_ >= target)) return
    if (batch.isEmpty) return
    // the batch shingle frame feeds banding, both verify sides, and the
    // admission append: persist for the batch's duration, release after
    // the commit (the streaming analogue of the batch query's tracked
    // persist)
    val deltaSh = Dedup.shingledOf(Dedup.toksOf(batch.toDF()))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the verdict pipeline (band probe + verify + window) feeds all three
    // committed tables; persist its |batch|-row result so the commit's
    // three writes replay a cached frame instead of re-probing the band
    // state three times
    val verdicts = Dedup.incrementalVerdictFrames(
        currentBands(),
        // stored shingle sets, narrowed to the candidate ids — no
        // re-shingling of admitted docs, ever
        candIds => currentShingles()
          .join(broadcast(candIds), Seq("doc_id"), "left_semi"),
        deltaSh)
      .withColumn("batch_id", lit(batchId))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val admitted = verdicts.filter(col("verdict") === "new")
        .select(col("delta_id").as("doc_id"))
      val newSh = deltaSh.join(broadcast(admitted), Seq("doc_id"), "left_semi")
      state.commit(target, Map(
        "shingles" -> currentShingles().unionByName(newSh),
        "bands" -> currentBands().unionByName(Dedup.bandedSignatures(newSh)),
        "verdicts" -> currentVerdicts().unionByName(verdicts)))
    } finally {
      verdicts.unpersist()
      deltaSh.unpersist()
    }
  }

  /** Attach to a stream of crawl docs; one admission round per batch. */
  def start(docStream: DataFrame, checkpointDir: String): StreamingQuery =
    docStream.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) => admitBatch(batch, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Surviving versions of the bands table — for retention tests. */
  def bandsVersions(): Seq[Long] = state.versionsOf("bands")
}
