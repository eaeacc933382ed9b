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
  *     (`dup_of_base` / `dup_in_batch`) add NOTHING to the state — the
  *     STATE tables grow with admitted mass, not crawl volume (a re-crawl
  *     storm of known docs costs verdict compute only);
  *   - every verdict lands in a separate append-only AUDIT LOG (one
  *     parquet dir per batch — see [[currentVerdicts]]), the trail a
  *     crawl pipeline reads to account for rejected volume. The log, like
  *     any log, grows with judged volume; it is never rewritten.
  *
  * Storage is [[BucketedAppendState]] (round-13 refit — this maintainer
  * was the LAST one committing corpus-sized state: its VersionedState
  * commits rewrote the full shingle + band tables per admission batch):
  * both tables are doc_id-bucketed and manifest-committed, an admission
  * appends ONLY the admitted docs' rows as a new generation in their
  * buckets (written bytes ∝ admitted mass), replayed batches no-op on
  * the version guard, and keep-last-K retention is unchanged. Admitted
  * docs are immediately matchable: a later near-dup of an admitted doc
  * resolves against it as `dup_of_base` (the admitted doc IS base by
  * then). [[removeDocs]] is the takedown half: a removed doc's shingle
  * and band rows collapse out of exactly the buckets its id hashes to,
  * so it STOPS MATCHING — a re-crawl of its text judges `new` again.
  */
class StreamingIncrementalDedup(spark: SparkSession, baseDir: String,
    initialDocs: DataFrame, keepVersions: Int = 3,
    buckets: Int = 0,
    targetBucketBytes: Option[Long] = None,
    collapseStagger: Int = 0) extends Serializable {

  // The initial shingle frame feeds (at most) the sizing probe, its row
  // count, AND the first commit's two table writes — persist across those
  // uses (ADVICE r16 #3: the unpersisted frame was recomputed per use).
  // Lazy + the `shinglesForced` flag: reopening an existing store must
  // never compute shingles at all.
  private var shinglesForced = false
  private lazy val initialShingles = {
    shinglesForced = true
    Dedup.shingledOf(Dedup.toksOf(initialDocs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  // buckets <= 0 → SIZED (round-12 verdict #6; recorded layout wins).
  // With `targetBucketBytes` set, sizing goes through the BYTES dial
  // (round 16): a bounded probe of the store's dominant table (shingles)
  // measures bytes-per-row before the layout freezes — the row dial
  // stays the default so fixture-scale layouts (and their hash gates)
  // are untouched. The recorded-layout short-circuit comes FIRST (ADVICE
  // r16 #3): reopening an existing store must not pay a full
  // shingle-computation job whose result the recorded layout discards.
  private val resolvedBuckets =
    if (buckets > 0) buckets
    else BucketedAppendState.recordedBuckets(spark, baseDir).getOrElse(
      targetBucketBytes match {
        case Some(t) => BucketedAppendState.measuredBuckets(spark, baseDir,
          initialShingles, projectedRows = initialShingles.count(), t)
        case None =>
          graft.operators.SizingPolicy.sizedStateBuckets(initialDocs.count())
      })
  private val state = new BucketedAppendState(spark, baseDir, resolvedBuckets,
    keyed = Map("shingles" -> "doc_id", "bands" -> "doc_id"),
    keepVersions = keepVersions, collapseStagger = collapseStagger)
  if (state.latest.isEmpty) {
    val sh = initialShingles
    state.commitFull(0L, Map(
      "shingles" -> sh,
      "bands" -> Dedup.bandedSignatures(sh)))
  }
  // bootstrap done — whatever the paths above pinned is released here
  if (shinglesForced) initialShingles.unpersist()

  private val verdictSchema = StructType(Seq(
    StructField("delta_id", LongType), StructField("matched_id", LongType),
    StructField("jaccard", DoubleType), StructField("verdict", StringType),
    StructField("batch_id", LongType)))

  private def verdictsDir = s"$baseDir/verdicts"

  def currentShingles(): DataFrame = state.read("shingles")
  def currentBands(): DataFrame = state.read("bands")

  /** The verdict AUDIT LOG — deliberately NOT a VersionedState table: a
    * log keyed by batch grows with crawl volume (every judged doc leaves a
    * row), so folding it into the copy-on-write state would rewrite
    * O(total-judged) per commit and break the state bound. It lives as
    * one append-only parquet dir per batch, overwrite-idempotent on
    * replay; retention is the log owner's call (ship/compact/expire),
    * independent of the state tables' keep-last-K. Reads are pinned to
    * COMMITTED batches only (`batch_id < latest`), so a crash between the
    * verdict write and the state commit can never surface a torn batch. */
  def currentVerdicts(): DataFrame = {
    val committed = state.latest.getOrElse(0L)
    val path = new org.apache.hadoop.fs.Path(verdictsDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (committed == 0L || !fs.exists(path))
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], verdictSchema)
    else spark.read.option("recursiveFileLookup", "true")
      .schema(verdictSchema).parquet(verdictsDir)
      .filter(col("batch_id") < committed)
  }

  /** Judge one micro-batch of `(doc_id, text)` rows against the admitted
    * corpus; admit the new, log every verdict. A batch whose version is
    * already committed (foreachBatch replay after a post-commit failure)
    * is a no-op — re-running it would double-admit.
    *
    * Crawl input is arbitrary, so two redelivery shapes are normalized
    * before judging (they would otherwise corrupt the state tables —
    * duplicate doc_ids fan out every later verify join):
    *
    *   - the same id twice IN one batch collapses to one row (min(text) —
    *     deterministic, order-free);
    *   - an id already IN the admitted state is dropped: it is a
    *     redelivery, not a new doc (idempotent re-ingest). Ids that were
    *     previously REJECTED are not in the state and get re-judged — a
    *     new verdict row per delivery, which is what an audit log wants.
    *
    * The already-admitted drop also keeps the base and delta id sets
    * disjoint — the precondition under which a candidate pair carries
    * exactly one `in_batch` attribution in [[Dedup.incrementalVerdictFrames]]. */
  def admitBatch(batch: Dataset[Row], batchId: Long): Unit = {
    val target = batchId + 1
    if (state.latest.exists(_ >= target)) return
    if (batch.isEmpty) return
    val docs = batch.toDF()
      .groupBy(col("doc_id")).agg(min(col("text")).as("text"))
      // fixture-scale membership probe; at corpus scale this anti-join
      // wants the same Bloom-filter prune the batch engine ships
      // (j_bloom_prune) in front of it
      .join(currentShingles().select(col("doc_id")), Seq("doc_id"), "left_anti")
    // the batch shingle frame feeds banding, both verify sides, and the
    // admission append: persist for the batch's duration, release after
    // the commit (the streaming analogue of the batch query's tracked
    // persist)
    val deltaSh = Dedup.shingledOf(Dedup.toksOf(docs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the verdict pipeline (band probe + verify + window) feeds the log
    // write and both state tables; persist its |batch|-row result so the
    // writes replay a cached frame instead of re-probing the band state
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
      // a batch that was entirely redeliveries judges nothing: no log
      // entry, no version minted
      if (verdicts.isEmpty) return
      // log BEFORE the state commit: a crash in between replays the batch,
      // which overwrites this same dir with the identical deterministic
      // result — exactly-once either way; readers never see it until the
      // commit lands (currentVerdicts pins batch_id < latest)
      verdicts.write.mode("overwrite").parquet(s"$verdictsDir/batch-$batchId")
      val admitted = verdicts.filter(col("verdict") === "new")
        .select(col("delta_id").as("doc_id"))
      val newSh = deltaSh.join(broadcast(admitted), Seq("doc_id"), "left_semi")
      // DELTA commit: only the admitted docs' rows are written, into only
      // their buckets — the round-13 refit's point (the old shape wrote
      // the full union of both state tables per batch)
      state.commitAppend(target, Map(
        "shingles" -> newSh,
        "bands" -> Dedup.bandedSignatures(newSh)))
    } finally {
      verdicts.unpersist()
      deltaSh.unpersist()
    }
  }

  /** Attach to a stream of crawl docs; one admission round per batch
    * (version = batchId + 1 — scheme factor 1, stamped at attach so any
    * future widening gets the [[SubCommitScheme]] refusal — round 18). */
  def start(docStream: DataFrame, checkpointDir: String,
      acceptSchemeChange: Boolean = false): StreamingQuery = {
    SubCommitScheme.checkOrStamp(spark, baseDir, 1, acceptSchemeChange,
      "incremental-dedup")
    docStream.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) => admitBatch(batch, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** TAKEDOWN (round-13): remove `docIds` (a one-column `doc_id` frame)
    * from the admitted state — their shingle and band rows collapse out
    * of exactly the buckets the ids hash to, so the docs stop matching:
    * a re-crawl of a removed doc's text judges `new` again (the pipeline
    * spec pins the full round trip). The audit log is NOT rewritten — a
    * takedown changes what the corpus admits going forward, not the
    * history of what was judged (logs have their own retention/expunge
    * channel). `version` shares the admission batches' axis — route
    * takedowns through the same single-writer loop. */
  def removeDocs(docIds: DataFrame, version: Long): Option[BucketedCommitStats] =
    state.commitDelta(version, Map.empty, Map(
      "shingles" -> docIds.select(col("doc_id")),
      "bands" -> docIds.select(col("doc_id"))))

  /** Surviving versions of the bands table — for retention tests. */
  def bandsVersions(): Seq[Long] = state.versionsOf("bands")
}
