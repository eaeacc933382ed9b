package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Nsw

/** Incremental NSW/HNSW index maintenance under streaming ingest — the
  * composition the streaming upsert + streaming dedup imply: new vectors
  * arrive continuously, and the graph-ANN index grows with them instead of
  * being rebuilt. Since round 8 BOTH layers of the `ann_hnsw_search`
  * hierarchy are maintained: layer-1 membership is deterministic
  * (`vec_id % SampleMod == 0`), so each batch's sample members are
  * inserted into the routing graph by the same search-then-connect the
  * full corpus gets on layer 0 — grown ≡ rebuilt recall pinned for both
  * the flat and the 2-layer search.
  *
  * Each micro-batch runs the actual NSW INSERTION algorithm (Malkov et
  * al., Information Systems 2014 §4): beam-search the CURRENT graph for
  * every incoming vector (the bulk DataFrame-frontier search —
  * [[graft.operators.Nsw.bulkVisited]] — so a large batch costs the same
  * number of jobs as a small one), connect each to its top-Degree found
  * neighbors, and append those directed edges to the k-NN table. The
  * maintained state is exactly the directed k-NN table the batch build
  * produces ([[graft.operators.Nsw.knnEdgesOn]]); the serve-time
  * finishing overlay ([[graft.operators.Nsw.symmetrizeWithLongLinks]])
  * supplies reverse edges — old nodes gain links TO new ones — and
  * re-derives the deterministic small-world links over the grown id range
  * (their modulus is corpus size, so they are a cheap map-only recompute
  * per version, NOT incremental state).
  *
  * Storage is [[BucketedAppendState]] (round-12 refit — the round-11
  * verdict named the per-batch full-state rewrite the last corpus-sized
  * write in the system): vectors/knn/knn1 are id-bucketed,
  * manifest-committed, copy-on-write tables, and each batch's commit
  * APPENDS the fresh rows into only the buckets its ids hash to —
  * written bytes ∝ batch, exactly the lake's and the postings
  * maintainer's write shape. The insertion COMPUTE was already
  * batch-sized (the insertion search); now the commit is too.
  */
/** @param rebuildAtDeletedFraction the REBUILD POLICY dial (round-15,
  *   verdict r14 #3): when the cumulative fraction of the corpus deleted
  *   since the last full build crosses this, [[maybeRebuild]] retrains
  *   the graph over the survivors instead of repairing edges.
  *   `TakedownRecallScale` measured why a policy must exist: per-batch
  *   repair holds 0.244 recall@3 at 50 % deletion vs the rebuilt line's
  *   0.289, and repair alone never recovers it — erosion is bounded only
  *   by an occasional retrain. The serve tier's recall floor is exactly
  *   this configuration. */
class StreamingNswIndex(spark: SparkSession, baseDir: String, initial: DataFrame,
    keepVersions: Int = 3, buckets: Int = 0,
    rebuildAtDeletedFraction: Double = 0.5,
    collapseStagger: Int = 0) extends Serializable {

  // buckets <= 0 → SIZED: an existing store keeps its recorded layout, a
  // fresh one derives buckets ∝ corpus (round-12 verdict #6 — per-bucket
  // rewrite/read cost stays pinned as the corpus grows)
  private val resolvedBuckets =
    if (buckets > 0) buckets
    else BucketedAppendState.recordedBuckets(spark, baseDir).getOrElse(
      graft.operators.SizingPolicy.sizedStateBuckets(initial.count()))
  private val state = new BucketedAppendState(spark, baseDir, resolvedBuckets,
    keyed = Map("vectors" -> "vec_id", "knn" -> "src", "knn1" -> "src"),
    keepVersions = keepVersions, collapseStagger = collapseStagger)
  if (state.latest.isEmpty)
    state.commitFull(0L, Map(
      "vectors" -> initial,
      "knn" -> Nsw.knnEdgesOn(initial.select(col("vec_id"), col("v"))),
      "knn1" -> Nsw.knnEdgesOn(
        initial.select(col("vec_id"), col("v"))
          .filter(col("vec_id") % Nsw.SampleMod === 0)),
      "buildinfo" -> buildInfoDf(initial.count(), 0L)))

  /** The rebuild-policy counters, a one-row small table: corpus size at
    * the last full build, and rows deleted since. */
  private def buildInfoDf(corpusAtBuild: Long, deletedSince: Long): DataFrame = {
    import spark.implicits._
    Seq((corpusAtBuild, deletedSince)).toDF("corpus_at_build", "deleted_since_build")
  }

  /** (corpus at last build, deleted since). Pre-round-15 stores have no
    * buildinfo table — treat the current corpus as the build baseline
    * (the policy starts counting from adoption). The fallback is gated on
    * the table being ABSENT from the manifest, not on a catch-all Try
    * (ADVICE r15 #3): a transient read failure of a committed buildinfo
    * table must propagate, not silently zero the deleted-since counter
    * and disable the configured recall floor. */
  private[graft] def buildInfo(): (Long, Long) =
    if (state.versionsOf("buildinfo").isEmpty) (currentVectors().count(), 0L)
    else {
      val r = state.read("buildinfo").head()
      (r.getLong(0), r.getLong(1))
    }

  /** Deleted fraction since the last full build — what [[maybeRebuild]]
    * compares against the dial. */
  def deletedFractionSinceBuild(): Double = {
    val (atBuild, deleted) = buildInfo()
    if (atBuild <= 0L) 0.0 else deleted.toDouble / atBuild
  }

  def currentVectors(): DataFrame = state.read("vectors")
  def currentKnn(): DataFrame = state.read("knn")
  def currentKnn1(): DataFrame = state.read("knn1")

  /** The searchable edge table of the current version: k-NN state plus the
    * serve-time symmetrize + small-world overlay. */
  def servedEdges(): DataFrame =
    Nsw.symmetrizeWithLongLinks(currentVectors(), currentKnn(), 1)

  /** The ROUTING layer's edge table: the maintained layer-1 k-NN state
    * under the same finishing overlay, on the sample's id lattice. Layer-1
    * membership is deterministic (`vec_id % SampleMod == 0` — the batch
    * hierarchy's rule), so the routing layer is maintainable by exactly
    * the insertion algorithm layer 0 uses. */
  def servedEdges1(): DataFrame =
    Nsw.symmetrizeWithLongLinks(
      currentVectors().filter(col("vec_id") % Nsw.SampleMod === 0),
      currentKnn1(), Nsw.SampleMod)

  /** Insert one micro-batch of (vec_id, v) rows: search-then-connect on
    * layer 0 for every row, and the same insertion on the routing layer
    * for the deterministic 1-in-[[Nsw.SampleMod]] sample members; then
    * commit vectors/knn/knn1 at version batchId+1. A batch whose version
    * is already committed (foreachBatch replay after a post-commit
    * failure) is a no-op — re-running it would read the very dirs it
    * overwrites. */
  /** Returns the commit's bucket-pruned write stats, None when the batch
    * was a replay or emptied by the anti-join. */
  def insertBatch(batch: Dataset[Row], batchId: Long): Option[BucketedCommitStats] = {
    val target = batchId + 1
    if (state.latest.exists(_ >= target)) return None
    val e = currentVectors()
    val fresh = batch.toDF().select(col("vec_id"), col("v"))
      // id-idempotent under stream replay, like the anti-join re-runs
      .join(e.select(col("vec_id")), Seq("vec_id"), "left_anti")
    if (fresh.isEmpty) None
    else {
      val newKnn = Nsw.insertKnn(e, servedEdges(), fresh)
      val fresh1 = fresh.filter(col("vec_id") % Nsw.SampleMod === 0)
      val newKnn1 =
        if (fresh1.isEmpty) currentKnn1().limit(0)
        else Nsw.insertKnn(
          e.filter(col("vec_id") % Nsw.SampleMod === 0), servedEdges1(), fresh1,
          entryCap = Nsw.Entries * Nsw.SampleMod)
      // APPEND-only delta: only the fresh rows' buckets rewrite
      state.commitAppend(target, Map(
        "vectors" -> fresh,
        "knn" -> newKnn,
        "knn1" -> newKnn1))
    }
  }

  /** TAKEDOWN (round-13; the append-only store grew a remove path —
    * round-12 verdict #2): drop `ids` from the served index. Removes the
    * ids' vector rows and their OUTGOING adjacency on both layers via
    * bucket-pruned collapse ([[BucketedAppendState.commitDelta]] —
    * written bytes ∝ touched buckets). Survivors' edges TO a deleted id
    * dangle harmlessly: every serve path scores nodes through an inner
    * join against the vectors table ([[Nsw]]'s bulkScore), so a deleted
    * id can never be visited, scored, or returned — the takedown is
    * effective at serve time the moment the version commits
    * (StreamingNswIndexSpec pins it). Heavy deletion erodes graph
    * connectivity like any ANN index; the amortized answer is a rebuild
    * through [[BucketedAppendState.commitFull]], same as IVF's retrain.
    * `version` shares the insert batches' axis — route takedowns through
    * the same single-writer loop. */
  def removeBatch(ids: DataFrame, version: Long): Option[BucketedCommitStats] = {
    if (state.latest.exists(_ >= version)) return None
    // count what actually leaves (ids may repeat or be already absent) so
    // the rebuild policy's deleted-fraction is exact, not an upper bound
    val actuallyLeaving = ids.select(col("vec_id")).distinct()
      .join(currentVectors().select(col("vec_id")), Seq("vec_id"), "left_semi")
      .count()
    val (atBuild, deleted) = buildInfo()
    state.commitDelta(version,
      appends = Map(
        "buildinfo" -> buildInfoDf(atBuild, deleted + actuallyLeaving)),
      deleteKeys = Map(
        "vectors" -> ids.select(col("vec_id")),
        "knn" -> ids.select(col("vec_id").as("src")),
        "knn1" -> ids.select(col("vec_id").as("src"))))
  }

  /** REBUILD POLICY (round-15, verdict r14 #3): when the cumulative
    * deleted fraction since the last full build has crossed
    * `rebuildAtDeletedFraction`, retrain the graph over the survivors
    * (the `commitFull` path heavy deletion always routed to — now a
    * configured trigger instead of an operator judgment call) and reset
    * the counter. Below the dial: no-op, no version burned. Run it after
    * takedown batches in the same single-writer loop, the way
    * [[repairBatch]] runs — per-batch repair bounds the between-rebuild
    * erosion, the policy bounds how far the repaired line may drift from
    * the rebuilt one. */
  def maybeRebuild(version: Long): Option[BucketedCommitStats] = {
    if (state.latest.exists(_ >= version)) return None
    if (deletedFractionSinceBuild() < rebuildAtDeletedFraction) return None
    val survivors = currentVectors().select(col("vec_id"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try state.commitFull(version, Map(
      "vectors" -> survivors,
      "knn" -> Nsw.knnEdgesOn(survivors),
      "knn1" -> Nsw.knnEdgesOn(
        survivors.filter(col("vec_id") % Nsw.SampleMod === 0)),
      "buildinfo" -> buildInfoDf(survivors.count(), 0L)))
    finally survivors.unpersist()
  }

  /** EDGE REPAIR after takedowns (round-14 — the round-13 verdict asked
    * for the measurement, and it came back positive: dangling edges are
    * harmless for SCORING but each is a wasted beam move, and
    * `tools/TakedownRecallScale` measured maintained recall@3 collapsing
    * 0.33 → 0.09 at 50 % cumulative deletion while a fresh rebuild over
    * the same survivors reads 0.29 — connectivity EROSION, repairable).
    *
    * Re-links exactly the takedowns' blast radius: survivors whose
    * adjacency references a vector no longer in the table get their rows
    * REPLACED by a fresh search-then-connect against the current graph
    * (the same insertion algorithm new nodes get), committed as a
    * bucket-pruned copy-on-write delta — cost ∝ affected survivors,
    * never the corpus. Gated like every maintainer op: a replayed
    * version is a no-op, and a graph with no dangling edges burns no
    * version. Run it after takedown batches (same single-writer loop);
    * heavy cumulative deletion still routes to the commitFull rebuild,
    * but with per-batch repair the measured recall at 50 % deletion
    * tracks the rebuilt control instead of the eroded floor. */
  def repairBatch(version: Long): Option[BucketedCommitStats] = {
    if (state.latest.exists(_ >= version)) return None
    val e = currentVectors()
    val ids = e.select(col("vec_id").as("dst"))
    def affectedOf(knn: DataFrame): DataFrame =
      knn.join(ids, Seq("dst"), "left_anti").select(col("src")).distinct()
    val aff0 = affectedOf(currentKnn())
    val aff1 = affectedOf(currentKnn1())
    if (aff0.isEmpty && aff1.isEmpty) return None
    def vecsOf(aff: DataFrame, members: DataFrame): DataFrame =
      members.join(aff.withColumnRenamed("src", "vec_id"), Seq("vec_id"), "left_semi")
    val repaired = Nsw.insertKnn(e, servedEdges(), vecsOf(aff0, e))
    val e1 = e.filter(col("vec_id") % Nsw.SampleMod === 0)
    val aff1Vecs = vecsOf(aff1, e1)
    val repaired1 =
      if (aff1Vecs.isEmpty) currentKnn1().limit(0)
      else Nsw.insertKnn(e1, servedEdges1(), aff1Vecs,
        entryCap = Nsw.Entries * Nsw.SampleMod)
    state.commitDelta(version,
      appends = Map("knn" -> repaired, "knn1" -> repaired1),
      deleteKeys = Map("knn" -> aff0, "knn1" -> aff1))
  }

  /** Attach to a stream of (vec_id, v) rows; one insertion per micro-batch
    * (version = batchId + 1 — scheme factor 1, stamped at attach so any
    * future widening, or attaching this loop to a dir a multi-sub-commit
    * maintainer owns (the CDC wrapper stamps 4 on this same store class's
    * dirs), gets the [[SubCommitScheme]] refusal — round 18). The stamp
    * lives HERE and not the constructor because the scheme belongs to the
    * foreachBatch→version mapping, which the CDC wrapper replaces. */
  def start(vectorStream: DataFrame, checkpointDir: String,
      acceptSchemeChange: Boolean = false): StreamingQuery = {
    SubCommitScheme.checkOrStamp(spark, baseDir, 1, acceptSchemeChange,
      "nsw-index")
    vectorStream.writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        insertBatch(batch, id); () }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Top-3 neighbors for the 5 fixture queries over the grown graph —
    * the per-batch search shape, for comparing against a from-scratch
    * rebuild. */
  def search(): DataFrame =
    Nsw.searchWithEdges(currentVectors(), servedEdges())

  /** The 2-layer search over the grown hierarchy: routing through the
    * maintained layer-1 graph, layer-0 beam from its survivors — the same
    * serve core as `ann_hnsw_search`. */
  def search2(): DataFrame =
    Nsw.hnswWithEdges(currentVectors(), servedEdges1(), servedEdges())
}
