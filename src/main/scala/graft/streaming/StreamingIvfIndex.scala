package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IvfKMeans

/** Incremental IVF index maintenance under streaming ingest — the
  * quantizer-family counterpart of [[StreamingNswIndex]]:
  *
  *   - '''Assign on arrival''' (every batch): new vectors get their cell
  *     from the FROZEN current centroids — one map-side pass through the
  *     codegen NearestCentroid kernel, no retraining in the ingest path.
  *     This is what production IVF systems do: ingest latency must not
  *     depend on corpus-sized training jobs.
  *   - '''Drift-triggered retrain''' (rare): frozen centroids slowly stop
  *     describing a drifting corpus — recall decays silently. Two
  *     triggers, two failure shapes: each batch measures its own mean
  *     squared distance-to-centroid, and one exceeding [[driftFactor]] ×
  *     the training-time baseline retrains immediately (ACUTE shift —
  *     an out-of-distribution batch); committed corpus-wide counters
  *     (`distinfo`, maintained change-sized) feed the
  *     `retrainAtDistortionFactor` dial behind [[maybeRetrain]]
  *     (CHRONIC shift — round-16, each batch under the acute bar while
  *     the corpus walks away, or takedowns hollowing out cells). Either
  *     way the retrain reassigns everything (the compaction analog —
  *     corpus-sized, amortized over many batches).
  *
  * Storage is [[BucketedAppendState]] (round-12 refit): the assignment is
  * an id-bucketed, manifest-committed copy-on-write table whose
  * steady-state commits APPEND only the batch's rows into the buckets
  * their ids hash to — written bytes ∝ batch. Centroids are K×Dim driver
  * scalars (the documented k-means driver boundary), declared a SMALL
  * table and rewritten whole per version with the drift baseline, so a
  * restarted writer resumes from the manifest — same centroids, same
  * baseline — instead of retraining from scratch. A drift-triggered
  * retrain goes through [[BucketedAppendState.commitFull]]: corpus-sized
  * by nature, priced honestly as the rare amortized rewrite it is.
  */
/** @param retrainAtDistortionFactor the RETRAIN POLICY dial (round-16,
  *   verdict r15 #3 — the takedown study's lesson applied to the
  *   quantizer tier): [[maybeRetrain]] retrains when the CORPUS-wide
  *   mean squared distance-to-centroid has drifted past this factor of
  *   the at-train baseline. The per-batch [[driftFactor]] check catches
  *   ACUTE shift (one out-of-distribution batch); this dial catches
  *   CHRONIC shift — each batch individually under the acute bar while
  *   the corpus distribution walks away from the frozen centroids, or
  *   takedowns hollowing out trained cells. The counters live in a
  *   committed one-row `distinfo` table (n, Σd²) maintained
  *   change-sized: retrain writes the exact corpus values, each ingest
  *   adds its batch's, each takedown subtracts its leavers' — no
  *   corpus-sized scan ever runs in the ingest path, and the quantizer's
  *   fit floor becomes a configuration, like the NSW tier's recall
  *   floor. */
class StreamingIvfIndex(spark: SparkSession, baseDir: String, initial: DataFrame,
    driftFactor: Double = 1.5, keepVersions: Int = 3,
    buckets: Int = 0,
    retrainAtDistortionFactor: Double = 2.0,
    collapseStagger: Int = 0) extends Serializable {

  import spark.implicits._

  // buckets <= 0 → SIZED (round-12 verdict #6; recorded layout wins)
  private val resolvedBuckets =
    if (buckets > 0) buckets
    else BucketedAppendState.recordedBuckets(spark, baseDir).getOrElse(
      graft.operators.SizingPolicy.sizedStateBuckets(initial.count()))
  private val state = new BucketedAppendState(spark, baseDir, resolvedBuckets,
    keyed = Map("assigned" -> "vec_id"), keepVersions = keepVersions,
    collapseStagger = collapseStagger)
  @volatile private var centroids: Seq[(Int, Array[Double])] = Seq.empty
  @volatile private var baselineMsd: Double = 0.0
  /** Retrain count — observable so tests (and dashboards) can tell WHY an
    * assignment changed. (In-memory only: resets to 0 on restart.) */
  @volatile var retrains: Int = 0

  state.latest match {
    case Some(_) => // resume: reload quantizer + baseline from the pointer
      val c = state.read("centroids").collect()
      centroids = c.map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
      baselineMsd = c.head.getDouble(2)
    case None =>
      retrain(initial.select(col("vec_id"), col("v")), 0L)
  }

  /** The K-row centroid table as written per version; carries the drift
    * baseline so resume needs no recomputation. */
  private def centroidsDf: DataFrame =
    centroids.map { case (c, v) => (c, v.toSeq, baselineMsd) }
      .toDF("cluster", "cv", "baseline_msd")

  /** The corpus-distortion counters, a one-row small table: row count and
    * Σ squared distance-to-assigned-centroid under the FROZEN centroids.
    * Maintained change-sized (ingest adds, takedown subtracts) so
    * [[distortionSinceTrain]] is a driver arithmetic read, never a
    * corpus scan. */
  private def distInfoDf(n: Long, sumD2: Double): DataFrame =
    Seq((n, sumD2)).toDF("dist_n", "dist_sum_d2")

  /** (rows tracked, Σd²). Pre-round-16 stores have no distinfo table —
    * start the counters at zero (the dial becomes an exact corpus
    * measure at the first retrain; until then it tracks data ingested
    * since adoption, a legitimate recent-drift signal). Gated on the
    * table being absent from the manifest, not a catch-all Try — a
    * transient read failure must propagate, not silently disable the
    * policy (the ADVICE r15 #3 rule). */
  private[graft] def distInfo(): (Long, Double) =
    if (state.versionsOf("distinfo").isEmpty) (0L, 0.0)
    else {
      val r = state.read("distinfo").head()
      (r.getLong(0), r.getDouble(1))
    }

  /** Full Lloyd training on `e` + reassignment of everything → version n
    * (the one corpus-sized commit shape the maintainer retains — rare and
    * amortized by design). Resets the drift counters to the exact
    * corpus-wide values — the accumulated change-sized additions (and
    * their floating-point error) are replaced wholesale. */
  private def retrain(e: DataFrame, n: Long): Option[BucketedCommitStats] = {
    centroids = IvfKMeans.trainCentroids(e)
    val assigned = IvfKMeans.assign(e, centroids)
    val (cnt, sumD2) = distSumCount(assigned)
    baselineMsd = if (cnt > 0) sumD2 / cnt else 0.0
    state.commitFull(n, Map("assigned" -> assigned, "centroids" -> centroidsDf,
      "distinfo" -> distInfoDf(cnt, sumD2)))
  }

  /** (count, Σ squared L2 distance to assigned centroid) of `assigned` —
    * the quantization-error signal both drift triggers watch. Codegen dot
    * kernels (‖v‖² − 2·v·c + ‖c‖²) against the broadcast K-row centroid
    * table — no per-row UDF. */
  private def distSumCount(assigned: DataFrame): (Long, Double) = {
    import graft.functions.VectorFunctions.dot
    val cdf = centroids.map { case (c, v) => (c, v.toSeq) }.toDF("cluster", "cv")
    val r = assigned.join(broadcast(cdf), Seq("cluster"))
      .select((dot(col("v"), col("v"))
        - lit(2.0) * dot(col("v"), col("cv"))
        + dot(col("cv"), col("cv"))).as("d2"))
      .agg(count(lit(1)).as("n"), sum(col("d2")).as("s")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0.0 else r.getDouble(1))
  }

  def currentAssigned(): DataFrame = state.read("assigned")
  def currentCentroids(): Seq[(Int, Array[Double])] = centroids

  /** Ingest one micro-batch: frozen-centroid assignment, drift check,
    * retrain when the batch no longer fits the trained cells. An
    * already-committed version (replay after a post-commit failure) and a
    * batch that the anti-join empties (replayed content) are both no-ops —
    * the latter also guards the drift check, whose avg() over zero rows
    * would otherwise be null. */
  def insertBatch(batch: Dataset[Row], batchId: Long): Unit = {
    val target = batchId + 1
    if (state.latest.exists(_ >= target)) return
    val fresh = batch.toDF().select(col("vec_id"), col("v"))
      .join(currentAssigned().select(col("vec_id")), Seq("vec_id"), "left_anti")
    if (!fresh.isEmpty) {
      val assigned = IvfKMeans.assign(fresh, centroids)
      val (bn, bSumD2) = distSumCount(assigned)
      val batchMsd = if (bn > 0) bSumD2 / bn else 0.0
      if (baselineMsd > 0 && batchMsd > driftFactor * baselineMsd) {
        retrains += 1
        retrain(currentAssigned().select(col("vec_id"), col("v")).unionByName(fresh), target)
      } else {
        // steady state: append the batch's rows into their buckets only,
        // and roll its distortion into the committed counters
        val (n0, s0) = distInfo()
        state.commitAppend(target, Map(
          "assigned" -> assigned,
          "centroids" -> centroidsDf,
          "distinfo" -> distInfoDf(n0 + bn, s0 + bSumD2)))
      }
    }
  }

  /** TAKEDOWN (round-13): drop `ids` from the served assignment —
    * bucket-pruned collapse of exactly the buckets their ids hash to;
    * centroids and the drift baseline carry forward untouched (deleting
    * members does not move a frozen quantizer — a drifted remainder
    * triggers retrain through the usual signal on the next ingest).
    * `version` shares the ingest batches' axis — route takedowns through
    * the same single-writer loop. */
  def removeBatch(ids: DataFrame, version: Long): Option[BucketedCommitStats] = {
    if (state.latest.exists(_ >= version)) return None
    // subtract the leavers' distortion from the committed counters —
    // change-sized (scores only the departing rows), so the dial sees
    // takedowns hollowing out cells without any corpus scan
    val leaving = ids.select(col("vec_id")).distinct()
      .join(currentAssigned(), Seq("vec_id"))
    val (ln, lSumD2) = distSumCount(leaving)
    val (n0, s0) = distInfo()
    state.commitDelta(version,
      appends = Map("distinfo" ->
        distInfoDf(math.max(0L, n0 - ln), math.max(0.0, s0 - lSumD2))),
      deleteKeys = Map("assigned" -> ids.select(col("vec_id"))))
  }

  /** Corpus distortion relative to the at-train baseline — what
    * [[maybeRetrain]] compares against the dial. 1.0 = the corpus still
    * fits the frozen centroids as well as at training; values above the
    * dial mean the quantizer is describing a distribution it was not
    * trained on. Neutral (1.0) when no counters exist yet or the
    * baseline is degenerate. */
  def distortionSinceTrain(): Double = {
    val (n, s) = distInfo()
    if (n <= 0 || baselineMsd <= 0) 1.0 else (s / n) / baselineMsd
  }

  /** RETRAIN POLICY (round-16, verdict r15 #3): when the committed
    * corpus-distortion counters have drifted past
    * `retrainAtDistortionFactor` × the at-train baseline, retrain the
    * quantizer over the current corpus and reset the counters — the
    * corpus-sized job the acute per-batch check cannot reach (chronic
    * drift arrives a sub-threshold batch at a time; takedowns never
    * enter insertBatch at all). Below the dial: no-op, no version
    * burned. Run it from the same single-writer loop as the batches,
    * the way [[graft.streaming.StreamingNswIndex.maybeRebuild]] runs
    * after takedowns. The read is driver arithmetic over the one-row
    * counters — checking the dial per batch costs nothing. */
  def maybeRetrain(version: Long): Option[BucketedCommitStats] = {
    if (state.latest.exists(_ >= version)) return None
    if (distortionSinceTrain() < retrainAtDistortionFactor) return None
    retrains += 1
    retrain(currentAssigned().select(col("vec_id"), col("v")), version)
  }

  /** Attach to a stream of (vec_id, v) rows; one ingest per micro-batch
    * (version = batchId + 1 — scheme factor 1, stamped at attach so any
    * future widening gets the [[SubCommitScheme]] refusal — round 18). */
  def start(vectorStream: DataFrame, checkpointDir: String,
      acceptSchemeChange: Boolean = false): StreamingQuery = {
    SubCommitScheme.checkOrStamp(spark, baseDir, 1, acceptSchemeChange,
      "ivf-index")
    vectorStream.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) => insertBatch(batch, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
