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
  *     describing a drifting corpus — recall decays silently. Each batch
  *     therefore measures its own mean squared distance-to-centroid; when
  *     it exceeds [[driftFactor]] × the training-time baseline, the index
  *     retrains on the grown corpus and reassigns everything (the
  *     compaction analog — corpus-sized, amortized over many batches).
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
class StreamingIvfIndex(spark: SparkSession, baseDir: String, initial: DataFrame,
    driftFactor: Double = 1.5, keepVersions: Int = 3,
    buckets: Int = 0) extends Serializable {

  import spark.implicits._

  // buckets <= 0 → SIZED (round-12 verdict #6; recorded layout wins)
  private val resolvedBuckets =
    if (buckets > 0) buckets
    else BucketedAppendState.recordedBuckets(spark, baseDir).getOrElse(
      graft.operators.SizingPolicy.sizedStateBuckets(initial.count()))
  private val state = new BucketedAppendState(spark, baseDir, resolvedBuckets,
    keyed = Map("assigned" -> "vec_id"), keepVersions = keepVersions)
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

  /** Full Lloyd training on `e` + reassignment of everything → version n
    * (the one corpus-sized commit shape the maintainer retains — rare and
    * amortized by design). */
  private def retrain(e: DataFrame, n: Long): Unit = {
    centroids = IvfKMeans.trainCentroids(e)
    val assigned = IvfKMeans.assign(e, centroids)
    baselineMsd = meanSquaredDist(assigned)
    state.commitFull(n, Map("assigned" -> assigned, "centroids" -> centroidsDf))
  }

  /** Mean squared L2 distance of assigned rows to their centroid — the
    * quantization-error signal the drift trigger watches. Codegen dot
    * kernels (‖v‖² − 2·v·c + ‖c‖²) against the broadcast K-row centroid
    * table — no per-row UDF. */
  private def meanSquaredDist(assigned: DataFrame): Double = {
    import graft.functions.VectorFunctions.dot
    val cdf = centroids.map { case (c, v) => (c, v.toSeq) }.toDF("cluster", "cv")
    assigned.join(broadcast(cdf), Seq("cluster"))
      .select((dot(col("v"), col("v"))
        - lit(2.0) * dot(col("v"), col("cv"))
        + dot(col("cv"), col("cv"))).as("d2"))
      .agg(avg(col("d2"))).head().getDouble(0)
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
      val batchMsd = meanSquaredDist(assigned)
      if (baselineMsd > 0 && batchMsd > driftFactor * baselineMsd) {
        retrains += 1
        retrain(currentAssigned().select(col("vec_id"), col("v")).unionByName(fresh), target)
      } else {
        // steady state: append the batch's rows into their buckets only
        state.commitAppend(target, Map(
          "assigned" -> assigned,
          "centroids" -> centroidsDf))
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
  def removeBatch(ids: DataFrame, version: Long): Option[BucketedCommitStats] =
    state.commitDelta(version, Map.empty,
      Map("assigned" -> ids.select(col("vec_id"))))

  /** Attach to a stream of (vec_id, v) rows; one ingest per micro-batch. */
  def start(vectorStream: DataFrame, checkpointDir: String): StreamingQuery =
    vectorStream.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) => insertBatch(batch, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
