package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

import graft.operators.Nsw

/** The SERVE side of the incremental index pair — the streaming analogue of
  * [[graft.tools.IndexStore]]'s read path: a long-running query-answering
  * process that watches [[BucketedAppendState]]'s manifest log and swaps in
  * a freshly committed index version mid-stream, without restarting.
  *
  * Contract with the writer ([[StreamingNswIndex]]): the writer commits
  * `vectors`/`knn` versions through bucket-pruned manifest appends; this
  * server re-reads the latest manifest version once per request
  * micro-batch (one listing op) and rebuilds its cached handles ONLY when
  * it moved — so steady-state serving pays zero re-read cost, and an index
  * commit becomes visible at the next batch boundary. Both tables of a
  * refresh are pinned to the SAME observed version
  * ([[BucketedAppendState.readAt]] — one manifest names both), so a writer
  * advancing mid-refresh can never produce a torn vectors/edges pair. The served edge table is
  * persisted (and the previous version's unpersisted) on swap: the
  * symmetrize + long-link overlay is computed once per version, not per
  * request batch.
  *
  * Retention coupling: keep-last-K deletes versions ≤ latest − K, so a
  * server that refreshes at batch cadence can never hold a pruned version
  * (it always serves `latest`). A reader paused longer than K writer
  * commits re-reads `latest` on its next batch — the same freshness
  * semantics as a lakehouse reader after VACUUM.
  *
  * At 100 TB: requests arrive as micro-batches of query vectors; each batch
  * costs one [[Nsw.serveTopK]] beam sweep (bounded hops × beam × degree per
  * query, frontier state in DataFrames), and index growth never blocks
  * serving — the writer builds version N+1 while this serves N.
  *
  * ROUTED serving (round 11): pass `quantizerDir` — a
  * [[StreamingIvfIndex]]'s state root — and each batch routes through the
  * latest committed centroids with query-nearest seeds
  * ([[Nsw.routedServeTopK]], the streaming twin of the batch routed
  * search that measured served recall 1.00 at ×10/×100 vs 0.07–0.27
  * fixed-entry). The corpus assignment is computed once per
  * (quantizer version, graph version) pair and cached, NOT per batch; the
  * two commit pointers advance independently, and a stale quantizer only
  * degrades seed quality (the beam rescores all visited nodes exactly).
  */
class NswIndexServer(spark: SparkSession, baseDir: String,
    quantizerDir: Option[String] = None) extends Serializable {

  // read-only views over the writers' bucketed manifest state (round-12
  // refit — same latest/readAt surface the VersionedState reads had)
  private val state = new BucketedAppendState(spark, baseDir)
  private val quantizerState = quantizerDir.map(d => new BucketedAppendState(spark, d))

  // (version, vectors, served edge table, corpus size) — swapped atomically
  // under this object's lock; volatile so a concurrent reader thread sees
  // the swap. The corpus size rides along so the sized serve dials never
  // cost a count() job per request batch (ADVICE r11 #4) — it is a
  // per-VERSION constant, computed once at refresh.
  @volatile private var served: Option[(Long, DataFrame, DataFrame, Long)] = None

  // (quantizer version, graph version, centroids, served vectors with
  // their cluster column) — refreshed when EITHER pointer moves (the
  // assignment depends on both). The two pointers advance independently
  // (graph writer vs quantizer writer); routing with a slightly stale
  // quantizer only degrades seed quality, never correctness — the beam
  // rescores everything it visits exactly.
  @volatile private var routing:
    Option[(Long, Long, Seq[(Int, Array[Double])], DataFrame)] = None

  /** Refreshes performed (first load included) — observable so tests and
    * operators can verify steady-state serving does NOT reload. */
  @volatile var refreshCount: Long = 0L

  def servedVersion: Option[Long] = served.map(_._1)

  /** One pointer read; reload handles only if it moved. Returns true when a
    * new version was swapped in. */
  def refreshIfStale(): Boolean = synchronized {
    val v = state.latest.getOrElse(sys.error(s"no committed index under $baseDir"))
    if (served.exists(_._1 == v)) false
    else {
      val vectors = state.readAt("vectors", v).persist(StorageLevel.MEMORY_AND_DISK)
      val n = vectors.count() // materialize + size the dials, once per version
      val edges = Nsw.symmetrizeWithLongLinks(vectors, state.readAt("knn", v), 1)
        .persist(StorageLevel.MEMORY_AND_DISK)
      edges.count() // materialize the overlay once per version, not per batch
      served.foreach { case (_, oldV, oldE, _) =>
        oldV.unpersist(blocking = false); oldE.unpersist(blocking = false)
      }
      served = Some((v, vectors, edges, n))
      refreshCount += 1
      true
    }
  }

  /** Reload centroids + assignment if either pointer moved. No committed
    * quantizer version yet → serve unrouted until one appears. */
  private def refreshRoutingIfStale(): Unit = synchronized {
    quantizerState.foreach { qs =>
      (qs.latest, served) match {
        case (Some(qv), Some((gv, vectors, _, _)))
            if !routing.exists(r => r._1 == qv && r._2 == gv) =>
          val cents = qs.readAt("centroids", qv).collect()
            .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
          val assigned = graft.operators.IvfKMeans.assign(vectors, cents)
            .persist(StorageLevel.MEMORY_AND_DISK)
          assigned.count() // one assignment pass per (quantizer, graph) version
          routing.foreach(_._4.unpersist(blocking = false))
          routing = Some((qv, gv, cents, assigned))
          refreshCount += 1
        case _ => ()
      }
    }
  }

  /** Answer one batch of `(query_id, qv)` requests against the currently
    * served version: top-k neighbors per query. With a quantizer attached
    * (and at least one committed centroid version), serving ROUTES — the
    * streaming twin of the batch routed search that measured served
    * recall 1.00 at ×10/×100; without one it is the fixed-entry beam. */
  def answer(queries: DataFrame): DataFrame = {
    refreshIfStale()
    refreshRoutingIfStale()
    val (_, vectors, edges, n) = served.get
    val q = queries.select(col("query_id"), col("qv"))
    routing match {
      case Some((_, _, cents, assigned)) =>
        Nsw.routedServeTopK(vectors, edges, q, cents, assigned,
          Nsw.sizedHops(n), Nsw.sizedBeam(n), Nsw.sizedProbeCells(n))
      case None => Nsw.serveTopK(vectors, edges, q)
    }
  }

  /** Attach to a request stream; answers append to `outDir` parquet tagged
    * with their micro-batch id (at-least-once on retry — downstream dedups
    * on (batch_id, query_id, rank) if it needs exactly-once). */
  def start(queryStream: DataFrame, checkpointDir: String, outDir: String): StreamingQuery =
    queryStream.writeStream
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        answer(batch.toDF()).withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
