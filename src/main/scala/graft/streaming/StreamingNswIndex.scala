package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Nsw

/** Incremental NSW index maintenance under streaming ingest — the
  * composition the streaming upsert + streaming dedup imply: new vectors
  * arrive continuously, and the graph-ANN index grows with them instead of
  * being rebuilt.
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
  * Storage is [[VersionedState]]: retry-safe overwrite writes at
  * batchId-derived versions, an atomic commit pointer (a restarted writer
  * resumes from it instead of rebuilding), and keep-last-K retention so
  * the versioned corpus copies don't accumulate forever. At 100 TB the
  * per-batch cost is the insertion search (batch-sized × graph hops),
  * never a corpus-sized rebuild: the entire point of maintaining the
  * index incrementally.
  */
class StreamingNswIndex(spark: SparkSession, baseDir: String, initial: DataFrame,
    keepVersions: Int = 3) extends Serializable {

  private val state = new VersionedState(spark, baseDir, keepVersions)
  if (state.latest.isEmpty)
    state.commit(0L, Map(
      "vectors" -> initial,
      "knn" -> Nsw.knnEdgesOn(initial.select(col("vec_id"), col("v")))))

  def currentVectors(): DataFrame = state.read("vectors")
  def currentKnn(): DataFrame = state.read("knn")

  /** The searchable edge table of the current version: k-NN state plus the
    * serve-time symmetrize + small-world overlay. */
  def servedEdges(): DataFrame =
    Nsw.symmetrizeWithLongLinks(currentVectors(), currentKnn(), 1)

  /** Insert one micro-batch of (vec_id, v) rows: search-then-connect, then
    * commit vectors/knn at version batchId+1. A batch whose version is
    * already committed (foreachBatch replay after a post-commit failure) is
    * a no-op — re-running it would read the very dirs it overwrites. */
  def insertBatch(batch: Dataset[Row], batchId: Long): Unit = {
    val target = batchId + 1
    if (state.latest.exists(_ >= target)) return
    val e = currentVectors()
    val fresh = batch.toDF().select(col("vec_id"), col("v"))
      // id-idempotent under stream replay, like the anti-join re-runs
      .join(e.select(col("vec_id")), Seq("vec_id"), "left_anti")
    if (!fresh.isEmpty) {
      val newKnn = Nsw.insertKnn(e, servedEdges(), fresh)
      state.commit(target, Map(
        "vectors" -> e.unionByName(fresh),
        "knn" -> currentKnn().unionByName(newKnn)))
    }
  }

  /** Attach to a stream of (vec_id, v) rows; one insertion per micro-batch. */
  def start(vectorStream: DataFrame, checkpointDir: String): StreamingQuery =
    vectorStream.writeStream
      .foreachBatch((batch: Dataset[Row], id: Long) => insertBatch(batch, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Top-3 neighbors for the 5 fixture queries over the grown graph —
    * the per-batch search shape, for comparing against a from-scratch
    * rebuild. */
  def search(): DataFrame =
    Nsw.searchWithEdges(currentVectors(), servedEdges())
}
