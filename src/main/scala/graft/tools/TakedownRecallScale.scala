package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Nsw, Similarity}
import graft.streaming.StreamingNswIndex

/** Serve health under SUSTAINED takedowns (round-13 verdict #4):
  * `StreamingNswIndex.removeBatch` drops vectors and their OUTGOING
  * adjacency; survivors' edges TO deleted ids dangle harmlessly for
  * SCORING (every serve path scores through an inner join on the vectors
  * table), but each dangling edge is a wasted beam move — cumulative
  * deletion thins the graph's usable connectivity, and nothing had
  * measured recall after a large fraction of the corpus leaves.
  *
  * Protocol (the DeleteScale replay methodology, recall axis):
  *   - bootstrap the maintained index over the sf embeddings corpus;
  *   - delete deterministic pseudo-random id bands cumulatively
  *     (10 % steps to 50 %), PROTECTING the three 5-query blocks so the
  *     measurement queries survive — entry nodes are NOT protected
  *     (entry erosion is part of the serve-health story);
  *   - after each step, recall@3 of the maintained graph's beam search
  *     vs brute force over the SURVIVORS, averaged over the 3 disjoint
  *     query blocks;
  *   - `repaired` schedule: the same deletes with
  *     [[StreamingNswIndex.repairBatch]] after each batch (the
  *     maintenance cadence the repair op is for);
  *   - `repair1x`: one repair pass over the fully-eroded graph;
  *   - control: a FRESH rebuild over the same survivors (`commitFull`
  *     retrain), separating connectivity EROSION (repairable) from what
  *     the survivor corpus supports at all.
  *
  * Prints TAKEDOWNRECALL rows; results land in SCALING.md ("Serve
  * recall under sustained takedowns").
  *
  * Usage: runMain graft.tools.TakedownRecallScale (corpus from
  * SPARK_GRAFT_SF_DIR, default sf0.1).
  */
object TakedownRecallScale {
  private val K = 3
  private val QueryBlocks = Seq(0L, 600L, 1200L)

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val e = spark.read.parquet(s"$base/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = e.count()
    val protectedIds = QueryBlocks.flatMap(lo => lo until lo + 5).toSet
    require(protectedIds.forall(_ < n), s"query blocks need $n > 1205 vectors")

    def recallOf(vectors: DataFrame, edges: DataFrame): Double = {
      val vs = CacheRegistry.persistTracked(vectors)
      val nn = vs.count()
      val per = QueryBlocks.map { lo =>
        val served = Nsw.searchWithEdgesDials(vs, edges,
          Nsw.sizedHops(nn), Nsw.sizedBeam(nn), lo)
          .select(col("query_id"), col("neighbor_id"))
        val truth = Similarity.annBruteForceKOn(vs, K, lo)
          .select(col("query_id"), col("neighbor_id"))
        val denom = truth.count()
        if (denom == 0) 1.0
        else served.join(truth, Seq("query_id", "neighbor_id")).count()
          .toDouble / denom
      }
      CacheRegistry.release(blocking = true)
      per.sum / per.size
    }

    println(f"${"tag"}%-10s ${"del_frac"}%8s ${"survivors"}%9s " +
      f"${"entries"}%7s ${"recall@3"}%8s ${"sec"}%6s")
    def row(tag: String, frac: Double, r: Double, entries: Long, surv: Long,
        sec: Double): Unit =
      println(f"TAKEDOWNRECALL $tag%-10s $frac%8.2f $surv%9d " +
        f"$entries%7d $r%8.3f $sec%6.1f")

    def entriesLeft(vectors: DataFrame): Long =
      vectors.filter(col("vec_id") < Nsw.Entries).count()

    def band(step: Int): DataFrame = e.filter(
      pmod(xxhash64(col("vec_id")), lit(100L)) >= (step - 1) * 10 &&
      pmod(xxhash64(col("vec_id")), lit(100L)) < step * 10 &&
      !col("vec_id").isin(protectedIds.toSeq.map(java.lang.Long.valueOf): _*))
      .select(col("vec_id"))

    /** The 5-step deletion schedule against a fresh index; returns it.
      * `rebuildAt` > 1 disables the round-15 rebuild policy (the eroded /
      * repaired baselines); the `policy` schedule sets the dial so the
      * maintainer loop itself triggers the retrain. */
    def runSchedule(tag: String, repairEach: Boolean,
        rebuildAt: Double = 2.0): StreamingNswIndex = {
      val idxDir = java.nio.file.Files.createTempDirectory(s"tdr-$tag").toString
      val index = new StreamingNswIndex(spark, s"$idxDir/idx", e, keepVersions = 2,
        rebuildAtDeletedFraction = rebuildAt)
      if (!repairEach) {
        val t0 = System.nanoTime()
        val r0 = recallOf(index.currentVectors(), index.servedEdges())
        row("base", 0.0, r0, entriesLeft(index.currentVectors()), n,
          (System.nanoTime() - t0) / 1e9)
      }
      var version = 1L
      (1 to 5).foreach { step =>
        index.removeBatch(band(step), version); version += 1
        if (repairEach) { index.repairBatch(version); version += 1 }
        if (rebuildAt <= 1.0) {
          val fired = index.maybeRebuild(version).nonEmpty; version += 1
          if (fired) println(f"TAKEDOWNRECALL $tag%-10s rebuild fired after step $step")
        }
        val t1 = System.nanoTime()
        val vs = index.currentVectors()
        val surv = vs.count()
        val r = recallOf(vs, index.servedEdges())
        row(tag, 1.0 - surv.toDouble / n, r, entriesLeft(vs), surv,
          (System.nanoTime() - t1) / 1e9)
      }
      index
    }

    // eroded schedule, then ONE repair pass over the eroded graph
    val eroded = runSchedule("maintained", repairEach = false)
    val tR = System.nanoTime()
    eroded.repairBatch(6L)
    val vsR = eroded.currentVectors()
    row("repair1x", 1.0 - vsR.count().toDouble / n,
      recallOf(vsR, eroded.servedEdges()), entriesLeft(vsR), vsR.count(),
      (System.nanoTime() - tR) / 1e9)

    // control: a fresh rebuild over the same survivors — the retrain path
    // heavy deletion routes to (BucketedAppendState.commitFull)
    val survivors = CacheRegistry.persistTracked(
      vsR.select(col("vec_id"), col("v")))
    val t2 = System.nanoTime()
    val rebuiltEdges = Nsw.symmetrizeWithLongLinks(survivors,
      Nsw.knnEdgesOn(survivors), 1)
    row("rebuilt", 1.0 - survivors.count().toDouble / n,
      recallOf(survivors, rebuiltEdges), entriesLeft(survivors),
      survivors.count(), (System.nanoTime() - t2) / 1e9)

    // the maintenance cadence: repair after every takedown batch
    runSchedule("repaired", repairEach = true)

    // the round-15 POLICY schedule: repair each batch AND let the
    // deleted-fraction dial (0.3) trigger the retrain from inside the
    // maintainer loop — the configured recall floor, measured
    runSchedule("policy", repairEach = true, rebuildAt = 0.3)
    CacheRegistry.releaseShared()
    spark.stop()
  }
}
