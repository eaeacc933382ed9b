package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{CentroidResidual, VectorFunctions}
import graft.operators.{AnnRecall, Dedup, IvfKMeans}

/** Measured evidence for SCALING.md's clustered-blocking section: sweep
  * spread (cluster tightness) × planes over BOTH blocking strategies
  * (raw-vector hyperplane buckets vs residual buckets under a
  * (cluster, bucket) key) on the UNCAPPED clustered corpus, reporting
  * per run
  *
  *   - candidate pairs (what the verify stage must scan — the cost), and
  *   - manufactured-pair recall (how many of the planted near-dup pairs
  *     survive blocking — the quality; every planted pair passes the
  *     cosine threshold, so a miss is always a blocking split).
  *
  * `runMain graft.tools.NearDupSweep [dir]` (default SPARK_GRAFT_SF_DIR /
  * sf0.1; pass `target/sfscale_x10` after a SfScale run for the scaled
  * corpus). Deterministic end to end — planes, derivation, and Lloyd
  * training are the engine's own.
  */
object NearDupSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def candidatePairs(blocked: DataFrame, keys: Seq[String]): Long =
      blocked.groupBy(keys.map(col): _*).count()
        .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
        .head().getLong(0)

    // Spread axis (cluster tightness): 0.9 = the pinned hostile regime
    // (~45% noise energy), 1.5 = loosening, 2.4 = effectively uniform —
    // the same dial the recall harness swept, applied to BLOCKING.
    println(f"${"spread"}%6s ${"blocking"}%-10s ${"planes"}%6s ${"cand_pairs"}%12s ${"recall"}%7s")
    for (spread <- Seq(0.9, 1.5, 2.4)) {
      val e = AnnRecall.clusteredCorpusUncapped(spark, dir, spread)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val offset = e.agg(max(col("vec_id"))).head().getLong(0) + 1L
      val planted = e.filter(col("vec_id") % 10 === 0).count()
      // the quantizer is shared across the residual rows, as in the engine
      lazy val centroids = IvfKMeans.trainCentroids(e)

      for (planes <- Seq(8, 12, 16); residual <- Seq(false, true)) {
        val found = (if (residual)
          Dedup.nearDupResidualOn(e, centroids, planes, offset)
        else
          Dedup.nearDupPairsOn(e, planes, offset))
          .filter(col("b_id") === col("a_id") + offset).count()
        // occupancy of the same blocking over corpus ∪ planted copies
        val all = Dedup.withPerturbed(e, offset)
        val cand =
          if (residual) {
            val assigned = IvfKMeans.assign(all, centroids)
            candidatePairs(assigned.withColumn("bucket",
              VectorFunctions.hyperplaneBucket(
                CentroidResidual.column(col("v"), col("cluster"), centroids), planes)),
              Seq("cluster", "bucket"))
          } else
            candidatePairs(all.withColumn("bucket",
              VectorFunctions.hyperplaneBucket(col("v"), planes)), Seq("bucket"))
        val mode = if (residual) "residual" else "raw"
        println(f"SWEEP $spread%6.1f $mode%-10s $planes%6d $cand%12d ${found.toDouble / planted}%7.3f")
      }
      e.unpersist(blocking = true)
      CacheRegistry.release(blocking = true)
    }
    spark.stop()
  }
}
