package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AnnRecall, Dedup, IvfKMeans}

/** Measured evidence for SemDeDup's two dials — the similarity threshold
  * τ and the cluster count K — across both corpus geometries, because the
  * right settings are corpus-dependent and the paper's defaults
  * (τ near 0.95, K large) deserve the same "measure per corpus" treatment
  * this repo gives every other approximate operator.
  *
  * Reported per (geometry, K, τ):
  *   - `pruned%`  — fraction of the working corpus dropped (keep=0): the
  *     data-budget cost of the setting;
  *   - `planted%` — fraction of the manufactured near-dup pairs whose two
  *     members CO-ASSIGN to one cell and lose exactly one member: the
  *     recall of the ground-truth duplicates (a split pair cannot be
  *     caught — the clustering recall trade, same as residual blocking);
  *   - `cand_pairs` — within-cell candidate pairs (the quadratic the
  *     K dial bounds).
  *
  * `runMain graft.tools.SemDedupSweep [dir]` — table to stdout.
  */
object SemDedupSweep {
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

    import graft.functions.VectorFunctions
    val flat = graft.io.Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
    // spread 0.9 = the pinned hostile regime (member-member cos ≈ 0.55);
    // spread 0.3 = tight clusters (member-member cos ≈ 0.92 — INSIDE the
    // τ range people actually use, which is where the dial gets dangerous)
    val geometries = Seq(
      ("flat", flat),
      ("clus/0.9", AnnRecall.clusteredCorpusUncapped(spark, dir, 0.9)),
      ("clus/0.3", AnnRecall.clusteredCorpusUncapped(spark, dir, 0.3)))

    println(f"${"geometry"}%-10s ${"K"}%4s ${"tau"}%5s ${"pruned%"}%8s ${"planted%"}%9s ${"cand_pairs"}%11s")
    for ((gname, e0) <- geometries) {
      val e = e0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val offset = e.agg(max(col("vec_id"))).head().getLong(0) + 1L
      val nPlanted = e.filter(col("vec_id") % 10 === 0).count()
      for (k <- Seq(8, 32)) {
        val cents = IvfKMeans.trainCentroidsK(e, k)
        val assigned = IvfKMeans.assign(Dedup.withPerturbed(e, offset), cents)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cand = assigned.groupBy(col("cluster")).count()
          .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")))
          .head().getLong(0)
        val n = assigned.count()
        for (tau <- Seq(0.50, 0.90, 0.95)) {
          val out = Dedup.semanticOn(e, cents, offset, tau)
            .select(col("vec_id"), col("keep"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val pruned = out.filter(col("keep") === 0L).count()
          // a planted pair is CAUGHT when exactly one of (id, id+offset)
          // survives; count via self-join on the id distance
          val a = out.select(col("vec_id").as("a_id"), col("keep").as("ka"))
          val b = out.select((col("vec_id") - offset).as("a_id"), col("keep").as("kb"))
          val caught = a.join(b, "a_id")
            .filter(col("ka") + col("kb") === 1L).count()
          println(f"$gname%-10s $k%4d $tau%5.2f ${100.0 * pruned / n}%7.1f%% ${100.0 * caught / nPlanted}%8.1f%% $cand%11d")
          out.unpersist(true)
        }
        assigned.unpersist(true)
      }
      e.unpersist(true)
    }
    spark.stop()
  }
}
