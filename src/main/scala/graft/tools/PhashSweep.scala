package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Measured evidence for SCALING.md's perceptual-hash dedup section
  * (round-15, verdict r14 #2's NearDupSweep-style row): on the dedup
  * corpus (500 docs + exact re-crawl copies of every 4th + 3-token
  * near-dup tails of every 5th), report
  *
  *   - banded candidate pairs (Σ occupancy-choose-2 over (band, chunk)
  *     buckets — what the verify stage must scan; the blocking cost),
  *   - the largest single bucket (the skew watch: a Θ(corpus) bucket is
  *     the all-pairs degeneracy the doc-derived pad exists to prevent),
  *
  * and per Hamming threshold: verified pairs, recall of the planted
  * exact copies, and recall of the planted near-dup tails.
  *
  * `runMain graft.tools.PhashSweep [dir]` (default SPARK_GRAFT_SF_DIR /
  * sf0.1). Deterministic end to end.
  */
object PhashSweep {
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

    val hashed = Multimodal.phashFrame(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docs = hashed.count()
    val occ = Multimodal.phashChunks(hashed)
      .groupBy(col("k"), col("chunk")).count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")).as("cand"),
        max(col("count")).as("hottest"))
      .head()
    println(s"PHASH docs=$docs cand_pairs=${occ.getLong(0)} hottest_bucket=${occ.getLong(1)}")

    // planted ground truth: exact copies at +100000, near-dup tails at
    // +200000 (Dedup.corpus's construction)
    val exactPlanted = hashed.filter(col("doc_id") >= 100000L && col("doc_id") < 200000L).count()
    val nearPlanted = hashed.filter(col("doc_id") >= 200000L).count()
    println(f"${"maxHamming"}%10s ${"pairs"}%8s ${"exact_recall"}%12s ${"near_recall"}%11s")
    for (h <- Seq(0, 2, 4, 6, 8, 10)) {
      val pairs = Multimodal.phashPairs(hashed, h)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = pairs.count()
      // identify planted pairs POSITIVELY (base id on the left): a doc
      // divisible by 20 has BOTH a +100000 exact copy and a +200000 tail,
      // so the (x+100000, x+200000) Hamming-close pair also differs by
      // exactly 100000 — a difference-only test counts it as "exact" and
      // the recall can read > 1.0 (ADVICE r15 #1)
      val exactFound = pairs.filter(
        col("a_id") < 100000L && col("b_id") === col("a_id") + 100000L).count()
      val nearFound = pairs.filter(
        col("a_id") < 100000L && col("b_id") === col("a_id") + 200000L).count()
      println(f"SWEEP $h%10d $n%8d ${exactFound.toDouble / exactPlanted}%12.3f ${nearFound.toDouble / nearPlanted}%11.3f")
      pairs.unpersist(blocking = true)
    }
    hashed.unpersist(blocking = true)
    CacheRegistry.release(blocking = true)
    spark.stop()
  }
}
