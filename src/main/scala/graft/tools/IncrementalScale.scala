package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.ArrayExpressions
import graft.operators.Dedup

/** The incremental-dedup scale probe: grow the BASE corpus ×K while the
  * delta batch stays FIXED — the axis a real crawl pipeline lives on (the
  * corpus accumulates; each day's crawl doesn't). SfScale's uniform ×K
  * replay scales base and delta together, which shows both paths
  * near-linear; THIS probe separates them:
  *
  *   - `full`         — the counterfactual: re-dedup the whole corpus ∪
  *                      delta from scratch (re-tokenize, re-shingle,
  *                      re-band, self-join) — O(base) per crawl;
  *   - `incremental`  — judge the delta against the STORED band table
  *                      (`dedup_incremental`'s plan): one narrow scan of
  *                      the bands + delta-bounded shingle/verify work;
  *   - `bands_build`  — the once-per-corpus cost the incremental path
  *                      amortizes (reported for honesty, measured
  *                      separately; in production it is maintained
  *                      incrementally by StreamingIncrementalDedup, never
  *                      rebuilt).
  *
  * Usage: runMain graft.tools.IncrementalScale [K] — prints one row per
  * scale in {1, K}.
  */
object IncrementalScale {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(10)
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

    val docs = spark.read.parquet(s"$base/documents.parquet")
      .select(col("doc_id"), col("text"))

    // fixed delta: a re-crawl batch referencing replica-0 docs (present at
    // every K) — 250 exact copies + 250 near-dups, ids far above any replica
    val delta = docs.filter(col("doc_id") < 250)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") >= 250 && col("doc_id") < 500)
        .select((col("doc_id") + 20000000L).as("doc_id"),
          concat(col("text"), lit(" near dup tail")).as("text")))

    // base ×K: replica 0 is the original corpus; other replicas get a
    // per-replica token suffix (unrelated texts, same length distribution)
    def baseAt(k: Int): DataFrame =
      if (k == 1) docs
      else SfScale.replicated(docs, "doc_id", k)
        .withColumn("text",
          when(col("rep") === 0, col("text")).otherwise(
            array_join(transform(split(col("text"), " "),
              t => concat(t, lit("r"), col("rep"))), " ")))
        .drop("rep")

    // warm each measured plan shape once before timing (the Bench/SfScale
    // discipline: first-run Janino/JIT compile is plan-shaped, not
    // data-sized, and belongs to the harness — it inflated the K=1
    // incremental row 30% before this)
    def timed(f: => Unit): Double = {
      f
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft-incscale").toString

    println(f"${"k"}%4s ${"n_base"}%8s ${"bands_build_s"}%14s ${"incremental_s"}%14s ${"full_s"}%8s")
    Seq(1, factor).foreach { k =>
      val b = baseAt(k)
      val nBase = b.count()
      // once-per-corpus: build + store the band table (parquet, like
      // index_build_minhash_bands)
      val bandsPath = s"$tmp/bands-x$k"
      val tBuild = timed {
        Dedup.bandedSignatures(Dedup.shingledOf(Dedup.toksOf(b)))
          .write.mode("overwrite").parquet(bandsPath)
      }
      val storedBands = spark.read.parquet(bandsPath)

      // per-crawl incremental: the dedup_incremental plan off the stored
      // bands; base shingles only for candidate-named docs
      val deltaSh = Dedup.shingledOf(Dedup.toksOf(delta))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tInc = timed {
        Dedup.incrementalVerdictFrames(
          storedBands,
          candIds => Dedup.shingledOf(Dedup.toksOf(
            b.join(broadcast(candIds), Seq("doc_id"), "left_semi"))),
          deltaSh)
          .write.format("noop").mode("overwrite").save()
      }
      deltaSh.unpersist(true)

      // per-crawl counterfactual: full re-dedup of base ∪ delta (the
      // minhashPairs shape — shingle and band EVERYTHING, self-join, verify)
      val tFull = timed {
        val sh = Dedup.shingledOf(Dedup.toksOf(b.unionByName(delta)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        try {
          val cand = Dedup.bandedCandidates(sh)
          cand.join(sh.select(col("doc_id").as("a_id"), col("hs").as("sa")), "a_id")
            .join(sh.select(col("doc_id").as("b_id"), col("hs").as("sb")), "b_id")
            .withColumn("inter", ArrayExpressions.sortedLongIntersectCount(col("sa"), col("sb")))
            .withColumn("jacc",
              col("inter").cast("double") / (size(col("sa")) + size(col("sb")) - col("inter")))
            .filter(col("jacc") >= 0.5)
            .write.format("noop").mode("overwrite").save()
        } finally sh.unpersist(true)
      }
      println(f"INCSCALE $k%4d $nBase%8d $tBuild%14.2f $tInc%14.2f $tFull%8.2f")
    }
    spark.stop()
  }
}
