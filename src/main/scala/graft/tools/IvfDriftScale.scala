package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dot
import graft.operators.IvfKMeans
import graft.streaming.StreamingIvfIndex

/** Quantizer health under CHRONIC distribution shift (round-16, verdict
  * r15 #3 — the TakedownRecallScale methodology applied to the IVF
  * maintainer): frozen centroids stop describing a corpus that drifts a
  * sub-acute batch at a time, and nothing fires — each batch passes the
  * per-batch `driftFactor` check while corpus-wide distortion (and
  * nprobe-limited serve recall on the drifted region) erodes. The
  * round-16 `retrainAtDistortionFactor` dial watches the committed
  * change-sized counters instead; this tool measures both schedules.
  *
  * Protocol:
  *   - bootstrap on the FIRST THIRD of the sf embeddings corpus;
  *   - stream the remaining two thirds over 10 batches, every coordinate
  *     shifted by a CALIBRATED δ chosen so each batch's own msd ratio
  *     sits under the 1.5 acute bar (printed per batch — the check that
  *     the acute trigger genuinely cannot see this failure);
  *   - per step report committed distortion (the dial's input), the
  *     independently recomputed exact corpus distortion (counter
  *     validation — difference is floating-point only), and recall@3 of
  *     the nprobe=2 served search vs brute force over the live corpus,
  *     averaged over 5 original + 5 drifted queries;
  *   - `frozen` schedule: dial disabled — the erosion baseline;
  *   - `policy` schedule: dial 1.15 — `maybeRetrain` runs in the
  *     maintainer loop and fires when the counters cross;
  *   - `scratch` control: full Lloyd training over the final corpus —
  *     what the policy retrain should restore.
  *
  * Prints IVFDRIFT rows; results land in SCALING.md ("Quantizer fit
  * under chronic drift").
  *
  * Usage: runMain graft.tools.IvfDriftScale (corpus from
  * SPARK_GRAFT_SF_DIR, default sf0.1). Deterministic end to end.
  */
object IvfDriftScale {
  private val K = 3
  private val NProbe = 2
  private val Batches = 10
  private val AcuteBar = 1.5
  private val PolicyDial = 1.15

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
    import spark.implicits._

    val e = spark.read.parquet(s"$base/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = e.count()
    val cut = n / 3
    val initial = CacheRegistry.persistTracked(e.filter(col("vec_id") < cut))
    val rest = e.filter(col("vec_id") >= cut)
    val dim = e.select(size(col("v"))).head().getInt(0)

    def d2(v: Column, c: Column): Column =
      dot(v, v) - lit(2.0) * dot(v, c) + dot(c, c)

    def meanD2(assigned: DataFrame, centroids: Seq[(Int, Array[Double])]): Double = {
      val cdf = centroids.map { case (c, cv) => (c, cv.toSeq) }.toDF("cluster", "cv")
      assigned.join(broadcast(cdf), Seq("cluster"))
        .agg(avg(d2(col("v"), col("cv")))).head().getDouble(0)
    }

    /** (recall@K, candidate-scan fraction) of the nprobe-limited served
      * search vs brute force over the live corpus — 5 original + 5
      * drifted queries, deterministic tie-break on vec_id. The scan
      * fraction is the serve-COST observable: drift piles the shifted
      * mass into whichever frozen cells sit nearest it, so nprobe cells
      * hold an ever-larger corpus share and the IVF speedup dies even
      * while recall holds; retraining splits the mass back toward
      * nprobe/K. */
    def recallOf(index: StreamingIvfIndex): (Double, Double) = {
      val assigned = CacheRegistry.persistTracked(index.currentAssigned())
      val queries = assigned.filter(col("vec_id") < 5)
        .unionByName(assigned.filter(col("vec_id") >= 1000000L)
          .orderBy(col("vec_id")).limit(5))
        .select(col("vec_id").as("qid"), col("v").as("qv"))
      val cdf = index.currentCentroids()
        .map { case (c, cv) => (c, cv.toSeq) }.toDF("cluster", "cv")
      val wq = Window.partitionBy(col("qid"))
      def topBy(df: DataFrame, scoreCol: Column, k: Int): DataFrame =
        df.withColumn("rn", row_number().over(
          wq.orderBy(scoreCol.asc, col("vec_id").asc))).filter(col("rn") <= k)
      // served: rank the K cells per query, search only the top-NProbe
      val cells = queries.join(broadcast(cdf))
        .withColumn("crn", row_number().over(
          wq.orderBy(d2(col("qv"), col("cv")).asc, col("cluster").asc)))
        .filter(col("crn") <= NProbe).select(col("qid"), col("qv"), col("cluster"))
      val candidates = assigned.join(cells, Seq("cluster"))
      val served = topBy(candidates, d2(col("qv"), col("v")), K)
        .select(col("qid"), col("vec_id"))
      // truth: brute force over everything
      val truth = topBy(assigned.join(broadcast(queries)), d2(col("qv"), col("v")), K)
        .select(col("qid"), col("vec_id"))
      val denom = truth.count()
      val r = served.join(truth, Seq("qid", "vec_id")).count().toDouble / denom
      val scanFrac = candidates.count().toDouble /
        (queries.count() * assigned.count())
      CacheRegistry.release(blocking = true)
      (r, scanFrac)
    }

    println(f"${"tag"}%-8s ${"step"}%4s ${"corpus"}%7s ${"batch_ratio"}%11s " +
      f"${"dist_dial"}%9s ${"dist_exact"}%10s ${"recall@3"}%8s ${"scan_frac"}%9s ${"sec"}%6s")
    def row(tag: String, step: Int, corpus: Long, batchRatio: Double,
        distDial: Double, distExact: Double, rs: (Double, Double), sec: Double): Unit =
      println(f"IVFDRIFT $tag%-8s $step%4d $corpus%7d $batchRatio%11.3f " +
        f"$distDial%9.3f $distExact%10.3f ${rs._1}%8.3f ${rs._2}%9.3f $sec%6.1f")

    var maxBatchRatio = 0.0
    def runSchedule(tag: String, dial: Double): StreamingIvfIndex = {
      val idxDir = java.nio.file.Files.createTempDirectory(s"ivfdrift-$tag").toString
      // the engine's ACUTE check is disabled inside the study (driftFactor
      // huge) so the chronic signal is isolated; the batch_ratio column is
      // the proof that every batch sits under the production 1.5 bar —
      // i.e. that the acute check, had it been on, would never have fired
      val index = new StreamingIvfIndex(spark, idxDir, initial,
        driftFactor = 1e9, keepVersions = 2,
        retrainAtDistortionFactor = dial)
      val (n0, s0) = index.distInfo()
      var baseline = s0 / n0
      // calibrate δ against THIS training's baseline: target a batch msd
      // ratio of ~1.3 (d² of a +δ-everywhere shift grows by roughly
      // dim·δ²; cross terms move it either way — the per-batch print is
      // the honest check against the acute bar)
      val delta = math.sqrt(0.3 * baseline / dim)
      var exactBaseline = baseline
      val t0 = System.nanoTime()
      row(tag, 0, n0, 1.0, index.distortionSinceTrain(), 1.0,
        recallOf(index), (System.nanoTime() - t0) / 1e9)
      (0 until Batches).foreach { i =>
        val batch = rest.filter(pmod(col("vec_id"), lit(Batches)) === i)
          .select((col("vec_id") + 1000000L).as("vec_id"),
            expr(s"transform(v, x -> x + ${delta}D)").as("v"))
        val batchRatio =
          meanD2(IvfKMeans.assign(batch, index.currentCentroids()), index.currentCentroids()) / baseline
        maxBatchRatio = math.max(maxBatchRatio, batchRatio)
        val t1 = System.nanoTime()
        index.insertBatch(batch, 2L * i)
        val fired = index.maybeRetrain(2L * i + 2).nonEmpty
        if (fired) {
          println(s"IVFDRIFT $tag retrain fired after step ${i + 1} " +
            f"(dial $dial%.2f, retrains ${index.retrains})")
          val (nn, ss) = index.distInfo()
          baseline = ss / nn; exactBaseline = baseline
        }
        val exact = meanD2(index.currentAssigned(), index.currentCentroids()) / exactBaseline
        row(tag, i + 1, index.distInfo()._1, batchRatio,
          index.distortionSinceTrain(), exact,
          recallOf(index), (System.nanoTime() - t1) / 1e9)
      }
      index
    }

    val frozen = runSchedule("frozen", 1e9)
    require(maxBatchRatio < AcuteBar,
      f"calibration failed: a batch read $maxBatchRatio%.3f — over the $AcuteBar acute bar, " +
        "so the chronic study's premise (sub-acute batches) does not hold")

    // scratch control over the frozen schedule's final corpus: what a
    // retrain restores
    val corpus = CacheRegistry.persistTracked(
      frozen.currentAssigned().select(col("vec_id"), col("v")))
    val t2 = System.nanoTime()
    val scratchDir = java.nio.file.Files.createTempDirectory("ivfdrift-scratch").toString
    val scratch = new StreamingIvfIndex(spark, scratchDir, corpus,
      driftFactor = AcuteBar, keepVersions = 2)
    row("scratch", Batches, corpus.count(), 1.0, scratch.distortionSinceTrain(),
      1.0, recallOf(scratch), (System.nanoTime() - t2) / 1e9)

    runSchedule("policy", PolicyDial)
    CacheRegistry.releaseShared()
    spark.stop()
  }
}
