package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.streaming.StreamingBpeMaintainer

/** Tokenizer fit under CHRONIC vocabulary shift (round 17, verdict r16
  * #6 — the IvfDriftScale methodology applied to the BPE maintainer): a
  * vocabulary trained once keeps serving while the corpus's morphology
  * drifts a sub-acute batch at a time — new domains arrive as a growing
  * OOV tail, effective fertility creeps up, and nothing fires. The
  * `retrainAtFertilityFactor` dial watches the committed change-sized
  * (words, effective tokens) counters; this tool measures both
  * schedules.
  *
  * Protocol (deterministic synthetic morphology — the controllable
  * analogue of IvfDriftScale's +δ coordinate shift):
  *   - BASE domain: words of the {ab, cd} digram families (`abab…`,
  *     `cdcd…`, lengths 4–10) — the 12-merge budget compresses them to
  *     1–3 tokens, so the trained baseline is a real fit;
  *   - DRIFT domain: the same shapes over {xy, zw} — unseen digrams, so
  *     the frozen vocab serves them at char-level fallback fertility;
  *   - stream 10 batches at a CALIBRATED constant drift share (targets a
  *     per-batch fertility ratio of ~1.3 — the IvfDriftScale δ
  *     calibration): every batch stays under the production 1.5 acute
  *     bar (printed per batch; the run REQUIREs it) while the growing
  *     stream walks the corpus-wide ratio across the dial;
  *   - `frozen`: dial off — the erosion baseline;
  *   - `policy`: dial 1.15 — `maybeRetrain` fires when the counters
  *     cross, the retrain re-induces the vocab over the stored corpus;
  *   - `scratch`: train directly on the final mixed corpus — the fit a
  *     policy retrain should restore.
  *   - observable per step: the dial's own counter ratio, an exact
  *     recomputation over the stored corpus (counter validation), and
  *     the effective fertility of a fixed DRIFT-DOMAIN probe under the
  *     current vocab — the serve-quality analogue of recall.
  *
  * Prints BPEDRIFT rows; results land in SCALING.md ("Tokenizer fit
  * under chronic vocabulary shift").
  *
  * Usage: runMain graft.tools.BpeDriftScale (sizes from
  * SPARK_GRAFT_SF_DIR's documents table, default sf0.1).
  */
object BpeDriftScale {
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

    val nDocs = spark.read.parquet(s"$base/documents.parquet").count()
    // the IvfDriftScale split: bootstrap on the first third, stream the
    // rest — the drifted mass must be able to outweigh the training set
    val baseN = nDocs / 3
    val batchN = math.max(1L, (nDocs - baseN) / Batches)

    // one doc = 20 words of its domain's digram family; everything is a
    // pure function of (doc_id, j) so both schedules stream identical data
    def wordExpr(digrams: String): String =
      s"""transform(sequence(1, 20), j ->
         |  repeat(element_at(array(${digrams.split(",").map(d => s"'$d'").mkString(",")}),
         |    cast(pmod(hash(id, j), 2) as int) + 1),
         |    cast(pmod(hash(id, j, 7), 4) as int) + 2))""".stripMargin
    def docsOf(ids: DataFrame, digrams: String): DataFrame =
      ids.select(col("id").as("doc_id"),
        concat_ws(" ", expr(wordExpr(digrams))).as("text"))
    def idRange(lo: Long, hi: Long): DataFrame =
      spark.range(lo, hi).select(col("id"))

    val initial = docsOf(idRange(0L, baseN), "ab,cd")
    // fixed drift-domain probe: the serve-quality observable
    val probe = docsOf(idRange(900000000L, 900000000L + 200L), "xy,zw")

    /** Effective fertility (tokens/word, OOV at char fallback) of `docs`
      * under `vocab` — the maintainer's own statistic, recomputed
      * independently here. */
    def fpwOf(docs: DataFrame, vocab: DataFrame): Double = {
      val r = Curation.fertilityTokens(
          docs.withColumn("source", lit("probe")), vocab)
        .agg(count(lit(1)).as("w"),
          sum(coalesce(col("n_tok"), length(col("word")).cast("long") + 1L))
            .as("t")).head()
      r.getLong(1).toDouble / r.getLong(0)
    }

    println(f"${"tag"}%-8s ${"step"}%4s ${"mix"}%5s ${"batch_ratio"}%11s " +
      f"${"fert_dial"}%9s ${"fert_exact"}%10s ${"probe_fpw"}%9s ${"sec"}%6s")
    def row(tag: String, step: Int, mix: Double, batchRatio: Double,
        dial: Double, exact: Double, probeFpw: Double, sec: Double): Unit =
      println(f"BPEDRIFT $tag%-8s $step%4d $mix%5.2f $batchRatio%11.3f " +
        f"$dial%9.3f $exact%10.3f $probeFpw%9.3f $sec%6.1f")

    var maxBatchRatio = 0.0
    def runSchedule(tag: String, dial: Double): StreamingBpeMaintainer = {
      val dir = java.nio.file.Files.createTempDirectory(s"bpedrift-$tag").toString
      // acute disabled inside the study (the IvfDriftScale isolation):
      // batch_ratio is the printed proof every batch sits under the
      // production 1.5 bar, i.e. the acute trigger could never have fired
      val m = new StreamingBpeMaintainer(spark, dir, initial,
        acuteFertilityFactor = 1e9, retrainAtFertilityFactor = dial,
        keepVersions = 2)
      val (b0, w0, t0) = m.fertInfo()
      var baseline = b0
      val t00 = System.nanoTime()
      val fallbackFpw = fpwOf(probe, m.currentVocab())
      // calibrate the drift share against THIS training's baseline (the
      // IvfDriftScale δ calibration): target each batch's fertility ratio
      // at ~1.3 — under the production 1.5 acute bar, chronically walking
      // the corpus toward the dial as the stream outgrows the base
      val mix = math.min(0.45,
        0.3 * baseline / math.max(fallbackFpw - baseline, 1e-9))
      row(tag, 0, 0.0, 1.0, m.fertilitySinceTrain(),
        t0.toDouble / w0 / baseline, fallbackFpw,
        (System.nanoTime() - t00) / 1e9)
      (0 until Batches).foreach { i =>
        val lo = 1000000L + i.toLong * batchN
        val driftCut = lo + math.round(batchN * mix)
        val batch = docsOf(idRange(lo, driftCut), "xy,zw")
          .unionByName(docsOf(idRange(driftCut, lo + batchN), "ab,cd"))
        val batchRatio = fpwOf(batch, m.currentVocab()) / baseline
        maxBatchRatio = math.max(maxBatchRatio, batchRatio)
        val t1 = System.nanoTime()
        m.insertBatch(batch, 2L * i)
        val fired = m.maybeRetrain(2L * i + 2).nonEmpty
        if (fired) {
          println(s"BPEDRIFT $tag retrain fired after step ${i + 1} " +
            f"(dial $dial%.2f, retrains ${m.retrains})")
          baseline = m.fertInfo()._1
        }
        val exact = fpwOf(m.currentDocs(), m.currentVocab()) / baseline
        row(tag, i + 1, mix, batchRatio, m.fertilitySinceTrain(), exact,
          fpwOf(probe, m.currentVocab()), (System.nanoTime() - t1) / 1e9)
      }
      m
    }

    val frozen = runSchedule("frozen", 1e9)
    require(maxBatchRatio < AcuteBar,
      f"calibration failed: a batch read $maxBatchRatio%.3f — over the $AcuteBar acute bar, " +
        "so the chronic study's premise (sub-acute batches) does not hold")

    // scratch control: the vocabulary a from-scratch training on the
    // final mixed corpus produces — the probe fit a policy retrain
    // should restore
    val t2 = System.nanoTime()
    val scratchDir = java.nio.file.Files.createTempDirectory("bpedrift-scratch").toString
    val scratch = new StreamingBpeMaintainer(spark, scratchDir,
      frozen.currentDocs(), keepVersions = 2)
    row("scratch", Batches, 0.0, 1.0, scratch.fertilitySinceTrain(), 1.0,
      fpwOf(probe, scratch.currentVocab()), (System.nanoTime() - t2) / 1e9)

    runSchedule("policy", PolicyDial)
    CacheRegistry.release(blocking = true)
    spark.stop()
  }
}
