package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Measured evidence for SCALING.md's video near-dup section (round 16):
  * on the dedup corpus (docs + exact re-crawl copies of every 4th +
  * 3-token near-dup tails of every 5th, read as 16-token-window "clips"),
  * report
  *
  *   - frame volume (the explode fan-out a 100 TB run pays per clip),
  *   - banded frame-candidate pairs (Σ occupancy-choose-2 over the
  *     (band, chunk) buckets — the verify stage's scan),
  *   - the largest single bucket (the skew watch: window-simhash buckets
  *     must track repeated window CONTENT — similarity mass — never a
  *     Θ(corpus) structural degeneracy; the rejected padded-grid variant
  *     failed exactly here),
  *
  * and for the shipped operator: clip verdicts, recall of planted exact
  * re-encodes, recall of planted tail-edits among clips with ≥ 2 frames
  * (a 1-frame clip's only frame IS the edit — out of scope by
  * construction), and the count of non-planted verdicts (tiny-vocab
  * fixture docs genuinely sharing half their windows).
  *
  * `runMain graft.tools.VideoSweep [dir]` (default SPARK_GRAFT_SF_DIR /
  * sf0.1). Deterministic end to end.
  */
object VideoSweep {
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

    val frames = Multimodal.videoFrames(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clips = frames.select(col("doc_id")).distinct().count()
    val nFrames = frames.count()
    val occ = frames
      .select(col("doc_id"), col("fhash"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("chunk", expr("shiftright(fhash, 15 * k) & 32767"))
      .groupBy(col("k"), col("chunk")).count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")).as("cand"),
        max(col("count")).as("hottest"))
      .head()
    println(s"VIDEO clips=$clips frames=$nFrames " +
      s"cand_pairs=${occ.getLong(0)} hottest_bucket=${occ.getLong(1)}")

    val out = Multimodal.videoDedup(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verdicts = out.count()
    val exactFound = out.filter(
      col("a_id") < 100000L && col("b_id") === col("a_id") + 100000L).count()
    val nearFoundAll = out.filter(
      col("a_id") < 100000L && col("b_id") === col("a_id") + 200000L).count()
    val other = verdicts - exactFound - nearFoundAll
    // denominators from the corpus construction + the ≥2-frame scope rule
    // (numerator restricted the same way, so the ratio is a true recall)
    val nfOf = Dedup.corpus(spark, dir)
      .select(col("doc_id"),
        expr("cast(ceil(size(split(lower(text), '\\\\s+')) / 16.0) as int)").as("nf"))
      .filter(col("doc_id") < 100000L)
    val exactPlanted = nfOf.filter(col("doc_id") % 4 === 0).count()
    val nearPlanted2f = nfOf.filter(col("doc_id") % 5 === 0 && col("nf") >= 2).count()
    val nearFound2f = out
      .join(nfOf.withColumnRenamed("doc_id", "a_id"), "a_id")
      .filter(col("b_id") === col("a_id") + 200000L && col("nf") >= 2).count()
    println(f"VIDEO verdicts=$verdicts exact_recall=${exactFound.toDouble / exactPlanted}%.3f " +
      f"near_recall_ge2f=${nearFound2f.toDouble / nearPlanted2f}%.3f other=$other")
    out.unpersist(blocking = true)
    frames.unpersist(blocking = true)
    CacheRegistry.release(blocking = true)
    spark.stop()
  }
}
