package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Measured evidence for SCALING.md's audio near-dup section (round 16):
  * on the audio corpus (the dedup corpus plus a PREFIX-SHIFTED family —
  * every 7th doc behind a 4-token intro, exactly one hop), report
  * subfingerprint volume, banded candidate mass and the hottest bucket
  * (the skew watch), and for the shipped operator: verdict counts,
  * recall of each planted family, and the OFFSET ATTRIBUTION check —
  * every caught shifted copy must align at exactly −1 hop, which is the
  * property set-based matching cannot produce.
  *
  * `runMain graft.tools.AudioSweep [dir] [hop]` (default
  * SPARK_GRAFT_SF_DIR / sf0.1, hop 4). The hop arg prices the
  * candidate-mass dial (round 17): replays the whole pipeline at a
  * coarser subfingerprint rate — candidate mass falls ~quadratically,
  * and the shifted-family recall row shows what the coarser hop can no
  * longer attribute (a 4-token intro is sub-hop at hop 8).
  */
object AudioSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val hop = args.lift(1).flatMap(_.toIntOption).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val subs = Multimodal.audioSubs(spark, dir, hop = hop)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clips = subs.select(col("doc_id")).distinct().count()
    val nSubs = subs.count()
    val occ = subs
      .select(col("doc_id"), col("fp"), explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("chunk", expr("shiftright(fp, 15 * k) & 32767"))
      .groupBy(col("k"), col("chunk")).count()
      .agg(sum((col("count") * (col("count") - 1) / 2).cast("long")).as("cand"),
        max(col("count")).as("hottest"))
      .head()
    println(s"AUDIO hop=$hop clips=$clips subfps=$nSubs " +
      s"cand_pairs=${occ.getLong(0)} hottest_bucket=${occ.getLong(1)}")

    val out = Multimodal.audioPairsFromSubs(subs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val verdicts = out.count()
    val nBase = graft.io.Tables.documents(spark, dir).count()
    def fam(offset: Long, modulo: Long): (Long, Long) = {
      val found = out.filter(
        col("a_id") < 100000L && col("b_id") === col("a_id") + offset)
      (found.count(), nBase / modulo + (if (nBase % modulo > 0) 1 else 0))
    }
    val (exF, exP) = fam(100000L, 4L)
    val (shF, shP) = fam(300000L, 7L)
    val nearF = out.filter(
      col("a_id") < 100000L && col("b_id") === col("a_id") + 200000L).count()
    // offset attribution: every caught shifted copy aligns at −1 exactly
    val shiftBad = out.filter(
      col("a_id") < 100000L && col("b_id") === col("a_id") + 300000L &&
        col("best_offset") =!= -1).count()
    println(f"AUDIO verdicts=$verdicts exact_recall=${exF.toDouble / exP}%.3f " +
      f"shifted_recall=${shF.toDouble / shP}%.3f shifted_misaligned=$shiftBad " +
      f"near_found=$nearF")
    out.unpersist(blocking = true)
    subs.unpersist(blocking = true)
    CacheRegistry.release(blocking = true)
    spark.stop()
  }
}
