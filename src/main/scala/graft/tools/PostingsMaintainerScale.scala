package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{StreamingChangeFeed, StreamingPostingsIndex}

/** The maintainer-tier bytes-axis probe (round-11 verdict #1's done
  * criterion): the CDC-fed postings maintainer must WRITE ∝ changes per
  * batch, not ∝ corpus — the same methodology as the lake's "CDC reads
  * price the changes" row, applied to maintainer WRITES.
  *
  * Axes, mirroring the CDC probe exactly:
  *
  *   - corpus base → ×K (replicated docs with per-replica token suffixes,
  *     so the vocabulary grows with the corpus like a real crawl's);
  *   - a FIXED change batch (the same few updated + inserted docs at every
  *     scale — the fixed-crawl axis);
  *   - `sized`: postings buckets ∝ corpus (per-bucket bytes pinned — the
  *     buckets ≈ tableBytes/target rule). Claim: per-batch written bytes
  *     stay FLAT while state bytes grow ×K, because a fixed batch touches
  *     a fixed number of word-buckets whose size didn't grow;
  *   - `pinned`: bucket count frozen at the base dial. Control: written
  *     bytes grow ~×K (same touched buckets, each K× fatter).
  *
  * Also printed: the full-commit counterfactual (state + table bytes — what
  * the pre-refit VersionedState maintainer rewrote per batch at ANY batch
  * size), and bootstrap/apply wall-clock.
  *
  * Usage: runMain graft.tools.PostingsMaintainerScale [K] (default 10;
  * base dir from SPARK_GRAFT_SF_DIR, default sf0.1).
  */
object PostingsMaintainerScale {
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

    // games-shaped corpus at ×k: replicas carry suffixed tokens (disjoint
    // vocabularies — a growing corpus grows its dictionary)
    def gamesAt(k: Int): DataFrame = {
      val d = if (k == 1) docs
      else SfScale.replicated(docs, "doc_id", k)
        .withColumn("text",
          when(col("rep") === 0, col("text")).otherwise(
            array_join(transform(split(col("text"), " "),
              t => concat(t, lit("r"), col("rep"))), " ")))
        .drop("rep")
      d.select(
        col("doc_id").as("universeId"),
        (col("doc_id") + 1000000L).as("rootPlaceId"),
        array_join(slice(split(col("text"), " "), 1, 4), " ").as("name"),
        col("text").as("description"),
        lit(null).cast("string").as("gameplayDescription"),
        (col("doc_id") % 100).as("playerCount"))
    }

    // the FIXED change batch: 5 re-crawled docs (new names — their old
    // description words become stale postings) + 2 brand-new docs
    def fixedBatch(): DataFrame = {
      val upd = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("universeId"),
          (col("doc_id") + 5000000L).as("rootPlaceId"),
          concat(lit("recrawled title nr"), col("doc_id")).as("name"),
          concat(lit("fresh body text nr"), col("doc_id")).as("description"),
          lit(null).cast("string").as("gameplayDescription"),
          lit(7L).as("playerCount"))
      val ins = docs.filter(col("doc_id") >= 5 && col("doc_id") < 7)
        .select((col("doc_id") + 30000000L).as("universeId"),
          (col("doc_id") + 35000000L).as("rootPlaceId"),
          concat(lit("netnew game nr"), col("doc_id")).as("name"),
          concat(lit("netnew body nr"), col("doc_id")).as("description"),
          lit(null).cast("string").as("gameplayDescription"),
          lit(3L).as("playerCount"))
      upd.unionByName(ins)
    }

    // round-13: the sized dial comes from the ONE policy home exactly as
    // the maintainer's shipped default computes it — buckets ∝ POSTINGS
    // rows at the policy occupancy — so this replay measures the shipped
    // configuration, not a hand dial
    def sizedFor(k: Int): Int = graft.operators.SizingPolicy.sizedStateBuckets(
      graft.operators.TextSearch.postingsOf(gamesAt(k)).count())
    val baseBuckets = sizedFor(1)
    val tmp = java.nio.file.Files.createTempDirectory("graft-pidxscale").toString
    println(f"${"tag"}%-7s ${"k"}%3s ${"buckets"}%8s ${"touched"}%8s " +
      f"${"written_b"}%10s ${"state_b"}%10s ${"full_commit_b"}%14s " +
      f"${"boot_s"}%7s ${"apply_s"}%8s")

    def run(tag: String, k: Int, pBuckets: Int): Unit = {
      val dir = s"$tmp/$tag-x$k"
      val games = gamesAt(k)
      val cf = new StreamingChangeFeed(spark, s"$dir/table", s"$dir/feed",
        games, "universeId",
        overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
        coalesceCols = Seq("description"), keepCols = Seq("gameplayDescription"),
        buckets = 16 * k, feedPreimages = true)
      val t0 = System.nanoTime()
      val idx = new StreamingPostingsIndex(spark, s"$dir/table", s"$dir/feed",
        s"$dir/state", buckets = pBuckets, keepVersions = 2)
      val bootS = (System.nanoTime() - t0) / 1e9
      cf.applyBatch(fixedBatch(), 0L)
      val t1 = System.nanoTime()
      val st = idx.applyFeedVersion(1).get
      val applyS = (System.nanoTime() - t1) / 1e9
      // full-commit counterfactual: the pre-refit maintainer rewrote
      // postings + dictionary + the games snapshot per batch
      val tableBytes = {
        val p = new org.apache.hadoop.fs.Path(s"$dir/table")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        def db(q: org.apache.hadoop.fs.Path): Long =
          if (!fs.exists(q)) 0L
          else fs.listStatus(q).map(s0 =>
            if (s0.isDirectory) db(s0.getPath) else s0.getLen).sum
        db(p)
      }
      println(f"$tag%-7s $k%3d ${st.totalBuckets}%8d ${st.touchedBuckets}%8d " +
        f"${st.writtenBytes}%10d ${st.stateBytes}%10d ${st.stateBytes + tableBytes}%14d " +
        f"$bootS%7.1f $applyS%8.2f")
    }

    run("sized", 1, baseBuckets)
    run("sized", factor, sizedFor(factor))
    run("pinned", factor, baseBuckets)
    spark.stop()
  }
}
