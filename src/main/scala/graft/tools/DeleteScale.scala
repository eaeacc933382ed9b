package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Merge, SizingPolicy}

/** The takedown bytes-axis probe (round-13): `Merge.deleteWhere` must
  * price a FIXED takedown batch by its touched buckets, not by table
  * size — the same methodology as the CDC-read and maintainer-write
  * probes, applied to the lake's delete path.
  *
  * Axes:
  *   - games-shaped corpus at base → ×K (replica ids offset past the
  *     base range, so id buckets stay uniformly filled);
  *   - a FIXED 12-key takedown (the same ids at every scale — a
  *     takedown request does not grow with the corpus);
  *   - lake buckets ∝ corpus ([[SizingPolicy.sizedStateBuckets]], the
  *     shipped dial — per-bucket bytes pinned). Claim: rewritten bytes
  *     stay FLAT across scales while table bytes grow ×K;
  *   - `pinned`: bucket count frozen at the base dial — the control
  *     whose touched buckets each grow K× fatter.
  *
  * Usage: runMain graft.tools.DeleteScale [K] (default 10; base corpus
  * from SPARK_GRAFT_SF_DIR, default sf0.1).
  */
object DeleteScale {
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

    def gamesAt(k: Int): DataFrame = {
      val d = if (k == 1) docs else SfScale.replicated(docs, "doc_id", k)
        .drop("rep")
      d.select(
        col("doc_id").as("universeId"),
        (col("doc_id") + 1000000L).as("rootPlaceId"),
        concat(lit("game nr "), col("doc_id")).as("name"),
        col("text").as("description"),
        lit(null).cast("string").as("gameplayDescription"),
        (col("doc_id") % 100).as("playerCount"))
    }

    // the fixed takedown: 12 base-range keys spread across buckets
    val takedownIds = (0 until 12).map(i => i * 37L + 5L)

    println(f"${"tag"}%-7s ${"k"}%3s ${"buckets"}%8s ${"touched"}%8s " +
      f"${"deleted"}%8s ${"rewritten_b"}%12s ${"table_b"}%12s ${"del_s"}%6s")

    val tmp = java.nio.file.Files.createTempDirectory("graft-delscale").toString
    def run(tag: String, k: Int, buckets: Int): Long = {
      val path = s"$tmp/$tag-x$k/games"
      Merge.upsertIncrementalRounds(spark, path,
        gamesAt(k).repartition(col("universeId") % buckets),
        Seq.empty, "universeId",
        overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
        coalesceCols = Seq("description"),
        keepCols = Seq("gameplayDescription"), buckets = buckets)
      val t0 = System.nanoTime()
      val st = Merge.deleteWhere(spark, path,
        col("universeId").isin(takedownIds.map(java.lang.Long.valueOf): _*))
      val delS = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-7s $k%3d $buckets%8d ${st.touchedBuckets}%8d " +
        f"${st.deletedRows}%8d ${st.rewrittenBytes}%12d ${st.tableBytes}%12d " +
        f"$delS%6.1f")
      st.tableBytes
    }

    // bloomfind (round-14): the same fixed takedown with the FIND phase
    // served through the Bloom fragments ([[Merge.deleteKeys]]) on a
    // clustered table — the round-13 caveat was that `del_s` growth at
    // scale is the find-matches SCAN, not the rewrite; the probe prices
    // the find at the firing files instead of the table
    def runBloom(tag: String, k: Int, buckets: Int): Unit = {
      val path = s"$tmp/$tag-x$k/games"
      Merge.upsertIncrementalRounds(spark, path,
        gamesAt(k).repartition(col("universeId") % buckets),
        Seq.empty, "universeId",
        overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
        coalesceCols = Seq("description"),
        keepCols = Seq("gameplayDescription"), buckets = buckets)
      Merge.cluster(spark, path, "playerCount", filesPerBucket = 2,
        bloomCols = Seq("universeId"))
      val probe = Merge.pointProbe(spark, path, "universeId", takedownIds)
      val t0 = System.nanoTime()
      val st = Merge.deleteKeys(spark, path, "universeId", takedownIds)
      val delS = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-7s $k%3d $buckets%8d ${st.touchedBuckets}%8d " +
        f"${st.deletedRows}%8d ${st.rewrittenBytes}%12d ${st.tableBytes}%12d " +
        f"$delS%6.1f  find_files=${probe.relPaths.length} " +
        f"sidecar_rows=${probe.scannedSidecarRows}")
    }

    val baseN = docs.count()
    val baseBuckets = SizingPolicy.sizedStateBuckets(baseN)
    val baseBytes = run("sized", 1, baseBuckets)
    run("sized", factor, SizingPolicy.sizedStateBuckets(baseN * factor))
    run("pinned", factor, baseBuckets)
    // BYTES-sized dial (round-15, verdict r14 #4): buckets from the
    // table's estimated bytes at ×K (base measurement scaled — what a
    // production writer reads off its first committed generation) under
    // a fixture-scaled 1 MiB/bucket target standing in for the 1 GiB
    // production unit. The row dial over-buckets this narrow-row table
    // ~256× at ×100 (73 rows/bucket = pure parquet per-file overhead);
    // the bytes dial sizes to the data.
    run("bytesized", factor,
      SizingPolicy.sizedStateBucketsForBytes(baseBytes * factor, 1L << 20))
    runBloom("bloomfind", 1, baseBuckets)
    runBloom("bloomfind", factor, SizingPolicy.sizedStateBuckets(baseN * factor))
    spark.stop()
  }
}
