package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Merge

/** The Z-order win at a bench-visible file-count regime (round-15,
  * verdict r14 #7): the `j1_merge_skipping_z` gate proves correctness
  * and strictly-fewer-files vs the 1-D control, but at the fixture's 32
  * files the margin is small. This probe sweeps the `filesPerBucket`
  * dial — the file-count regime — on a decorrelated two-axis corpus and
  * reports files opened by the same two-predicate rectangle read under
  * BOTH layouts.
  *
  * Geometry: universeId 0..N-1 and playerCount = (id·37) mod N are
  * decorrelated high-cardinality axes; the read selects the
  * [0, N/4) × [0, N/4) rectangle ≈ 1/16 of rows. 1-D clustering on
  * playerCount prunes its own axis only (floor ≈ 1/4 of files at any
  * dial); the z-curve's cells shrink as files multiply, so its opened
  * set tracks the rectangle's 1/16 volume plus boundary cells — the gap
  * WIDENS with file count, which is exactly the 100 TB regime (a lake
  * table is 10⁴-10⁶ files; a two-predicate read that opens 1/4 of them
  * pays 4× the I/O of one that opens 1/16).
  *
  * Usage: runMain graft.tools.ZOrderScale [dir] (default
  * SPARK_GRAFT_SF_DIR / sf0.1). Prints ZORDER rows; results land in
  * SCALING.md ("Z-order vs 1-D clustering across the file-count dial").
  */
object ZOrderScale {
  def main(args: Array[String]): Unit = {
    val base = args.headOption
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

    val docs = spark.read.parquet(s"$base/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n = docs.count()
    def games: DataFrame = docs.select(
      col("doc_id").as("universeId"),
      (col("doc_id") + 1000000L).as("rootPlaceId"),
      concat(lit("game nr "), col("doc_id")).as("name"),
      col("text").as("description"),
      lit(null).cast("string").as("gameplayDescription"),
      (col("doc_id") * 37 % n).as("playerCount"))

    val hi = n / 4 - 1
    val preds = Seq(("playerCount", 0L, hi), ("universeId", 0L, hi))
    val buckets = 8

    println(f"${"fpb"}%4s ${"layout"}%7s ${"files"}%6s ${"total"}%6s " +
      f"${"frac"}%6s ${"rows"}%6s ${"read_s"}%7s")
    val tmp = java.nio.file.Files.createTempDirectory("graft-zscale").toString
    for (fpb <- Seq(2, 8, 32, 64)) {
      val path = s"$tmp/fpb$fpb/games"
      Merge.upsertIncrementalRounds(spark, path,
        games.repartition(col("universeId") % buckets), Seq.empty,
        "universeId",
        overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
        coalesceCols = Seq("description"),
        keepCols = Seq("gameplayDescription"), buckets = buckets)
      for (layout <- Seq("1d", "z")) {
        if (layout == "1d")
          Merge.cluster(spark, path, "playerCount", filesPerBucket = fpb,
            retainVersions = 1)
        else
          Merge.clusterZ(spark, path, Seq("playerCount", "universeId"),
            filesPerBucket = fpb, retainVersions = 1)
        val total = Merge.readTable(spark, path).inputFiles.length
        val t0 = System.nanoTime()
        val read = Merge.readTableWhereAll(spark, path, preds)
        val rows = read.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val opened = read.inputFiles.length
        println(f"ZORDER $fpb%4d $layout%7s $opened%6d $total%6d " +
          f"${opened.toDouble / total}%6.3f $rows%6d $sec%7.2f")
      }
    }

    // STRING Z-dimension sweep (round 17): the same file-count dial with a
    // takedown-shaped predicate on a shared-prefix domain column — the
    // regime where min/max arithmetic is useless and only the rank
    // normalization can lay the table out FOR the predicate. Control is
    // the numeric 1-D layout (the pre-round-17 best): the string
    // predicate filters but cannot prune a single file there.
    def gamesStr: DataFrame = docs.select(
      col("doc_id").as("universeId"),
      (col("doc_id") + 1000000L).as("rootPlaceId"),
      concat(lit("https://d"), lpad((col("doc_id") * 37 % n).cast("string"),
        7, "0"), lit(".example.com")).as("name"),
      col("text").as("description"),
      lit(null).cast("string").as("gameplayDescription"),
      (col("doc_id") * 53 % n).as("playerCount"))
    val sLo = "https://d" + "%07d".format(0) + ".example.com"
    val sHi = "https://d" + "%07d".format(n / 16 - 1) + ".example.com"
    for (fpb <- Seq(8, 32, 64)) {
      val path = s"$tmp/strz-fpb$fpb/games"
      Merge.upsertIncrementalRounds(spark, path,
        gamesStr.repartition(col("universeId") % buckets), Seq.empty,
        "universeId",
        overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
        coalesceCols = Seq("description"),
        keepCols = Seq("gameplayDescription"), buckets = buckets)
      for (layout <- Seq("1d-num", "z-str")) {
        if (layout == "1d-num")
          Merge.cluster(spark, path, "playerCount", filesPerBucket = fpb,
            retainVersions = 1)
        else
          Merge.clusterZ(spark, path, Seq("name", "playerCount"),
            filesPerBucket = fpb, retainVersions = 1)
        val total = Merge.readTable(spark, path).inputFiles.length
        val t0 = System.nanoTime()
        val read = Merge.readTableWhereStrings(spark, path,
          Seq(("name", sLo, sHi)))
        val rows = read.count()
        val sec = (System.nanoTime() - t0) / 1e9
        val opened = read.inputFiles.length
        println(f"STRZ $fpb%4d $layout%7s $opened%6d $total%6d " +
          f"${opened.toDouble / total}%6.3f $rows%6d $sec%7.2f")
      }
    }
    spark.stop()
  }
}
