package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Merge, SizingPolicy}

/** The skipping-fragment maintenance probe (round-14): per-generation
  * stats/Bloom fragments are maintained by EVERY writer (merge rounds,
  * deletes, compactions) so point/range reads stay pruned between
  * clustered rewrites — but only if that maintenance is CHANGE-priced.
  * The claim, by construction: a merge round's fragment pass reads and
  * summarizes only the round's new generation. This probe measures it
  * (the DeleteScale methodology, fragment-bytes axis):
  *
  *   - games-shaped corpus at base → ×K, lake buckets from the shipped
  *     sizing dial, clustered with a universeId Bloom + playerCount
  *     stats policy;
  *   - a FIXED 12-key merge round (a refresh batch does not grow with
  *     the corpus): the round's new fragment bytes must stay FLAT across
  *     scales while the table's total fragment bytes grow ×K;
  *   - the read-side payoff at each scale: files opened by a point read
  *     AFTER the post-cluster round (the round-13 design fell back to
  *     the full manifest here) vs the table's file count.
  *
  * Prints FRAGSCALE rows; results land in SCALING.md.
  *
  * Usage: runMain graft.tools.FragmentScale [K] (default 10; base corpus
  * from SPARK_GRAFT_SF_DIR, default sf0.1).
  */
object FragmentScale {
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

    val refreshIds = (0 until 12).map(i => i * 37L + 5L)
    val pointIds = Seq(5L, 42L + 5L, 999999999L) // two present, one absent

    println(f"${"k"}%3s ${"buckets"}%8s ${"frag_new_b"}%11s ${"frag_total_b"}%13s " +
      f"${"files_kept"}%10s ${"files_total"}%11s ${"round_s"}%8s")

    Seq(1, factor).foreach { k =>
      val corpus = gamesAt(k)
      val n = corpus.count()
      val buckets = SizingPolicy.sizedStateBuckets(n)
      val table = s"target/fragscale_x$k/games"
      val tp = new Path(table)
      val fs = tp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      Merge.upsertIncrementalRounds(spark, table,
        corpus.repartition(col("universeId") % buckets cast "int"),
        Seq.empty, "universeId",
        overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
        coalesceCols = Seq("description"), keepCols = Seq("gameplayDescription"),
        buckets = buckets, retainVersions = 2)
      Merge.cluster(spark, table, "playerCount", filesPerBucket = 2,
        retainVersions = 2, bloomCols = Seq("universeId"))
      def fragEntries(): Map[String, Long] = {
        val md = new Path(tp, "_manifests")
        fs.listStatus(md).filter(s => Seq("statsg-", "bloomg-", "bloomgmeta-")
          .exists(s.getPath.getName.startsWith))
          .map(s => s.getPath.getName -> dirBytes(fs, s.getPath)).toMap
      }
      val before = fragEntries()
      val fresh = corpus.filter(col("universeId")
        .isin(refreshIds.map(java.lang.Long.valueOf): _*))
        .withColumn("name", concat(lit("re "), col("name")))
      val t0 = System.nanoTime()
      Merge.upsertRound(spark, table, fresh, "universeId",
        overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
        coalesceCols = Seq("description"), keepCols = Seq("gameplayDescription"),
        buckets = buckets, retainVersions = 2)
      val roundSec = (System.nanoTime() - t0) / 1e9
      val after = fragEntries()
      val newBytes = after.filterNot { case (name, _) => before.contains(name) }
        .values.sum
      val pruned = Merge.readTableWhereIn(spark, table, "universeId", pointIds)
      val kept = pruned.inputFiles.length
      val total = Merge.readTable(spark, table).inputFiles.length
      println(f"FRAGSCALE $k%3d $buckets%8d $newBytes%11d ${after.values.sum}%13d " +
        f"$kept%10d $total%11d $roundSec%8.1f")
    }
    spark.stop()
  }

  private def dirBytes(fs: org.apache.hadoop.fs.FileSystem, p: Path): Long =
    if (!fs.exists(p)) 0L
    else if (fs.getFileStatus(p).isFile) fs.getFileStatus(p).getLen
    else fs.listStatus(p).map(st =>
      if (st.isDirectory) dirBytes(fs, st.getPath) else st.getLen).sum
}
