package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Merge

/** OPTIMIZE planning cost vs bucket count, manifest-served vs legacy
  * (round 16 — the per-bucket stats lines' evidence): before this round,
  * `compact()` named its oversized buckets by listing EVERY bucket's gen
  * dir — O(buckets) serial driver FS calls before any data moved, three
  * times per run (plan, before-count, after-count) — and every
  * upsert/delete commit paid the same walk for its `tableBytes` report.
  * With per-bucket (files, bytes) riding the manifest's bucket lines,
  * planning is a driver-memory read over state the manifest read already
  * paid for.
  *
  * Protocol: for each bucket count, build a committed table whose buckets
  * all hold ≤ target files, then time `compact(targetFiles = high)` —
  * planning-only, the rewrite never runs — on (a) the stats-bearing
  * manifest and (b) the same manifest with the stats fields stripped (a
  * pre-round-16 writer's table). `CompactStats.statListings` confirms
  * what each mode did. Local-FS listings are ~10-100 µs, so the absolute
  * walls here understate production pain by 2-3 orders of magnitude: an
  * object-store LIST is 10-50 ms, so the legacy shape at a 10⁵-bucket
  * table is 10⁵ × 3 × 10 ms ≈ 1-2.5 HOURS of serial metadata RPCs per
  * OPTIMIZE — the manifest-served plan is one GET regardless.
  *
  * Prints OPTSCALE rows; results land in SCALING.md ("OPTIMIZE planning
  * is a manifest read").
  *
  * Usage: runMain graft.tools.OptimizeScale [maxBuckets] (default 4096).
  */
object OptimizeScale {
  def main(args: Array[String]): Unit = {
    val maxBuckets = args.headOption.map(_.toInt).getOrElse(4096)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def mk(ids: Seq[Long], tag: String) = ids.map(id =>
      (id, id * 10, s"$tag-$id", Option.when(id % 3 == 0)(s"d$id"),
        Option.when(id % 4 == 0)(s"g$id"), Some(id % 7)))
      .toDF("universeId", "rootPlaceId", "name", "description",
        "gameplayDescription", "playerCount")
    val over = Seq("rootPlaceId", "name", "playerCount")
    val coal = Seq("description")
    val keep = Seq("gameplayDescription")

    println(f"${"buckets"}%8s ${"mode"}%10s ${"plan_s"}%8s ${"listings"}%9s ${"files"}%7s")
    Iterator.iterate(256)(_ * 4).takeWhile(_ <= maxBuckets).foreach { buckets =>
      val tmp = java.nio.file.Files.createTempDirectory(s"opt-scale-$buckets").toString
      val table = s"$tmp/games"
      Merge.upsertIncrementalRounds(spark, table,
        mk(0L until buckets * 4L, "base"),
        Seq(mk(0L until buckets.toLong, "r1")), "universeId", over, coal, keep,
        buckets = buckets, retainVersions = 2)

      def planOnly(mode: String): Unit = {
        val t0 = System.nanoTime()
        // targetFiles high: every bucket passes, compact returns after
        // planning — the measured wall is pure oversized-detection
        val st = Merge.compact(spark, table, targetFiles = 1000)
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"OPTSCALE $buckets%8d $mode%10s $wall%8.3f " +
          f"${st.statListings}%9d ${st.filesBefore}%7d")
      }
      planOnly("manifest")

      // pre-round-16 writer: strip the stats fields off the bucket lines
      val mdir = new org.apache.hadoop.fs.Path(table, "_manifests")
      val hfs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val latest = hfs.listStatus(mdir).map(_.getPath.getName)
        .filter(_.startsWith("manifest-v")).map(_.stripPrefix("manifest-v").toInt).max
      val mf = java.nio.file.Paths.get(s"$table/_manifests/manifest-v$latest")
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.write(mf,
        java.nio.file.Files.readAllLines(mf).asScala.map { l =>
          if (l.startsWith("#")) l else l.split(',').take(2).mkString(",")
        }.asJava)
      planOnly("legacy")
    }
    spark.stop()
  }
}
