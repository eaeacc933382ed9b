package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Merge

/** `_manifests` LISTING growth under sustained write rounds (round-16,
  * verdict r15 #8): every round claims a write-once `genmark-` label, and
  * a committed generation's marker lives as long as the generation — so
  * the question is whether a long-lived table's metadata dir grows
  * without bound and whether per-commit cost (the retention sweep and
  * vacuum both list the dir) grows with it.
  *
  * What the code predicts, this tool verifies: markers are swept by the
  * SAME retention rule as fragments — a marker dies when its generation
  * leaves every retained manifest — so steady-state entries are
  * O(live generations) ≈ O(min(rounds, buckets)), a PLATEAU, not a line.
  * The unbounded case is crashed-attempt litter (never-referenced
  * markers), which is vacuumLitter's age-gated job; the tool inflates
  * the dir with 20k synthetic orphan markers to price a listing at that
  * size and to show the vacuum reclaiming them.
  *
  * Protocol: single-key upsert rounds against a 64-bucket table
  * (retainVersions 2), reporting every 10 rounds: entries by prefix,
  * `listStatus` wall (median of 5), and the round's full commit wall.
  * Then the orphan-marker inflation, a re-measure, and the vacuum.
  *
  * Prints LISTING rows; results land in SCALING.md ("genmark markers:
  * the listing plateaus").
  *
  * Usage: runMain graft.tools.ListingScale [rounds] (default 100).
  */
object ListingScale {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val tmp = java.nio.file.Files.createTempDirectory("listing-scale").toString
    val table = s"$tmp/games"
    def mk(ids: Seq[Long], tag: String) = ids.map(id =>
      (id, id * 10, s"$tag-$id", Option.when(id % 3 == 0)(s"d$id"),
        Option.when(id % 4 == 0)(s"g$id"), Some(id % 7)))
      .toDF("universeId", "rootPlaceId", "name", "description",
        "gameplayDescription", "playerCount")
    val over = Seq("rootPlaceId", "name", "playerCount")
    val coal = Seq("description")
    val keep = Seq("gameplayDescription")
    Merge.upsertIncrementalRounds(spark, table, mk(0L until 2000L, "base"),
      Seq.empty, "universeId", over, coal, keep, buckets = 64,
      retainVersions = 2)

    val mdir = new org.apache.hadoop.fs.Path(table, "_manifests")
    val hfs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def entriesByPrefix(): Map[String, Int] = {
      val names = hfs.listStatus(mdir).map(_.getPath.getName)
      names.groupBy(n => Seq("manifest-v", "genmark-", "statsg-", "bloomg",
        ".tmp-").find(n.startsWith).getOrElse("other"))
        .view.mapValues(_.length).toMap.withDefaultValue(0)
    }
    def listMs(): Double = {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        hfs.listStatus(mdir).length
        (System.nanoTime() - t0) / 1e6
      }.sorted
      times(2)
    }

    println(f"${"round"}%6s ${"entries"}%8s ${"genmarks"}%9s ${"manifests"}%9s " +
      f"${"list_ms"}%8s ${"commit_s"}%8s")
    var lastCommit = 0.0
    (1 to rounds).foreach { r =>
      val t0 = System.nanoTime()
      Merge.upsertRound(spark, table, mk(Seq((r % 2000).toLong), s"r$r"),
        "universeId", over, coal, keep, buckets = 64, retainVersions = 2)
      lastCommit = (System.nanoTime() - t0) / 1e9
      if (r % 10 == 0 || r == rounds) {
        val e = entriesByPrefix()
        println(f"LISTING $r%6d ${e.values.sum}%8d ${e("genmark-")}%9d " +
          f"${e("manifest-v")}%9d ${listMs()}%8.2f $lastCommit%8.2f")
      }
    }

    // crashed-writer-heavy store: 20k never-referenced markers (the only
    // unbounded-growth path — committed gens' markers were just shown to
    // plateau with the live-gen count)
    val t1 = System.nanoTime()
    (1 to 20000).foreach { i =>
      hfs.create(new org.apache.hadoop.fs.Path(mdir, s"genmark-${900000000 + i}"), true).close()
    }
    println(f"LISTING inflate +20000 orphan markers in ${(System.nanoTime() - t1) / 1e9}%.1f s")
    val e1 = entriesByPrefix()
    val t2 = System.nanoTime()
    Merge.upsertRound(spark, table, mk(Seq(1L), "post"), "universeId",
      over, coal, keep, buckets = 64, retainVersions = 2)
    val postCommit = (System.nanoTime() - t2) / 1e9
    println(f"LISTING inflated ${e1.values.sum}%8d ${e1("genmark-")}%9d " +
      f"${e1("manifest-v")}%9d ${listMs()}%8.2f $postCommit%8.2f")
    // the age-gated vacuum reclaims them (age 0 for the measurement)
    val t3 = System.nanoTime()
    val swept = Merge.vacuumOrphans(spark, table, olderThanMs = 0L)
    val e2 = entriesByPrefix()
    println(f"LISTING vacuum swept=$swept in ${(System.nanoTime() - t3) / 1e9}%.1f s; " +
      f"entries ${e2.values.sum}, genmarks ${e2("genmark-")}, list ${listMs()}%.2f ms")
    spark.stop()
  }
}
