package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Merge

/** Prices the auto-compact dial (round 16): sustained WIDE-SHUFFLE merge
  * rounds leave every touched bucket holding one file per shuffle
  * partition — the steady state without a policy is `buckets × width`
  * small files, and every read pays the per-file open cost. With
  * `autoCompactAtFiles`, dial-crossing buckets are rewritten to one file
  * in a layout-only version right after the merge commit, the decision
  * served from the stats map the commit just produced (zero FS calls
  * when under the dial).
  *
  * Protocol: a 64-bucket table takes `rounds` upsert rounds whose fresh
  * batches are exploded wide (shuffle width = the session's partition
  * count) and touch every bucket; two schedules — `none` (no dial) and
  * `dial` (autoCompactAtFiles = 4). Every 5 rounds: total data files
  * (from the manifest's per-bucket stats — a driver-memory read), the
  * round's full wall (merge + any auto-compact), and a full-scan read
  * wall (count(*), median of 3).
  *
  * Prints AUTOCPT rows; results land in SCALING.md ("Auto-compact keeps
  * the read side flat").
  *
  * Usage: runMain graft.tools.AutoCompactScale [rounds] (default 20).
  */
object AutoCompactScale {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(20)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "16")
      // keep the merge write's full 16-way shuffle width (round 17): the
      // study models PRODUCTION-sized rounds, where every shuffle
      // partition is genuinely loaded and AQE would not coalesce — on the
      // fixture's tiny batches AQE folds the output to one partition and
      // no wide-bucket regime exists to measure
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
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

    println(f"${"mode"}%6s ${"round"}%6s ${"files"}%7s ${"round_s"}%8s ${"read_s"}%7s")
    Seq("none" -> None, "dial" -> Some(4)).foreach { case (mode, dial) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"autocpt-$mode").toString
      val table = s"$tmp/games"
      Merge.upsertIncrementalRounds(spark, table, mk(0L until 4096L, "base"),
        Seq.empty, "universeId", over, coal, keep, buckets = 64,
        retainVersions = 2)
      (1 to rounds).foreach { r =>
        val t0 = System.nanoTime()
        // every bucket touched: stride 17 is CO-PRIME to the 64-bucket
        // modulus, so the 241 ids cover all 64 residues (~3.8 per bucket).
        // ADVICE r16 #2: the old stride 16 hit only residues {0,16,32,48} —
        // 4 of 64 buckets per round — so "none"'s file count was mostly the
        // initial write's width, not sustained wide-shuffle accumulation.
        Merge.upsertRound(spark, table,
          mk(0L until 4096L by 17L, s"r$r").repartition(16), "universeId",
          over, coal, keep, buckets = 64, retainVersions = 2,
          autoCompactAtFiles = dial)
        val roundS = (System.nanoTime() - t0) / 1e9
        if (r % 5 == 0 || r == rounds) {
          // total files from the manifest's stats lines — the point of
          // the round-16 format: accounting costs zero FS listings
          val mdir = new org.apache.hadoop.fs.Path(table, "_manifests")
          val hfs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val latest = hfs.listStatus(mdir).map(_.getPath.getName)
            .filter(_.startsWith("manifest-v"))
            .map(_.stripPrefix("manifest-v").toInt).max
          val in = hfs.open(new org.apache.hadoop.fs.Path(mdir, s"manifest-v$latest"))
          val files = try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().filter(l => l.nonEmpty && !l.startsWith("#"))
            .map(_.split(',')).collect { case p if p.length >= 4 => p(2).toLong }
            .sum
          finally in.close()
          val reads = (1 to 3).map { _ =>
            val t1 = System.nanoTime()
            Merge.readTable(spark, table).count()
            (System.nanoTime() - t1) / 1e9
          }.sorted
          println(f"AUTOCPT $mode%6s $r%6d $files%7d $roundS%8.2f ${reads(1)}%7.2f")
        }
      }
    }
    spark.stop()
  }
}
