package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.BucketedAppendState

/** Prices maintainer-store FILE GROWTH under a sustained high-frequency
  * commit loop (round 17, verdict r16 #5 — the AutoCompactScale question
  * asked of [[BucketedAppendState]] instead of the lake): does a
  * maintainer that commits every few seconds for days accrete files the
  * way the lake did before its auto-compact dial, or does the store's
  * own geometry bound it?
  *
  * The store has two candidate growth channels:
  *
  *   - KEYED tables: one new gen dir per touched bucket per commit —
  *     unbounded if nothing collapses. Two mechanisms exist:
  *     `maxGensPerBucket` (a bucket whose gen list would exceed the
  *     bound is collapsed copy-on-write at THAT commit — amortized local
  *     compaction) and keep-last-K retention (gens referenced only by
  *     expired versions are deleted at every commit).
  *   - SMALL tables: one whole dir per version (the IVF maintainer
  *     rewrites centroids + distinfo every commit) — retention alone
  *     bounds these.
  *
  * Protocol: one store, one keyed table (`rows`, doc_id-bucketed) plus
  * one small table (`info`, the IVF commit shape), bootstrap then
  * `rounds` commitAppend rounds each landing a batch across every
  * bucket. Every 10 rounds: total data files on disk (recursive walk —
  * this tool pays the listing so production code never has to), max
  * gens/bucket from the manifest, full-read wall, round wall.
  *
  * Expected shape (recorded in SCALING.md): files PLATEAU at
  * O(buckets × maxGensPerBucket + keepVersions·smallTables) — the
  * collapse bound is the store's built-in auto-compact dial, priced
  * per-bucket and amortized (each row rewritten once per
  * maxGensPerBucket commits). If the plateau did NOT hold, the lake's
  * dial would need porting; the measurement decides.
  *
  * Usage: runMain graft.tools.StateGrowthScale [rounds] (default 150).
  */
object StateGrowthScale {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(150)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val buckets = 32

    def batch(round: Int, n: Int) = (0 until n).map { i =>
      val id = round.toLong * 100000L + i
      (id, s"payload-$round-$i-" + ("x" * 64))
    }.toDF("doc_id", "text")
    def info(round: Int) = Seq((round.toLong, round * 1.5)).toDF("n", "s")

    def walkFiles(tmp: String): Long = {
      def rec(p: java.nio.file.Path): Long = {
        val s = java.nio.file.Files.list(p).iterator()
        var n = 0L
        while (s.hasNext) {
          val c = s.next()
          if (java.nio.file.Files.isDirectory(c)) n += rec(c)
          else {
            val name = c.getFileName.toString
            if (!name.startsWith("_") && !name.startsWith(".") &&
              name.endsWith(".parquet")) n += 1
          }
        }
        n
      }
      rec(java.nio.file.Paths.get(tmp, "store"))
    }
    def maxGens(tmp: String): Int = {
      // manifest-served: longest gen list across buckets of `rows`
      val mdir = new org.apache.hadoop.fs.Path(s"$tmp/store/_manifests")
      val hfs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val latest = hfs.listStatus(mdir).map(_.getPath.getName)
        .filter(_.startsWith("manifest-v"))
        .map(_.stripPrefix("manifest-v").toLong).max
      val in = hfs.open(new org.apache.hadoop.fs.Path(mdir, s"manifest-v$latest"))
      // one `t,b,g` line per live gen: max lines per (rows, bucket)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.startsWith("rows,")).toSeq
        .groupBy(_.split(',')(1).toInt).values
        .foldLeft(0)((m, gs) => math.max(m, gs.size))
      finally in.close()
    }

    println(f"${"tag"}%-9s ${"round"}%6s ${"files"}%7s ${"maxgens"}%8s " +
      f"${"round_s"}%8s ${"worst_s"}%8s ${"read_s"}%7s")
    // legacy = the pre-round-17 layout (unaligned deltas, lockstep
    // collapse); aligned flips the delta-write alignment; staggered adds
    // the per-bucket collapse-threshold jitter on top
    Seq(("legacy", false, 0), ("aligned", true, 0), ("staggered", true, 8))
      .foreach { case (tag, align, stagger) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"stategrowth-$tag").toString
        val state = new BucketedAppendState(spark, s"$tmp/store", buckets,
          keyed = Map("rows" -> "doc_id"), keepVersions = 3,
          alignDeltaWrites = align, collapseStagger = stagger)
        state.commitFull(0L, Map("rows" -> batch(0, 2048), "info" -> info(0)))
        var worst = 0.0
        (1 to rounds).foreach { r =>
          val t0 = System.nanoTime()
          // every bucket touched each round (ids dense in [0, 2048))
          state.commitAppend(r.toLong,
            Map("rows" -> batch(r, 2048), "info" -> info(r)))
          val roundS = (System.nanoTime() - t0) / 1e9
          worst = math.max(worst, roundS)
          if (r % 10 == 0 || r == rounds) {
            val t1 = System.nanoTime()
            val cnt = state.read("rows").count()
            val readS = (System.nanoTime() - t1) / 1e9
            println(f"STATEGROWTH $tag%-9s $r%6d ${walkFiles(tmp)}%7d " +
              f"${maxGens(tmp)}%8d $roundS%8.2f $worst%8.2f $readS%7.2f rows=$cnt")
            worst = 0.0
          }
        }
      }
    spark.stop()
  }
}
