package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{StreamingBpeMaintainer, StreamingIncrementalDedup, StreamingNswIndex}

/** The `collapseStagger` DEFAULT decision soak (round 18, verdict r17 #5
  * — the builder's own backlog item round 17 left open).
  *
  * Round 17's StateGrowthScale proved the stampede on a SYNTHETIC
  * uniform-touch loop (rounds 40/80/120 cost 59/111/174 s vs ~5 s
  * ordinary — every bucket's gen list crossing maxGens in the same
  * commit) and showed stagger spreads it (worst round 169 s → 10.8 s).
  * What it did NOT measure, and what the default decision needs:
  *
  *   1. do REAL maintainer touch patterns — the CDC tier's NSW store
  *      (vectors + two knn tables), incremental dedup (shingles + bands),
  *      BPE (docs + two small tables) — still walk in lockstep, or do
  *      their mixed shapes de-synchronize naturally?
  *   2. what does stagger COST in read amplification — its per-bucket
  *      threshold is maxGens + [0, stagger], so the documented worst-case
  *      bound rises; does the measured gen population and full-read wall
  *      actually rise with it?
  *
  * Protocol: the three maintainers driven through their REAL batch entry
  * points (insertBatch / admitBatch / insertBatch) for `rounds` rounds at
  * ×10-spec-fixture state (≈3k docs / 2k vectors bootstrap, 300-doc /
  * 100-vector batches, every bucket touched per round — the worst case
  * for lockstep), once per schedule: stagger 0 (the current default) and
  * stagger maxGens/2 = 4. Grep-able rows every 8 rounds (one collapse
  * cycle at maxGens 8):
  *
  * {{{
  * SOAK sched=<s0|half4> round=N bpe_s=… ded_s=… nsw_s=… worst_s=…
  *      files=… maxgens=… read_s=…
  * SOAKSUM sched=… total_s=… worst_round_s=… files_end=… maxgens_end=…
  *         read_end_s=…
  * }}}
  *
  * Decision rule (recorded with the numbers in SCALING.md): flip the
  * default to a nonzero stagger iff the stagger-0 schedule shows a
  * stampede round (worst ≥ 3× median) that the stagger schedule flattens
  * AND the stagger schedule's full-read wall stays within ~1.2× of
  * stagger-0's — otherwise record the measured reason the default
  * stays 0. */
object StaggerSoak {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val dim = 16
    def vecs(lo: Long, n: Int): DataFrame =
      spark.range(lo, lo + n).select(col("id").as("vec_id"),
        array((0 until dim).map(j =>
          (pmod(xxhash64(col("id"), lit(j)), lit(2000L)) / 1000.0) - 1.0): _*)
          .as("v"))
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "fox", "golf", "hotel", "india", "julia", "kilo", "lima")
    def docs(lo: Long, n: Int): DataFrame = (0 until n).map { i =>
      val id = lo + i
      val text = (0 until 24).map(j =>
        words(((id * 31 + j * 7) % words.length).toInt)).mkString(" ") +
        s" tail$id"
      (id, text)
    }.toDF("doc_id", "text")

    def walkFiles(dir: String): Long = {
      def rec(p: java.nio.file.Path): Long = {
        val s = java.nio.file.Files.list(p).iterator()
        var n = 0L
        while (s.hasNext) {
          val c = s.next()
          if (java.nio.file.Files.isDirectory(c)) n += rec(c)
          else if (c.getFileName.toString.endsWith(".parquet")) n += 1
        }
        n
      }
      rec(java.nio.file.Paths.get(dir))
    }
    /** Longest live gen list over every (table, bucket) of one store —
      * the read-amplification observable, manifest-served. */
    def maxGens(storeDir: String): Int = {
      val mdir = new org.apache.hadoop.fs.Path(s"$storeDir/_manifests")
      val hfs = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val latest = hfs.listStatus(mdir).map(_.getPath.getName)
        .filter(_.startsWith("manifest-v"))
        .map(_.stripPrefix("manifest-v").toLong).max
      val in = hfs.open(new org.apache.hadoop.fs.Path(mdir, s"manifest-v$latest"))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map(_.split(',')).filter(p => p.length >= 3 && p(1).toInt >= 0)
        .toSeq.groupBy(p => (p(0), p(1))).values
        .foldLeft(0)((m, gs) => math.max(m, gs.size))
      finally in.close()
    }

    Seq(("s0", 0), ("half4", 4)).foreach { case (sched, stagger) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"soak-$sched").toString
      val dirs = Seq(s"$tmp/bpe", s"$tmp/ded", s"$tmp/nsw")
      val t0All = System.nanoTime()
      val bpe = new StreamingBpeMaintainer(spark, dirs(0), docs(0L, 3000),
        acuteFertilityFactor = 100.0, retrainAtFertilityFactor = 100.0,
        buckets = 32, collapseStagger = stagger)
      val ded = new StreamingIncrementalDedup(spark, dirs(1), docs(0L, 3000),
        buckets = 32, collapseStagger = stagger)
      val nsw = new StreamingNswIndex(spark, dirs(2), vecs(0L, 2000),
        buckets = 32, collapseStagger = stagger)
      var worst = 0.0
      var worstEver = 0.0
      (1 to rounds).foreach { r =>
        val lo = r.toLong * 100000L
        def timed(f: => Unit): Double = {
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        // BPE commits at 2·id+1, the factor-1 maintainers at id+1 — feed
        // each the id that lands its commit at round r's version
        val bpeS = timed(bpe.insertBatch(docs(lo, 300), 2L * r - 2L))
        val dedS = timed(ded.admitBatch(docs(lo, 300).toDF(), r.toLong - 1L))
        val nswS = timed(nsw.insertBatch(vecs(lo, 100).toDF(), r.toLong - 1L))
        val roundS = bpeS + dedS + nswS
        worst = math.max(worst, roundS)
        worstEver = math.max(worstEver, roundS)
        if (r % 8 == 0 || r == rounds) {
          val t1 = System.nanoTime()
          val n = bpe.currentDocs().count() + ded.currentShingles().count() +
            nsw.currentVectors().count() + nsw.currentKnn().count()
          val readS = (System.nanoTime() - t1) / 1e9
          val files = dirs.map(walkFiles).sum
          val gens = dirs.map(maxGens).max
          println(f"SOAK sched=$sched%-6s round=$r%3d bpe_s=$bpeS%6.2f " +
            f"ded_s=$dedS%6.2f nsw_s=$nswS%6.2f worst_s=$worst%7.2f " +
            f"files=$files%6d maxgens=$gens%3d read_s=$readS%6.2f rows=$n")
          worst = 0.0
        }
      }
      val totalS = (System.nanoTime() - t0All) / 1e9
      val t1 = System.nanoTime()
      bpe.currentDocs().count(); ded.currentShingles().count()
      nsw.currentVectors().count(); nsw.currentKnn().count()
      val readEnd = (System.nanoTime() - t1) / 1e9
      println(f"SOAKSUM sched=$sched total_s=$totalS%.1f " +
        f"worst_round_s=$worstEver%.2f files_end=${dirs.map(walkFiles).sum} " +
        f"maxgens_end=${dirs.map(maxGens).max} read_end_s=$readEnd%.2f")
      CacheRegistry.release(blocking = true)
      CacheRegistry.releaseShared(blocking = true)
    }
    spark.stop()
  }
}
