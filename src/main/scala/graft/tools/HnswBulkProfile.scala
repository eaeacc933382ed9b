package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase decomposition of `ann_hnsw_bulk` at base vs ×K — the round-10
  * verdict #5 instrument: the query's ×10 ratio read 12.3 against the flat
  * bulk searches' 7.8–8.7, and the suspect (layer-1 frontier discipline)
  * was named but not measured. `runMain graft.tools.HnswBulkProfile
  * [xDir]` (default target/sfscale_x10; base from SPARK_GRAFT_SF_DIR,
  * default sf0.1) prints per-phase seconds + row counts for both corpora
  * and the per-phase ratio table SCALING.md cites. Stored artifacts are
  * primed first (read, not built) so the phases time SEARCH, exactly as
  * the bench's build/serve split does. */
object HnswBulkProfile {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val xDir = args.headOption.getOrElse("target/sfscale_x10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(label: String, dir: String): Map[String, (Double, Long)] = {
      // warm pass primes store artifacts + codegen so the measured pass is
      // pure search (a first touch would absorb the graph builds)
      graft.operators.Nsw.hnswBulkPhases(spark, dir)
      CacheRegistry.release(blocking = true)
      val phases = graft.operators.Nsw.hnswBulkPhases(spark, dir)
      phases.foreach { case (p, s, n) =>
        println(f"HNSWBULK $label%-6s $p%-14s ${s}%8.2f s  $n%10d rows")
      }
      CacheRegistry.release(blocking = true)
      CacheRegistry.releaseShared(blocking = true)
      phases.map { case (p, s, n) => p -> (s, n) }.toMap
    }
    val b = run("base", base)
    val x = run("x", xDir)
    b.keys.toSeq.sorted.foreach { p =>
      val (bs, bn) = b(p); val (xs, xn) = x(p)
      println(f"HNSWBULKRATIO $p%-14s base=${bs}%7.2f s x=${xs}%7.2f s " +
        f"ratio=${xs / math.max(bs, 1e-9)}%6.1f rows_ratio=${xn.toDouble / math.max(bn, 1)}%6.1f")
    }
    spark.stop()
  }
}
