package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Measures the NN-descent convergence knee: k-NN-graph hit rate vs the
  * brute-force truth after each round count, plus the wall-clock of the
  * full `ann_nsw_nnd_search` query at that round count —
  * `runMain graft.tools.NndKnee [sfDir]`. Picks where extra rounds stop
  * buying hit rate (the round-7 basis for the NndIters choice; results
  * recorded in SCALING.md). */
object NndKnee {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.io.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val deg = graft.operators.Nsw.Degree
    val truth = vecs.map { case (id, v) =>
      id -> vecs.collect { case (o, w) if o != id => (o, cos(v, w)) }
        .toSeq.sortBy { case (o, c) => (-c, o) }.take(deg).map(_._1).toSet
    }
    for (iters <- 0 to 5) {
      val t0 = System.nanoTime()
      val edges = graft.operators.Nsw.nnDescentKnn(e, iters)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val buildSec = (System.nanoTime() - t0) / 1e9
      val hits = edges.count { case (s, d) => truth(s).contains(d) }
      val rate = hits.toDouble / (truth.size * deg)
      CacheRegistry.release(blocking = true)
      println(f"NNDKNEE iters=$iters hit_rate=$rate%.4f build=$buildSec%.2f s")
    }
    spark.stop()
  }
}
