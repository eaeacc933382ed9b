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
    // search truth: top-3 per query 0..4 (what the recall row measures)
    val qTruth = (0L until 5L).flatMap { q =>
      vecs.collect { case (o, w) if o != q => (o, cos(vecs(q), w)) }
        .toSeq.sortBy { case (o, c) => (-c, o) }.take(3).map(n => (q, n._1))
    }.toSet
    val grid = (0 to 5).map(i => (i, 12)) ++ Seq((2, 16), (3, 16), (4, 16))
    for ((iters, bdeg) <- grid) {
      val t0 = System.nanoTime()
      val knn = graft.operators.Nsw.nnDescentKnn(e, iters, bdeg)
      val edges = knn.collect().map(r => (r.getLong(0), r.getLong(1)))
      val buildSec = (System.nanoTime() - t0) / 1e9
      val hits = edges.count { case (s, d) => truth(s).contains(d) }
      val rate = hits.toDouble / (truth.size * deg)
      val finished = graft.operators.Nsw.symmetrizeWithLongLinks(e, knn, 1)
      val found = graft.operators.Nsw.searchWithEdges(e, finished)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val recall = found.count(qTruth.contains).toDouble / qTruth.size
      CacheRegistry.release(blocking = true)
      println(f"NNDKNEE iters=$iters bdeg=$bdeg hit_rate=$rate%.4f recall@3=$recall%.3f build=$buildSec%.2f s")
    }
    spark.stop()
  }
}
