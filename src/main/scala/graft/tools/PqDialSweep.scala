package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.functions.VectorFunctions
import graft.operators.Pq

/** The (M, K) product-quantization dial sweep — round-11 follow-up to the
  * sized-codes measurement: a K-only dial (K ∝ N) was implemented per
  * the round-10 verdict and the ×10 recall probe showed it does NOT move
  * recall (K^(−2/d) error decay is nearly flat in d=16 subspaces). This
  * sweeps both dials on the base fixture and a scaled replica so the dial
  * with actual leverage is measured, not argued — the measurement that
  * shaped `Pq.sizedDials` (doublings split between M and K).
  *
  * `runMain graft.tools.PqDialSweep [xDir]` (default target/sfscale_x10;
  * base from SPARK_GRAFT_SF_DIR, default sf0.1). Each (M, K) trains fresh
  * and scores 3 disjoint 5-query blocks (45 truth slots, ±0.022).
  */
object PqDialSweep {
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

    // SPARK_GRAFT_PQ_DIALS="4x16,8x64,16x64" overrides; SPARK_GRAFT_PQ_CORPORA
    // ("base", "x", or "base,x") picks the corpora (the ×100 follow-up only
    // needs the scaled one)
    val dials = sys.env.get("SPARK_GRAFT_PQ_DIALS")
      .map(_.split(",").toSeq.map { s =>
        val Array(m, k) = s.split("x"); (m.toInt, k.toInt)
      })
      .getOrElse(Seq((4, 16), (4, 256), (8, 16), (8, 64), (16, 16)))
    val corpora = sys.env.get("SPARK_GRAFT_PQ_CORPORA")
      .map(_.split(",").toSet).getOrElse(Set("base", "x"))
    Seq("base" -> base, "x" -> xDir)
      .filter { case (label, _) => corpora.contains(label) }
      .foreach { case (label, dir) =>
      val e = CacheRegistry.persistTracked(
        spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v")))
      val t0 = System.nanoTime()
      Pq.dialSweep(e, dials).foreach { case ((m, k), r) =>
        println(f"PQSWEEP $label%-5s M=$m%-3d K=$k%-4d bits=${m * (32 - Integer.numberOfLeadingZeros(k - 1))}%-3d recall=$r%6.4f")
      }
      println(f"PQSWEEP $label%-5s (wall ${(System.nanoTime() - t0) / 1e9}%.1f s)")
      CacheRegistry.release(blocking = true)
      CacheRegistry.releaseShared(blocking = true)
    }
    spark.stop()
  }
}
