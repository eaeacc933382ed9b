package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{avg, col}

import graft.operators.{AnnRecall, IvfKMeans}

/** The sized-cell-count measurement (round-11 verdict #3): the routed graph
  * serve's recall 1.00 at ×10/×100 was measured against a quantizer whose
  * cell count stayed PINNED at the fixture dial — so probeCells=8 probed
  * most of the quantizer and the seed-scoring term (~probeCells·N/K_cells)
  * grew linearly with the corpus. `IvfKMeans.sizedCells` now grows
  * K ∝ √N (32 cells at ×10, 128 at ×100); this tool rebuilds the stored
  * artifacts at the sized count and measures what production would see:
  *
  *   - served recall per (method, dial) — the routed graph at
  *     probeCells = d vs ivf_nprobe at nprobe = d, same stored artifacts,
  *     same truth, [[AnnRecall.servedCellCrossover]];
  *   - wall-clock per (method, dial) over the served query blocks
  *     ([[AnnRecall.servedCrossoverWalls]], noop sink, warmed);
  *   - the scan fraction d/K_cells each dial implies.
  *
  * The crossover question it answers: the graph pays seed-scoring PLUS a
  * bounded beam to look outside its probed cells — it earns that extra
  * cost exactly when it reaches a recall target at a LOWER dial than
  * nprobe needs (a smaller scan fraction). Rows land in SCALING.md.
  *
  * Usage: runMain graft.tools.CellCountScale [factor] (default 10; base
  * from SPARK_GRAFT_SF_DIR, default sf0.1; replica under
  * target/sfscale_x{factor}, reused if present).
  */
object CellCountScale {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // positional out-dir must not swallow the "clustered" flag
    val out = args.lift(1).filterNot(_ == "clustered")
      .getOrElse(s"target/sfscale_x$factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val marker = new Path(s"$out/embeddings.parquet/_SUCCESS")
    if (!marker.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(marker))
      SfScale.writeScaledEmbeddings(spark, base, out, factor, cpus.toInt)

    // --clustered (2nd arg "clustered" or env SPARK_GRAFT_CELLS_CLUSTERED):
    // run the SAME crossover on the clustered derivation of the scaled
    // corpus — the geometry where graph locality has something to exploit
    // (the decorrelated run measured graph ≡ nprobe; this is the
    // counterfactual)
    val clustered = args.contains("clustered") ||
      sys.env.get("SPARK_GRAFT_CELLS_CLUSTERED").contains("1")
    val tag = if (clustered) s"x$factor/clustered" else s"x$factor"

    val n = AnnRecall.probeCorpus(spark, out).count()
    val kCells = IvfKMeans.sizedCells(n)
    val dials = Seq(1, 2, 4, 8, 16, 32).filter(_ <= kCells)
    println(f"CELLS $tag n=$n k_cells=$kCells dials=${dials.mkString(",")}")

    val t0 = System.nanoTime()
    val (recallDf, walls) =
      if (clustered) {
        val e = graft.tools.CacheRegistry.persistTracked(
          AnnRecall.clusteredCorpusUncapped(spark, out))
        val (r, w) = AnnRecall.servedCellCrossoverBothOn(spark, e, dials)
        (r, w.toMap)
      } else
        // stored sized artifacts (first touch builds them exactly as
        // index_build_* would)
        (AnnRecall.servedCellCrossover(spark, out, dials),
          AnnRecall.servedCrossoverWalls(spark, out, dials).toMap)
    val recall = recallDf
      .groupBy(col("method")).agg(avg(col("recall")).as("mean_recall"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    println(f"CELLCROSS $tag recall pass (wall ${(System.nanoTime() - t0) / 1e9}%.1f s)")
    dials.foreach { d =>
      Seq(f"graph_d$d%03d", f"nprobe_d$d%03d").foreach { m =>
        println(f"CELLCROSS $tag $m%-12s recall=${recall(m)}%6.4f " +
          f"wall_s=${walls(m)}%6.2f scan_frac=${d.toDouble / kCells}%6.4f")
      }
    }
    spark.stop()
  }
}
