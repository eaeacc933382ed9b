package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.operators.AnnRecall

/** Measured answer to "does the size-derived planes dial erode recall?"
  * (round-9 verdict #1). `Nsw.sizedPlanes` holds graph-build COST roughly
  * flat as the corpus grows (SCALING.md: ×10 build ratio 20.0 → 5.0) by
  * adding hyperplanes — but more planes ⇒ fewer bucket collisions ⇒
  * sparser candidate pools per node, which could quietly trade recall for
  * the cost win. SCALING.md's recall tables were fixture-size only, so
  * the tradeoff was asserted, not measured.
  *
  * `runMain graft.tools.RecallScale [factor] [outDir]` (default 10; base
  * from SPARK_GRAFT_SF_DIR, default sf0.1): builds or reuses the SfScale
  * ×K embeddings replica, then prints mean recall@3 per ANN path for
  *
  *   - the base fixture at the pinned dial (where sized == pinned by
  *     construction — the oracle-fixture anchor),
  *   - the ×K corpus at the fixture-pinned dial (the cost-blind control),
  *   - the ×K corpus at the production sized dial (the measurement).
  *
  * SPARK_GRAFT_RECALL_ROUNDS (default 3) controls how many disjoint
  * 5-query sets are averaged — see [[AnnRecall.recallProbeMeans]].
  * Results land in SCALING.md's "recall at ×10" table.
  */
object RecallScale {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse(s"target/sfscale_x$factor")
    val rounds = sys.env.get("SPARK_GRAFT_RECALL_ROUNDS")
      .flatMap(_.toIntOption).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // reuse an existing SfScale replica (identical derivation), else build
    val marker = new Path(s"$out/embeddings.parquet/_SUCCESS")
    if (!marker.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(marker))
      SfScale.writeScaledEmbeddings(spark, base, out, factor, cpus.toInt)

    val eBase = AnnRecall.probeCorpus(spark, base)
    val eX = AnnRecall.probeCorpus(spark, out)
    val (pinned, sized) = AnnRecall.probeDials(eX.count())

    def report(label: String, e: org.apache.spark.sql.DataFrame, planes: Int,
        sizedSearch: Boolean = false, pinnedCodes: Boolean = false): Map[String, Double] = {
      val t0 = System.nanoTime()
      val means = AnnRecall.recallProbeMeans(spark, e, planes, rounds, sizedSearch,
        pinnedCodes)
      val wall = (System.nanoTime() - t0) / 1e9
      means.toSeq.sortBy(_._1).foreach { case (m, r) =>
        println(f"RECALL $label%-16s planes=$planes%-3d $m%-16s $r%6.4f")
      }
      println(f"RECALL $label%-16s planes=$planes%-3d (wall $wall%.1f s, rounds=$rounds)")
      means
    }

    // SPARK_GRAFT_SERVED_ONLY=1 skips the in-probe reports and measures
    // only the serve-tier row off stored artifacts — the fast re-measure
    // path when a serve-time policy (entry seeding, dials) changed but
    // the stored builds did not.
    val servedOnly = sys.env.get("SPARK_GRAFT_SERVED_ONLY").contains("1")

    if (!servedOnly) {
    val b = report("base", eBase, pinned) // sized == pinned at fixture size (codes too)
    // The cost-blind pinned-dial control is only measurable while it is
    // merely SLOW: at planes=4 a 200k-vector corpus packs ~12.5k vectors
    // per bucket → ~10⁹ candidate pairs, which spills past local disk
    // (measured: the ×100 pinned build filled the device). The ×10 run
    // already answered the dial question (sized ≥ pinned everywhere), so
    // at factor ≥ 100 the probe measures only the production dials.
    val withPinned = factor < 100
    // pinned rows also pin the PQ code budget — the sized-codes delta
    // (Pq.sizedDials, round-10 verdict #2) reads off sized − pinned
    val xp = if (withPinned)
      Some(report(s"x$factor/pinned", eX, pinned, pinnedCodes = true)) else None
    val xs = report(s"x$factor/sized", eX, sized)
    // the probe's finding: the BUILD dial doesn't move recall, the fixed
    // SEARCH dials do — measure the sizedHops serving dial on the sized build
    val xh = report(s"x$factor/sizedhops", eX, sized, sizedSearch = true)
    xs.keys.toSeq.sorted.foreach { m =>
      val pinnedCol = xp.map(p => f"x${factor}_pinned=${p(m)}%6.4f " +
        f"sized_minus_pinned=${xs(m) - p(m)}%+7.4f ").getOrElse("")
      println(f"RECALLDELTA $m%-16s base=${b(m)}%6.4f " + pinnedCol +
        f"x${factor}_sized=${xs(m)}%6.4f x${factor}_sizedhops=${xh(m)}%6.4f " +
        f"hops_gain=${xh(m) - xs(m)}%+7.4f")
    }
    }

    // The SERVE-TIER row (round-10 verdict #1's done-criterion): recall of
    // the production cell-graph serving off the scaled dir's STORED
    // IndexStore artifacts — fixed-entry control vs routed vs the actual
    // ann_nsw_cell_search default. First touch builds the sized artifacts
    // exactly as index_build_* would; the measured rows then serve reads.
    import org.apache.spark.sql.functions.{avg, col}
    CacheRegistry.release(blocking = true)
    CacheRegistry.releaseShared(blocking = true)
    val t0 = System.nanoTime()
    AnnRecall.servedGraphRecall(spark, out)
      .groupBy(col("method")).agg(avg(col("recall")).as("mean_recall"))
      .collect().sortBy(_.getString(0)).foreach { r =>
        println(f"RECALLSERVED x$factor ${r.getString(0)}%-16s ${r.getDouble(1)}%6.4f")
      }
    println(f"RECALLSERVED x$factor (wall ${(System.nanoTime() - t0) / 1e9}%.1f s, stored artifacts at $out)")

    // SPARK_GRAFT_ROUTE_SWEEP="1,2,4,8": the probeCells dial on the served
    // routed path (per-(dial, block) rows + the blocks-averaged table)
    sys.env.get("SPARK_GRAFT_ROUTE_SWEEP").foreach { spec =>
      val dials = spec.split(",").toSeq.flatMap(_.trim.toIntOption)
      val t1 = System.nanoTime()
      AnnRecall.servedRoutedSweep(spark, out, dials)
        .groupBy(col("method")).agg(avg(col("recall")).as("mean_recall"))
        .collect().sortBy(_.getString(0)).foreach { r =>
          println(f"RECALLROUTESWEEP x$factor ${r.getString(0)}%-20s ${r.getDouble(1)}%6.4f")
        }
      println(f"RECALLROUTESWEEP x$factor (wall ${(System.nanoTime() - t1) / 1e9}%.1f s)")
    }
    spark.stop()
  }
}
