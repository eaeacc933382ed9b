package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale proof for the dedup + ANN suite: write a K×-replicated
  * copy of the sf fixtures, run every `dedup_*` / `ann_*` query at both
  * scales in one warmed JVM, and print per-query time ratios — turning the
  * "candidates are bounded" design argument into data (a bounded operator
  * scales ~linearly in rows; a quadratic candidate generator shows up as a
  * ratio near K², unmissable).
  *
  * Replicas are DISTINCT data, not byte copies — that is the point:
  *
  *   - documents: every token gets a per-replica suffix, so replicas share
  *     no shingles/grams and are not near-duplicates of each other, while
  *     each replica band keeps the fixture's internal duplicate structure
  *     (the corpus() re-crawl copies land inside the band). Byte-identical
  *     replication would make every cross-replica pair a verified
  *     duplicate — output pairs O(K²) by CONSTRUCTION, telling you nothing
  *     about the operator;
  *   - embeddings: each replica's vector is rotated by `rep` positions —
  *     decorrelated from its source (so no artificial near-dup pairs) with
  *     an unchanged value distribution; queries stay the original
  *     `vec_id < 5` rows.
  *
  * `runMain graft.tools.SfScale [factor]` (default 10; base dir from
  * SPARK_GRAFT_SF_DIR, default sf0.1; scaled tables under
  * target/sfscale_x{factor}).
  */
object SfScale {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.flatMap(_.toIntOption).getOrElse(10)
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse(s"target/sfscale_x$factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicated(df: DataFrame, idCol: String): DataFrame =
      SfScale.replicated(df, idCol, factor)

    // documents: per-replica token suffix => replicas are unrelated texts
    val docs = spark.read.parquet(s"$base/documents.parquet")
    replicated(docs, "doc_id")
      .withColumn("text",
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit("r"), col("rep"))), " "))
      .drop("rep")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    // embeddings: rotate each replica's vector by rep positions
    writeScaledEmbeddings(spark, base, out, factor, cpus.toInt)

    // events: per-replica DISTINCT user ids over the SAME time range, so
    // the event stream gets K× denser but the per-user rate (what bounds the
    // attribution join fan-out and the session/window state) is unchanged
    // — the scale axis a crawler's traffic growth actually follows. ts
    // stays in its on-disk representation (LONG nanos under the session's
    // nanosAsLong flag), so the scaled table round-trips identically.
    val ev = spark.read.parquet(s"$base/events.parquet")
    val evOff = ev.agg(max(col("event_id"))).head().getLong(0) + 1L
    val userOff = ev.agg(max(col("user_id"))).head().getLong(0) + 1L
    ev.withColumn("rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("event_id", col("event_id") + col("rep") * evOff)
      .withColumn("user_id", col("user_id") + col("rep") * userOff)
      .drop("rep")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // orders + lineitem: disjoint graph replicas (every key family offset
    // per replica) — K× nodes and edges with unchanged degree structure,
    // the honest scale axis for the iterative graph ops
    val ord = spark.read.parquet(s"$base/orders.parquet")
    val okOff = ord.agg(max(col("o_orderkey"))).head().getLong(0) + 1L
    // offset spans BOTH key populations (ADVICE r10): a customer key
    // above max(o_custkey) — an eligible customer with no sampled order —
    // would otherwise collide with the next replica's range and duplicate
    // c_custkey in the scaled dimension, fanning out the Bloom-prune join
    val custOff = math.max(
      ord.agg(max(col("o_custkey"))).head().getLong(0),
      spark.read.parquet(s"$base/customer.parquet")
        .agg(max(col("c_custkey"))).head().getLong(0)) + 1L
    ord.withColumn("rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("o_orderkey", col("o_orderkey") + col("rep") * okOff)
      .withColumn("o_custkey", col("o_custkey") + col("rep") * custOff)
      .drop("rep")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    val li = spark.read.parquet(s"$base/lineitem.parquet")
    val suppOff = li.agg(max(col("l_suppkey"))).head().getLong(0) + 1L
    li.withColumn("rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * okOff)
      .withColumn("l_suppkey", col("l_suppkey") + col("rep") * suppOff)
      .drop("rep")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    // customer: same per-replica key offset as orders.o_custkey, so the
    // scaled orders keep referential integrity (the Bloom-prune dimension)
    val cust = spark.read.parquet(s"$base/customer.parquet")
    cust.withColumn("rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("c_custkey", col("c_custkey") + col("rep") * custOff)
      .drop("rep")
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    // SPARK_GRAFT_SCALE_QUERIES: comma-separated subset (e.g. to exclude
    // the intentionally-quadratic salted-skew demo from very large factors)
    val only = sys.env.get("SPARK_GRAFT_SCALE_QUERIES").map(_.split(",").toSet)
    val sketchQs = Set("q_quantile_sketch", "q_quantile_groups",
      "q_kmv_set_ops", "q_cms_heavy_hitters", "j_bloom_prune",
      "q_profile_games")
    val names = graft.SparkEntry.queries.keys
      .filter(n => n.startsWith("dedup_") || n.startsWith("ann_")
        || n.startsWith("index_build_") || n.startsWith("cur_")
        || n.startsWith("flt_") || n.startsWith("mm_")
        || n.startsWith("f6_") || n == "s_mmr_rerank"
        || n.startsWith("ev_") || n.startsWith("graph_")
        || sketchQs.contains(n))
      .filter(n => only.forall(_.contains(n))).toSeq.sorted
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      CacheRegistry.release(blocking = true)
      CacheRegistry.releaseShared(blocking = true)
      s
    }
    // Prime BOTH dirs' IndexStore artifacts outside any measurement: a
    // serve query's first touch would otherwise build the scaled artifact
    // inside its measured run — the attribution bug the build/serve split
    // removed from Bench. Build entries then REBUILD when measured, so
    // their ratios are honest build-cost scaling; serve ratios are pure
    // read+search scaling.
    names.filter(_.startsWith("index_build_")).foreach { n =>
      run(n, base); run(n, out)
    }
    println(f"${"query"}%-26s ${"base_s"}%8s ${"x" + factor + "_s"}%8s ${"ratio"}%7s")
    names.foreach { name =>
      run(name, base) // warm codegen/JIT for this query's plan shape
      val tBase = run(name, base)
      val tScaled = run(name, out)
      println(f"SCALE $name%-26s $tBase%8.2f $tScaled%8.2f ${tScaled / tBase}%7.2f")
    }
    // The oracle-checked near-dup query pins planes=8 (fixture-sized); at
    // large factors those 2^8 buckets saturate — occupancy grows linearly,
    // within-bucket pairs quadratically. Measure the production dial too:
    // planes resized to hold expected occupancy at the fixture's level.
    if (only.forall(_.contains("dedup_embedding_cosine")) && factor > 1) {
      val planes = 8 + math.ceil(math.log(factor.toDouble) / math.log(2.0)).toInt
      def runPlanes(dir: String, p: Int): Double = {
        val t0 = System.nanoTime()
        graft.operators.Dedup.dedupEmbeddingCosinePlanes(spark, dir, p)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        CacheRegistry.release(blocking = true)
        CacheRegistry.releaseShared(blocking = true)
        s
      }
      runPlanes(base, 8)
      val tBase = runPlanes(base, 8)
      val tScaled = runPlanes(out, planes)
      println(f"SCALE ${s"dedup_embedding_cosine/p$planes"}%-26s $tBase%8.2f $tScaled%8.2f ${tScaled / tBase}%7.2f")
    }
    // Clustered-geometry near-dup (round 8): hyperplane blocking degrades
    // exactly here — same-cluster members co-bucket, so within-bucket pairs
    // grow with cluster size squared. Measure the UNCAPPED clustered
    // derivation at the pinned dial (saturation) and at the production dial
    // (extra planes split on the noise component and restore candidate
    // bounds — each plane halves expected same-cluster co-bucketing at
    // spread 0.9, where ~45% of a member's energy is noise).
    if (only.forall(_.contains("dedup_embedding_cosine_clustered")) && factor > 1) {
      val planes = 8 + math.ceil(math.log(factor.toDouble) / math.log(2.0)).toInt
      def runClustered(dir: String, p: Int): Double = {
        val t0 = System.nanoTime()
        graft.operators.Dedup.dedupEmbeddingCosineClusteredPlanes(spark, dir, p)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        CacheRegistry.release(blocking = true)
        CacheRegistry.releaseShared(blocking = true)
        s
      }
      runClustered(base, 8)
      val tBase = runClustered(base, 8)
      val tPinned = runClustered(out, 8)
      val tScaled = runClustered(out, planes)
      println(f"SCALE ${"dedup_emb_cos_uncapped/p8"}%-26s $tBase%8.2f $tPinned%8.2f ${tPinned / tBase}%7.2f")
      println(f"SCALE ${s"dedup_emb_cos_uncapped/p$planes"}%-26s $tBase%8.2f $tScaled%8.2f ${tScaled / tBase}%7.2f")
      // ...and the production fix: residual blocking under (cluster,
      // bucket) — candidate pairs measured 13.7× below raw-vector blocking
      // at the same planes on this geometry (see Dedup scaladoc)
      def runResidual(dir: String, p: Int): Double = {
        val t0 = System.nanoTime()
        graft.operators.Dedup.dedupEmbeddingCosineResidualPlanes(spark, dir, p)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        CacheRegistry.release(blocking = true)
        CacheRegistry.releaseShared(blocking = true)
        s
      }
      runResidual(base, 8)
      val rBase = runResidual(base, 8)
      val rScaled = runResidual(out, 8)
      println(f"SCALE ${"dedup_emb_cos_residual/p8"}%-26s $rBase%8.2f $rScaled%8.2f ${rScaled / rBase}%7.2f")
    }
    // SemDeDup's dial is K ∝ N (the paper's regime: constant cell
    // occupancy ⇒ the within-cell quadratic costs O(occupancy) per vector
    // regardless of corpus size). Pinned K=8 grows cell occupancy linearly
    // — within-cell pairs quadratically; the resized run pays K× more
    // assignment arithmetic but holds pair volume flat.
    if (only.forall(_.contains("dedup_semantic")) && factor > 1) {
      def runSem(dir: String, kk: Int): Double = {
        val t0 = System.nanoTime()
        graft.operators.Dedup.dedupSemanticK(spark, dir, kk)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        CacheRegistry.release(blocking = true)
        CacheRegistry.releaseShared(blocking = true)
        s
      }
      runSem(base, 8)
      val tBase = runSem(base, 8)
      val tPinned = runSem(out, 8)
      val tScaled = runSem(out, 8 * factor)
      println(f"SCALE ${"dedup_semantic/k8"}%-26s $tBase%8.2f $tPinned%8.2f ${tPinned / tBase}%7.2f")
      println(f"SCALE ${s"dedup_semantic/k${8 * factor}"}%-26s $tBase%8.2f $tScaled%8.2f ${tScaled / tBase}%7.2f")
    }
    // Attribution-join skew (round-9 verdict #2): the operator scaladoc
    // used to point at dedup_salted_skew by analogy; this block measures
    // the real thing. Skewed replica: the ×K events with 10 % of ALL view
    // rows reassigned to one hot user (per-user rate is otherwise flat by
    // construction, so this single key IS the imbalance). Three plans over
    // the same corpus: stock join with AQE off (the unhandled straggler),
    // stock with AQE skew-join (runtime partition split), and the salted
    // rewrite (static split; exact same result — oracle-checked at fixture
    // scale as ev_attribution_salted). Skew is a TASK-BALANCE defect, so
    // each run reports median and max task ms alongside wall.
    if (only.forall(_.contains("ev_attribution_skew")) && factor > 1) {
      // hot-user share dial: 1/N of ALL events → user 0 (default 10 %).
      // Both event types must go hot: the join's fan-out is
      // purchases(u) × views-in-window(u), so a user hot on views alone
      // produces NO straggler (measured — top-3 stage imbalance 1.1 at
      // 10 % of views); the realistic hot key (a bot account) is hot on
      // both sides and its output fan-out is quadratic in its share.
      val skewMod = sys.env.get("SPARK_GRAFT_SKEW_MOD")
        .flatMap(_.toIntOption).getOrElse(10)
      val skewDir = s"$out-skew"
      spark.read.parquet(s"$out/events.parquet")
        .withColumn("user_id",
          when(col("event_id") % skewMod === 0, lit(0L))
            .otherwise(col("user_id")))
        .repartition(cpus.toInt)
        .write.mode("overwrite").parquet(s"$skewDir/events.parquet")
      // Three regimes, because the FIRST defense is not salting:
      //   broadcast  — purchases fit the broadcast threshold, the join is
      //                skew-IMMUNE by construction (no shuffle by key;
      //                hot rows stream evenly through every scan task);
      //   shuffle    — threshold forced to -1, the 100 TB regime where
      //                both sides shuffle on user_id and the hot key
      //                pins one task (the straggler to measure);
      //   salted     — the rewrite, in the same forced-shuffle regime.
      val bal = new TaskBalance
      spark.sparkContext.addSparkListener(bal)
      def runAttr(tag: String, aqe: Boolean, broadcast: Boolean,
          f: (SparkSession, String) => DataFrame): Unit = {
        spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          if (broadcast) "10485760" else "-1")
        f(spark, skewDir).write.format("noop").mode("overwrite").save() // warm
        bal.reset()
        val t0 = System.nanoTime()
        f(spark, skewDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val (all, _) = bal.snapshot()
        val stages = bal.topStages(3).map { case (sid, st) =>
          f"s$sid(n=${st.tasks},p50=${st.p50Ms},max=${st.maxMs},imb=${st.imbalance}%.1f)"
        }.mkString(" ")
        println(f"SKEW $tag%-32s $wall%7.2f s  tasks=${all.tasks}%5d  $stages")
      }
      runAttr("attribution/broadcast", aqe = true, broadcast = true,
        graft.operators.Events.attribution)
      runAttr("attribution/shuffle/aqe_off", aqe = false, broadcast = false,
        graft.operators.Events.attribution)
      runAttr("attribution/shuffle/aqe_on", aqe = true, broadcast = false,
        graft.operators.Events.attribution)
      runAttr("attribution/salted/aqe_off", aqe = false, broadcast = false,
        graft.operators.Events.attributionSalted)
      runAttr("attribution/salted/aqe_on", aqe = true, broadcast = false,
        graft.operators.Events.attributionSalted)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sparkContext.removeSparkListener(bal)
    }
    // Incremental merge at lake dials (round-9 verdict #5): the
    // oracle-checked j1_merge_incremental pins 16 buckets at fixture size;
    // here bucket count scales with the corpus (256) and the fresh batch
    // stays small (~keys/997), so the claim that matters at 100 TB —
    // rewritten bytes ∝ touched buckets, NOT table size — is measured on
    // the ×K corpus and printed as MERGEINC rows for SCALING.md.
    if (only.forall(_.contains("j1_merge_incremental")) && factor > 1) {
      val stats = graft.operators.Merge.incrementalProbe(
        spark, out, s"$out/merge-inc-probe", buckets = 256, keyMod = 997)
      stats.foreach { s =>
        val byteFrac = s.rewrittenBytes.toDouble / s.tableBytes
        val bucketFrac = s.touchedBuckets.toDouble / s.totalBuckets
        println(f"MERGEINC x$factor round=${s.round} touched=${s.touchedBuckets}/${s.totalBuckets} " +
          f"rewritten_bytes=${s.rewrittenBytes} table_bytes=${s.tableBytes} " +
          f"byte_frac=$byteFrac%.3f bucket_frac=$bucketFrac%.3f")
      }
    }
    // CDC (j1_merge_changes): the feed must price CHANGES, not the table.
    // Lake dials on both corpora: buckets ∝ corpus (per-bucket bytes stay
    // fixed — the buckets ≈ tableBytes/1GiB rule) and a FIXED absolute
    // change batch (the same keys on base and scaled, the fixed-crawl axis
    // IncrementalScale established for incremental dedup). Claim measured:
    // the v1→v3 read time is FLAT at ×K under the sized dial; the
    // pinned-bucket control shows the read growing with per-bucket bytes.
    // The initial bulk load is pre-partitioned by the bucket function —
    // the call-site dial upsertIncrementalRounds documents (a wide write
    // into buckets× partition dirs is the dynamic-partition explosion).
    if (only.forall(_.contains("j1_merge_changes")) && factor > 1) {
      val keyCap = spark.read.parquet(s"$base/documents.parquet")
        .agg(max(col("doc_id"))).head().getLong(0) + 1L
      def freshAbs(dir: String, r: Int): DataFrame =
        graft.io.Tables.games(spark, dir)
          .filter(col("universeId") % 997 === r && col("universeId") < keyCap)
          .select(col("universeId"), col("rootPlaceId"),
            concat(col("name"), lit(s" r$r")).as("name"),
            col("description"),
            (coalesce(col("playerCount"), lit(0L)) + r).as("playerCount"))
      def buildAndRead(dir: String, tag: String, buckets: Int): Unit = {
        val path = s"$out/merge-cdc-$tag"
        val initial = graft.io.Tables.games(spark, dir)
          .drop("descriptionFetched")
          .repartition(cpus.toInt, pmod(col("universeId"), lit(buckets)))
        graft.operators.Merge.upsertIncrementalRounds(spark, path, initial,
          (1 to 3).map(freshAbs(dir, _)), "universeId",
          overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
          coalesceCols = Seq("description"),
          keepCols = Seq("gameplayDescription"),
          buckets = buckets, retainVersions = 4)
        def timeRead(): Double = {
          val t0 = System.nanoTime()
          graft.operators.Merge.readChanges(spark, path, 1, 3, "universeId")
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        timeRead() // warm the plan
        val t = timeRead()
        val feed = graft.operators.Merge.readChanges(spark, path, 1, 3, "universeId")
        val rows = feed.count()
        // bytes actually opened — the cost that matters at 100 TB, where
        // wall-clock at fixture size is job-overhead-bound either way
        val openedBytes = feed.inputFiles.map(f =>
          new java.io.File(new java.net.URI(f)).length()).sum
        val tableBytes = graft.operators.Merge.readTable(spark, path)
          .inputFiles.map(f =>
            new java.io.File(new java.net.URI(f)).length()).sum
        val changed = graft.operators.Merge
          .changedBucketsBetween(spark, path, 1, 3).length
        println(f"CDC $tag%-12s buckets=$buckets%-6d changed=$changed%-5d " +
          f"feed_rows=$rows%-6d read_s=$t%.2f opened_bytes=$openedBytes%-9d " +
          f"table_bytes=$tableBytes%-10d frac=${openedBytes.toDouble / tableBytes}%.4f")
        // IVM refresh vs recompute on the same table: the view is STORED
        // (one-time base agg over v1, written out — the materialized-view
        // shape), then refresh = fold the v2/v3 preimage feeds into the
        // stored view. Claim: refresh is change-proportional and stays
        // FLAT at xK, while the recompute control scans the table and
        // grows with it.
        val viewPath = s"$path-view"
        graft.operators.Merge.ivmBaseAgg(
            graft.operators.Merge.readTableAt(spark, path, 1).drop("bucket", "gen"))
          .write.mode("overwrite").parquet(viewPath)
        def refreshed(): DataFrame = (2 to 3)
          .map(v => graft.operators.Merge.ivmDeltaAgg(
            graft.operators.Merge.readChanges(spark, path, v - 1, v,
              "universeId", withPreimage = true)))
          .foldLeft(spark.read.parquet(viewPath))(graft.operators.Merge.ivmApply)
        def timeNoop(mk: () => DataFrame): Double = {
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        timeNoop(refreshed _) // warm
        val tRefresh = timeNoop(refreshed _)
        def recomputed(): DataFrame = graft.operators.Merge.ivmBaseAgg(
          graft.operators.Merge.readTable(spark, path).drop("bucket", "gen"))
        timeNoop(recomputed _) // warm
        val tRecompute = timeNoop(recomputed _)
        println(f"IVM $tag%-12s refresh_s=$tRefresh%.2f recompute_s=$tRecompute%.2f")
      }
      buildAndRead(base, "base", 256)
      buildAndRead(out, s"x$factor", 256 * factor)
      buildAndRead(out, s"x${factor}pin", 256)
    }
    // The IVF family's dial: K cells partition the corpus, so pinned-K
    // single-cell scans grow linearly in N (N/K per cell). Production
    // sizing K ∝ √N balances probe cost K against scan cost N/K; the
    // probe measures train+assign+search at both (store bypassed — the
    // resized training IS part of the measured cost).
    if (only.forall(_.contains("ann_ivf_kmeans_search")) && factor > 1) {
      val k = 8 * math.ceil(math.sqrt(factor.toDouble)).toInt
      def runK(dir: String, kk: Int): Double = {
        val t0 = System.nanoTime()
        graft.operators.IvfKMeans.kmeansSearchK(spark, dir, kk)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        CacheRegistry.release(blocking = true)
        CacheRegistry.releaseShared(blocking = true)
        s
      }
      runK(base, 8)
      val tBase = runK(base, 8)
      val tPinned = runK(out, 8)
      val tScaled = runK(out, k)
      println(f"SCALE ${"ann_ivf_kmeans/k8"}%-26s $tBase%8.2f $tPinned%8.2f ${tPinned / tBase}%7.2f")
      println(f"SCALE ${s"ann_ivf_kmeans/k$k"}%-26s $tBase%8.2f $tScaled%8.2f ${tScaled / tBase}%7.2f")
    }
    // Same dial, same story for the NSW graph build: the oracle-pinned
    // query buckets with 4 planes per table, so its candidate pairs grow
    // ~linearly in occupancy; the production sizing resizes planes to hold
    // per-bucket occupancy at the fixture's level.
    if (only.forall(_.contains("ann_nsw_search")) && factor > 1) {
      val planes = 4 + math.ceil(math.log(factor.toDouble) / math.log(2.0)).toInt
      def runNsw(dir: String, p: Int): Double = {
        val t0 = System.nanoTime()
        graft.operators.Nsw.nswSearchPlanes(spark, dir, p)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        CacheRegistry.release(blocking = true)
        CacheRegistry.releaseShared(blocking = true)
        s
      }
      runNsw(base, 4)
      val tBase = runNsw(base, 4)
      val tScaled = runNsw(out, planes)
      println(f"SCALE ${s"ann_nsw_search/p$planes"}%-26s $tBase%8.2f $tScaled%8.2f ${tScaled / tBase}%7.2f")
    }
    // The 2-layer hierarchy builds TWO pinned-planes graphs (layer 1 over
    // the 1/8 sample, layer 0 = the NSW graph), so its pinned ratio compounds
    // the same occupancy growth; the production dial resizes both layers.
    if (only.forall(_.contains("ann_hnsw_search")) && factor > 1) {
      val planes = 4 + math.ceil(math.log(factor.toDouble) / math.log(2.0)).toInt
      def runHnsw(dir: String, p: Int): Double = {
        val t0 = System.nanoTime()
        graft.operators.Nsw.hnswSearchPlanes(spark, dir, p)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        CacheRegistry.release(blocking = true)
        CacheRegistry.releaseShared(blocking = true)
        s
      }
      runHnsw(base, 4)
      val tBase = runHnsw(base, 4)
      val tScaled = runHnsw(out, planes)
      println(f"SCALE ${s"ann_hnsw_search/p$planes"}%-26s $tBase%8.2f $tScaled%8.2f ${tScaled / tBase}%7.2f")
    }
    // Stream-stream attribution at scale (round-9): replay BOTH corpora
    // through the watermarked StreamingJoin (four time-ordered file drops
    // so the watermark actually advances) and record (a) exact pair parity
    // with the batch attribution join at each scale and (b) PEAK JOIN
    // STATE from Spark's own stateOperators metrics. The SfScale events
    // axis adds K× distinct users at unchanged per-user rate over the same
    // time range, so the watermark bound predicts peak state ≈ K× rows but
    // FLAT per user — a leak (state ∝ stream length, not window × rate)
    // would show as a super-K state ratio. This is the measured-evidence
    // form of StreamingJoinSpec's fixture-scale parity test.
    if (only.forall(_.contains("streaming_attribution")) && factor > 1) {
      def runStream(dir: String, tag: String): (Double, Long, Long) = {
        val drop = java.nio.file.Files.createTempDirectory(s"sfattr-$tag").toString
        val ckpt = java.nio.file.Files.createTempDirectory(s"sfattr-ck-$tag").toString
        val ev = graft.io.Tables.events(spark, dir)
          .select("event_id", "ts", "user_id", "event_type", "value", "props")
        val qs = ev.select(expr(
          "percentile(unix_timestamp(ts), array(0.25, 0.5, 0.75))"))
          .head().getSeq[Double](0).map(_.toLong)
        val t = unix_timestamp(col("ts"))
        Seq(
          ("a", t <= qs(0)),
          ("b", t > qs(0) && t <= qs(1)),
          ("c", t > qs(1) && t <= qs(2)),
          ("d", t > qs(2))
        ).foreach { case (part, pred) =>
          ev.filter(pred).coalesce(1).write.parquet(s"$drop/${part}_drop")
        }
        val name = s"sfattr_$tag"
        def src = spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", 1).option("latestFirst", "false")
          .parquet(s"$drop/*")
        val t0 = System.nanoTime()
        val q = graft.streaming.StreamingJoin.startMemorySink(
          graft.streaming.StreamingJoin.attributionPairs(src, src), name, ckpt)
        val finished = q.awaitTermination(600000L)
        if (!finished)
          // a timeout must not masquerade as a parity failure downstream
          println(s"STREAMPARITY $tag: TIMEOUT after 600s — counts below are partial")
        val sec = (System.nanoTime() - t0) / 1e9
        val pairs = spark.table(name).count()
        val peakState = q.recentProgress
          .flatMap(_.stateOperators.map(_.numRowsTotal))
          .foldLeft(0L)(math.max)
        (sec, pairs, peakState)
      }
      def batchPairs(dir: String): Long =
        graft.operators.Events.attribution(spark, dir)
          .agg(sum(col("n_views"))).head().getLong(0)
      val (sB, pB, stB) = runStream(base, "base")
      val (sX, pX, stX) = runStream(out, s"x$factor")
      val (bB, bX) = (batchPairs(base), batchPairs(out))
      println(f"SCALE ${"streaming_attribution"}%-26s $sB%8.2f $sX%8.2f ${sX / sB}%7.2f")
      println(s"STREAMPARITY base: pairs=$pB batch=$bB parity=${pB == bB} peak_state=$stB")
      println(s"STREAMPARITY x$factor: pairs=$pX batch=$bX parity=${pX == bX} " +
        s"peak_state=$stX state_ratio=${if (stB > 0) f"${stX.toDouble / stB}%.2f" else "n/a"}")
    }
    // Bloom-prune at lake dials: the oracle-pinned query carries 65536
    // bits (fixture-sized, ~20 bits per dim key). On the ×K dimension the
    // pinned filter saturates — fp_rate rises and n_pass drifts toward
    // n_orders, so the prune stops paying for itself; the production dial
    // bits ∝ |dim| restores the fixture's fp behavior at unchanged O(1)
    // per-row test cost (the broadcast word array grows to K×8 KB — still
    // broadcast-scale at any realistic dimension). Both dials print their
    // measured fp stats as BLOOM rows for SCALING.md.
    if (only.forall(_.contains("j_bloom_prune")) && factor > 1) {
      def runBloom(dir: String, bits: Long): (Double, org.apache.spark.sql.Row) = {
        val t0 = System.nanoTime()
        val row = graft.operators.Sketches.bloomPruneBits(spark, dir, bits)
          .collect().head
        val s = (System.nanoTime() - t0) / 1e9
        CacheRegistry.release(blocking = true)
        CacheRegistry.releaseShared(blocking = true)
        (s, row)
      }
      def nextPow2(x: Long): Long = { var p = 1L; while (p < x) p <<= 1; p }
      val sized = nextPow2(65536L * factor)
      def fmt(r: org.apache.spark.sql.Row) =
        s"pass=${r.getAs[Long]("n_pass")}/${r.getAs[Long]("n_orders")} " +
          s"match=${r.getAs[Long]("n_match")} fp=${r.getAs[Long]("n_false_pos")} " +
          s"fp_rate=${r.getAs[Double]("fp_rate")} bits_set=${r.getAs[Long]("bits_set")}"
      runBloom(base, 65536L)
      val (tb, rb) = runBloom(base, 65536L)
      val (tp, rp) = runBloom(out, 65536L)
      val (ts2, rs) = runBloom(out, sized)
      println(f"SCALE ${"j_bloom_prune/b64k"}%-26s $tb%8.2f $tp%8.2f ${tp / tb}%7.2f")
      println(f"SCALE ${s"j_bloom_prune/b${sized / 1024}k"}%-26s $tb%8.2f $ts2%8.2f ${ts2 / tb}%7.2f")
      println(s"BLOOM base/b64k: ${fmt(rb)}")
      println(s"BLOOM x$factor/b64k: ${fmt(rp)}")
      println(s"BLOOM x$factor/b${sized / 1024}k: ${fmt(rs)}")
    }
    spark.stop()
  }

  /** Replica ids offset by max(id)+1, NOT a fixed huge constant: the NSW
    * long links are generated on the id lattice, and a sparse id space
    * (ids clustered at k·10^7) would silently drop most of them — the
    * scaled graph would not be the structure the base measurement ran on.
    * With dense base ids (embeddings are 0..N-1) this keeps replicas dense. */
  private[tools] def replicated(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    val offset = df.agg(max(col(idCol))).head().getLong(0) + 1L
    df.withColumn("rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn(idCol, col(idCol) + col("rep") * offset)
  }

  /** The ×K embeddings replica (per-replica vector rotation — decorrelated
    * from the source with an unchanged value distribution; queries stay the
    * original `vec_id < 5` rows because replica 0's rotation is the
    * identity). Factored out so [[RecallScale]] can build or reuse just
    * this table without a full SfScale run. */
  private[tools] def writeScaledEmbeddings(
      spark: SparkSession, base: String, out: String, factor: Int, parts: Int): Unit = {
    val emb = spark.read.parquet(s"$base/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    replicated(emb, "vec_id", factor)
      .withColumn("r", col("rep") % dim)
      .withColumn("embedding",
        concat(slice(col("embedding"), col("r") + 1, lit(dim) - col("r")),
          slice(col("embedding"), lit(1), col("r"))))
      .drop("rep", "r")
      .repartition(parts)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }
}
