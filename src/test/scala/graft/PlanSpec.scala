package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions the scale story depends on: filters must reach
  * the parquet scans as pushed filters and projections must prune the read
  * schema — at 100 TB the scan is the dominant cost, and a plan that reads
  * unused columns or filters after the scan has silently lost the battle
  * regardless of what the operators above it do. AQE is disabled while
  * collecting so the physical tree is inspectable (same pattern as the
  * AnnSpec exchange checks).
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf0001

  private def scans(df: DataFrame): Seq[FileSourceScanExec] = {
    val conf = spark.conf
    val prev = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan.collect { case s: FileSourceScanExec => s }
    finally conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("games listing prunes unused document columns at the scan") {
    val ss = scans(graft.operators.Quality.gamesList(spark, dir))
    assert(ss.nonEmpty)
    val read = ss.flatMap(_.requiredSchema.fieldNames).toSet
    // the games view derives from doc_id/text/n_chars only — lang and
    // source must never be read for a listing
    assert(!read.contains("lang") && !read.contains("source"),
      s"listing reads unused columns: $read")
  }

  test("query-side vec_id filter is pushed into the embeddings scan") {
    val ss = scans(SparkEntry.queries("ann_brute_force_topk")(spark, dir))
    val pushed = ss.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
    assert(pushed.contains("LessThan(vec_id,5)"),
      s"expected the query-batch filter in PushedFilters, got: $pushed")
  }

  test("retention cutoff is pushed into the events scan") {
    val ss = scans(graft.operators.Jobs.retentionSweep(spark, dir))
    assert(ss.nonEmpty)
    // ts arrives as LONG nanos only under the Verify/Bench legacy flag; in
    // either representation the cutoff comparison must reach the scan
    val pushed = ss.map(_.metadata.getOrElse("PushedFilters", "")).mkString(";")
    val read = ss.flatMap(_.requiredSchema.fieldNames).toSet
    // the sweep needs only event timestamps — no props/value payloads
    assert(!read.contains("props") && !read.contains("value"),
      s"retention sweep reads unused columns: $read")
    assert(pushed.nonEmpty)
  }

  test("date-partitioned layout prunes partitions: one day's filter reads one day's files") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    graft.io.Tables.events(spark, dir)
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(tmp)
    val oneDay = spark.read.parquet(tmp)
      .filter(col("day") === "2024-01-03")
      .groupBy(col("event_type")).count()
    val conf = spark.conf
    val prev = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      oneDay.collect()
      val scan = oneDay.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }.head
      assert(scan.partitionFilters.mkString(";").contains("day"),
        "expected the day predicate as a partition filter")
      val daysOnDisk = new java.io.File(tmp).listFiles().count(_.getName.startsWith("day="))
      val filesRead = scan.metrics("numFiles").value
      assert(daysOnDisk > 10, s"fixture spans a month, found $daysOnDisk day partitions")
      assert(filesRead < daysOnDisk,
        s"partition pruning must skip most of $daysOnDisk day dirs, read $filesRead files")
    } finally conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("similarity top-k plans as TakeOrderedAndProject, not a global sort") {
    val plan = graft.operators.Similarity.similarSearch(spark, dir)
      .queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$s")
    assert(!s.contains("SortExec") || s.contains("TakeOrderedAndProject"))
  }

  test("the MMR candidate pool plans as TakeOrderedAndProject (the distributed half)") {
    // s_mmr_rerank's scale split: the pool scan is the corpus-sized part
    // and must plan as per-partition heaps, not a global sort; the greedy
    // re-rank downstream is a bounded request-scale driver loop
    val plan = graft.operators.Similarity.mmrPoolFrame(spark, dir)
      .queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$s")
  }

  test("dedup_corpus_clean plans the keep-filter as a LEFT SEMI join (no payload duplication)") {
    // the corpus payload must join the survivor ids semi-style: an inner
    // join against the full membership table would carry (and risk
    // duplicating) the document payload through a wider exchange
    val plan = graft.operators.Components.dedupCorpusClean(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected a left-semi keep filter in:\n$plan")
    graft.tools.CacheRegistry.releaseShared()
  }

  test("gopher repetition filter is map-only: no shuffle before the output sort") {
    // the quality-filter battery must run at parquet-scan speed — one
    // narrow projection, per-doc kernels, zero aggregation shuffles; the
    // only exchange in the plan is the final presentation orderBy
    val plan = graft.operators.Filtering.gopherRepetition(spark, dir)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, s"expected at most the orderBy exchange:\n$plan")
    exchanges.foreach(e => assert(
      e.outputPartitioning.toString.toLowerCase.contains("range"),
      s"the single exchange must be the orderBy range partition, got: $e"))
  }

  test("line dedup removes boilerplate via a broadcast LEFT ANTI, not a shuffled join") {
    // the duplicate-hash table is tiny by construction (only boilerplate
    // recurs), so the corpus-sized removal join must be broadcast-anti —
    // a sort-merge anti would shuffle the whole exploded line stream
    val plan = graft.operators.Filtering.lineDedup(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected broadcast left-anti removal in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffled join in:\n$plan")
  }

  test("lm perplexity scores via broadcast model joins, no shuffled join") {
    // the hashed-LM weight tables are <=B^2/<=B rows: both scoring joins
    // and the tercile-cutoff join-back must broadcast; the only shuffles
    // are the two bounded-key model groupBys, the per-doc groupBy, and
    // the presentation sort
    val plan = graft.operators.Filtering.lmPerplexity(spark, dir)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"expected broadcast scoring joins in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffled join in:\n$plan")
  }

  test("hard negatives prune the token stream with a broadcast semi-join") {
    // the exploded corpus tokens must be filtered to query vocabulary by
    // a broadcast LEFT SEMI before any aggregation — a shuffled semi (or
    // filtering after the tf groupBy) would shuffle the corpus vocabulary
    val plan = graft.operators.Curation.hardNegatives(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected semi-join vocab prune in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffled join in:\n$plan")
  }

  test("span corruption is map-only: no shuffle before the output sort") {
    val plan = graft.operators.Curation.spanCorrupt(spark, dir)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, s"expected at most the orderBy exchange:\n$plan")
    exchanges.foreach(e => assert(
      e.outputPartitioning.toString.toLowerCase.contains("range"),
      s"the single exchange must be the orderBy range partition, got: $e"))
  }

  test("semantic dedup joins centroids by broadcast on both sides of the prune") {
    // the K-row centroid table and the within-cell self-join must not
    // shuffle the corpus twice: centroid lookup broadcasts, and the pair
    // join keys on cluster occupancy (bounded), never a cartesian
    val plan = graft.operators.Dedup.dedupSemantic(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast centroid join in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"no cartesian in:\n$plan")
  }

  test("sequence packing runs its big window partitioned, offsets broadcast") {
    // the distributed-prefix-sum claim, structurally: the corpus-sized
    // cumsum window must be PARTITIONED by bucket (a single-partition
    // window over 100 TB is one executor sorting the corpus), and the
    // 64-row bucket-offset table must come back via broadcast, never a
    // shuffled join
    val plan = graft.operators.Curation.packChunks(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast-join back in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "no shuffled join in the pack plan")
    val windowSpecs = "Window \\[sum".r.findAllIn(plan).size
    val partitionedSpecs = "windowspecdefinition\\(bucket".r.findAllIn(plan).size
    assert(partitionedSpecs >= 1,
      s"corpus-sized cumsum must partition by bucket ($windowSpecs windows):\n$plan")
  }

  test("c4 heuristics are map-only: no shuffle before the output sort") {
    // the whole battery (line derivation, sentence/word classifiers,
    // page flags, clean fingerprint) must stay one narrow projection —
    // a groupBy-shaped formulation would shuffle the corpus
    val plan = graft.operators.Filtering.c4Heuristics(spark, dir)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, s"expected at most the orderBy exchange:\n$plan")
    exchanges.foreach(e => assert(
      e.outputPartitioning.toString.toLowerCase.contains("range"),
      s"the single exchange must be the orderBy range partition, got: $e"))
  }

  test("substring dedup joins windows back on the gram hash, with partial counts") {
    // the duplicated-window set must come from a hash aggregate on the
    // 8-byte gram key (map-side partial counts collapse the unique mass
    // before the shuffle) and rejoin the window stream as an equi-join —
    // any nested-loop/cartesian here would be the suffix-array port this
    // operator exists to avoid
    val plan = graft.operators.Dedup.dedupSubstring(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"window join must stay an equi-join on the gram hash:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial count"),
      s"expected map-side partial counts before the gram shuffle:\n$plan")
    graft.tools.CacheRegistry.releaseShared()
  }

  test("attribution join keys on user_id — hash join, never a nested loop") {
    // the time filter must ride the user_id equi-join as a residual
    // condition; losing the equi-key would plan |purchases| x |views|
    val plan = graft.operators.Events.attribution(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"range predicate must stay residual on the hash join:\n$plan")
  }

  test("chunk overlap is map-only: no shuffle before the output sort") {
    // chunking must run at scan speed: tokenize + explode the start
    // lattice + slice, all narrow; the only exchange is the presentation
    // orderBy
    val plan = graft.operators.Curation.chunkOverlap(spark, dir)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.size <= 1, s"expected at most the orderBy exchange:\n$plan")
    exchanges.foreach(e => assert(
      e.outputPartitioning.toString.toLowerCase.contains("range"),
      s"the single exchange must be the orderBy range partition, got: $e"))
  }

  test("priority sample plans as TakeOrderedAndProject, not a global sort") {
    // the weighted race's selection is ORDER BY key LIMIT K — per-partition
    // heaps, K·P rows to the driver, no corpus shuffle
    val s = graft.operators.Curation.prioritySample(spark, dir)
      .queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"), s"expected top-k operator in:\n$s")
  }

  test("bandedIntervalJoin plans as a broadcast equi-join for any interval set") {
    // the generalized operator (round-9): whatever the interval geometry,
    // the rewrite must broadcast the exploded band table and equi-join on
    // the band — never fall back to a nested-loop range join
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val intervals = Seq((1, 100L, 900L), (2, 5000L, 5400L), (3, 40000L, 90000L))
      .toDF("iid", "s_ms", "e_ms")
    val events = spark.range(0, 5000)
      .select((col("id") * 17L % 100000L).as("ems"), col("id").as("payload"))
    val plan = graft.operators.Events.bandedIntervalJoin(events, intervals)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast band equi-join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"interval join must not plan as a product:\n$plan")
  }

  test("salted attribution keeps the equi-join shape: no product, no nested loop") {
    // the salt must ride INSIDE the hash-join key set — a planner that
    // dropped the equi-conjuncts to a filter would devolve into the
    // nested-loop the salting exists to avoid
    val plan = graft.operators.Events
      .attributionSalted(spark, SparkTestSession.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"salted attribution must stay an equi-join:\n$plan")
  }

  test("quantile sketch samples via TakeOrderedAndProject, no shuffled join") {
    // the bottom-k-by-hash sample must be per-partition heaps + driver
    // merge (the mergeable-sketch execution), never a global sort; the
    // exact ECDF side is one aggregate behind a one-row broadcast
    val s = graft.operators.Sketches.quantileSketch(spark, dir)
      .queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"), s"expected bottom-k sample in:\n$s")
    assert(!s.contains("SortMergeJoin"), s"no shuffled join in:\n$s")
  }

  test("group quantile sketch partial-aggregates map-side, samples broadcast back") {
    // the mergeable UDAF must run as a two-phase object-hash aggregate
    // (k-row partial buffers combine map-side — the bounded-shuffle claim)
    // and the 3-row sample table must broadcast into the exact-ECDF pass
    val s = graft.operators.Sketches.quantileGroups(spark, dir)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(s).size >= 2,
      s"expected two-phase object-hash aggregation in:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast sample join in:\n$s")
    assert(!s.contains("SortMergeJoin"), s"no shuffled join in:\n$s")
  }

  test("column profile aggregates the exploded frame once, count-star broadcast back") {
    // one generate (stack) feeding one two-phase aggregation — per-column
    // profiling must NOT re-scan the table per column — and the scalar
    // total joins back as a broadcast, never a shuffle
    val s = graft.operators.Profile.profileGames(spark, dir)
      .queryExecution.executedPlan.toString
    assert("Generate explode".r.findAllIn(s).size === 1,
      s"expected exactly one stacked explode in:\n$s")
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastExchange"),
      s"expected the count-star to broadcast in:\n$s")
    assert(!s.contains("SortMergeJoin"), s"no shuffled join in:\n$s")
  }

  test("source-overlap sketches aggregate two-phase, pair algebra joins broadcast") {
    // per-source KmvValues buffers must partial-aggregate map-side, and the
    // |S|-row sketch/size tables must broadcast into the pair combine (the
    // exact-intersection oracle side is allowed its hash-keyed self-join)
    val s = graft.operators.Sketches.sourceOverlap(spark, dir)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(s).size >= 2,
      s"expected two-phase object-hash aggregation in:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast pair joins in:\n$s")
  }

  test("kmv set-ops sketches build via two-phase object-hash aggregate, no shuffled join") {
    // the KmvValues UDAF must partial-aggregate map-side (k-row buffers on
    // the shuffle, not the key sets), and the single-row exact/sketch
    // frames must combine without a SortMergeJoin
    val s = graft.operators.Sketches.kmvSetOps(spark, dir)
      .queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(s).size >= 2,
      s"expected two-phase object-hash aggregation in:\n$s")
    assert(!s.contains("SortMergeJoin"), s"no shuffled join in:\n$s")
  }

  test("cms estimates join the 1024-cell table broadcast, probes via top-k") {
    val s = graft.operators.Sketches.cmsHeavyHitters(spark, dir)
      .queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"), s"expected top-k probe list in:\n$s")
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast cells join in:\n$s")
    assert(!s.contains("SortMergeJoin"), s"no shuffled join in:\n$s")
  }

  test("bloom prune tests membership map-side: pruned scan, no shuffled join") {
    val s = graft.operators.Sketches.bloomPrune(spark, dir)
      .queryExecution.executedPlan.toString
    // the truth-flag join must broadcast the dimension; membership is
    // broadcast hash lookups against the tiny word table
    assert(s.contains("BroadcastHashJoin"), s"expected broadcast dim join in:\n$s")
    assert(!s.contains("SortMergeJoin"), s"no shuffled join in:\n$s")
    // the fact scan must read only the join key + row id (fresh frame:
    // scans() needs to materialize the physical plan with AQE off)
    val ordScans = scans(graft.operators.Sketches.bloomPrune(spark, dir))
      .filter(_.requiredSchema.fieldNames.contains("o_custkey"))
    assert(ordScans.nonEmpty)
    ordScans.foreach { sc =>
      val read = sc.requiredSchema.fieldNames.toSet
      assert(!read.contains("o_totalprice") && !read.contains("o_orderdate"),
        s"bloom prune reads unused fact columns: $read")
    }
  }

  test("incremental dedup probes the stored base bands by broadcast, never a shuffled join") {
    // the delta batch is one crawl — small by definition — so every join
    // that touches base-corpus-sized data (band probe, verify shingle
    // fetch) must broadcast the delta-derived side; a SortMergeJoin
    // anywhere would shuffle the 100 TB base
    val plan = graft.operators.Dedup.dedupIncremental(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast band probe in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffled join in:\n$plan")
  }
}
