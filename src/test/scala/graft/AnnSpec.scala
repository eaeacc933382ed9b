package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-3 ANN coverage: the production-usable approximate paths
  * (multi-table LSH, IVF nprobe) and the shuffle-discipline fix to the
  * multi-probe dedup. */
class AnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // memoized: three tests read it, and the harness runs every search path
  private lazy val recallByMethod: Map[String, Double] = {
    val rows = graft.operators.AnnRecall.annRecall(spark, SparkTestSession.Sf0001).collect()
    rows.groupBy(_.getString(0)).map { case (m, rs) =>
      m -> rs.map(_.getDouble(3)).sum / rs.length
    }
  }

  test("ivf nprobe=2 clears the production recall bar and beats single-cell") {
    val r = recallByMethod
    assert(r("ivf_nprobe") >= 0.8, s"ivf_nprobe recall ${r("ivf_nprobe")}")
    assert(r("ivf_nprobe") >= r("ivf_kmeans"))
  }

  test("multi-table LSH recalls far above single-table and multi-probe") {
    val r = recallByMethod
    // Near-uniform fixture vectors: LSH recall tracks scan fraction, so the
    // honest claim is ordering + a floor, not a point value (SCALING.md).
    assert(r("lsh_multitable") > r("lsh_multiprobe"))
    assert(r("lsh_multitable") > r.getOrElse("lsh", 0.0))
    assert(r("lsh_multitable") >= 0.4)
  }

  test("PQ ADC recovers true neighbors from 4-byte codes well above chance") {
    // full scan over quantized codes: recall is bounded by quantization
    // loss, not scan fraction — on this near-uniform fixture a 1-iteration
    // M=4 x K=16 quantizer lands ~0.33 (top-3 of ~200 is ~0.015 by chance)
    val r = recallByMethod
    assert(r("pq_adc") >= 0.2, s"pq_adc recall ${r("pq_adc")}")
  }

  test("NSW graph search: symmetric edge table, self-excluded full top-3, recall above multiprobe") {
    import org.apache.spark.sql.functions.col
    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val edges = graft.operators.Nsw.edgesOn(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // an NSW graph is undirected: every edge must carry its reverse, and
    // greedy routing breaks on self-loops
    val edgeSet = edges.toSet
    assert(edges.forall { case (s, d) => s != d }, "self-loop in edge table")
    assert(edges.forall { case (s, d) => edgeSet.contains((d, s)) }, "asymmetric edge")
    val out = graft.operators.Nsw.nswSearch(spark, SparkTestSession.Sf0001).collect()
    assert(out.length === 15) // 5 queries × top-3
    out.foreach(r => assert(r.getLong(1) !== r.getLong(0), "query returned itself"))
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L))
      val cosines = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
    // beam search covers most of the 50-vector fixture graph: it must beat
    // the 9-bucket multiprobe and clear a floor (0.80 measured; SCALING.md)
    val r = recallByMethod
    assert(r("nsw") > r("lsh_multiprobe"), s"nsw ${r("nsw")} vs multiprobe ${r("lsh_multiprobe")}")
    assert(r("nsw") >= 0.6, s"nsw recall ${r("nsw")}")
  }

  test("IVFADC beats IVFPQ where residuals matter (clustered corpus); uniform fixture is quantization-bound") {
    // On the near-uniform fixture the coarse quantizer explains ~6% of
    // vector energy (avg residual norm² 0.93 of ‖v‖² — measured in DuckDB
    // over the trained cells), so residual encoding cannot help and both
    // PQ compositions are quantization-bound; ivfadc additionally pays
    // reconstructed-norm variance through the 2·c·r̂ cross-term
    // (SCALING.md). The construction's value shows where residuals carry
    // signal: on a clustered corpus the cell centroid explains most of the
    // vector, the residual ball is small, and the same 4-byte code budget
    // quantizes it far more finely than raw PQ's. (Tightening the spread
    // below 2.2 does NOT help either method: same-cluster cosines bunch
    // together and top-3 needs finer precision than ANY 4-byte code
    // carries — measured: both land at 0.20 recall at spread 1.0. The
    // spread-2.2 corpus is the regime that separates the constructions:
    // 0.33 ivfadc vs 0.13 ivfpq, deterministic.)
    import spark.implicits._
    val dims = 64; val n = 400; val clusters = 8
    val centers = Array.tabulate(clusters)(c =>
      Array.tabulate(dims)(i => math.sin(c * dims + i)))
    def vec(id: Int): Array[Double] = {
      var s = id * 9973L + 7L
      Array.tabulate(dims) { i =>
        s = s * 6364136223846793005L + 1442695040888963407L
        val u = (s >>> 11).toDouble / (1L << 53).toDouble // [0, 1)
        centers(id % clusters)(i) + (u - 0.5) * 2.2
      }
    }
    val corpus = (0 until n).map(id => (id.toLong, vec(id).toSeq)).toDF("vec_id", "v")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until dims) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = (0L until 5L).map { q =>
      q -> (0 until n).filter(_ != q)
        .map(id => (id.toLong, cos(vec(q.toInt), vec(id))))
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    }.toMap
    val (assigned, centroids) = graft.operators.IvfKMeans.trainedOn(corpus)
    def recallOf(out: Array[org.apache.spark.sql.Row]): Double =
      out.count(r => truth(r.getLong(0)).contains(r.getLong(1))).toDouble / 15
    val adc = recallOf(graft.operators.Ivfadc.searchOn(corpus, assigned, centroids,
      graft.operators.Ivfadc.residualCodebooks(assigned, centroids)).collect())
    val pq = recallOf(graft.operators.Ivfpq.searchOn(corpus, assigned, centroids,
      graft.operators.Pq.trainCodebooks(corpus)).collect())
    info(s"clustered-corpus recall: ivfadc $adc vs ivfpq $pq")
    assert(adc > pq, s"ivfadc $adc should beat ivfpq $pq on a clustered corpus")
    assert(adc >= 0.3, s"ivfadc clustered-corpus recall $adc (0.33 measured)")
  }

  test("NSW graph search concentrates on clustered (navigable) corpora") {
    // The test that caught the disconnected-graph defect: on well-separated
    // clusters a PURE k-NN graph has no inter-cluster edges, the beam never
    // leaves the entry clusters, and recall was 0.0 — the small-world long
    // links in Nsw.edgesOn exist because of this test. With them the same
    // construction, same dials, recovers 0.87 of true neighbors here
    // (deterministic 8-soft-cluster LCG corpus) vs 0.60 on the near-uniform
    // fixture — the navigability claim in SCALING.md, substantiated.
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dims = 64; val n = 400; val clusters = 8
    val centers = Array.tabulate(clusters)(c =>
      Array.tabulate(dims)(i => math.sin(c * dims + i)))
    def vec(id: Int): Array[Double] = {
      var s = id * 9973L + 7L
      Array.tabulate(dims) { i =>
        s = s * 6364136223846793005L + 1442695040888963407L
        val u = (s >>> 11).toDouble / (1L << 53).toDouble // [0, 1)
        centers(id % clusters)(i) + (u - 0.5) * 2.2
      }
    }
    val corpus = (0 until n).map(id => (id.toLong, vec(id).toSeq)).toDF("vec_id", "v")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until dims) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = (0L until 5L).map { q =>
      q -> (0 until n).filter(_ != q)
        .map(id => (id.toLong, cos(vec(q.toInt), vec(id))))
        .sortBy { case (id, c) => (-c, id) }.take(3).map(_._1).toSet
    }.toMap
    val edges = graft.operators.Nsw.edgesOn(corpus)
    val out = graft.operators.Nsw.searchWithEdges(corpus, edges).collect()
    val hits = out.count(r => truth(r.getLong(0)).contains(r.getLong(1)))
    val recall = hits.toDouble / 15
    assert(recall >= 0.8, s"clustered-corpus NSW recall $recall (uniform fixture: 0.60)")
    // The layer-1 ROUTING graph must survive the same clustering: its node
    // ids live on the SampleMod lattice, so long links generated on raw
    // ids would mostly target nonexistent nodes and be dropped — quietly
    // reverting the routing layer to the disconnected pure-k-NN graph.
    // The idStep parameter exists for this; pin that the sample graph
    // keeps at least one long-range link per LongLinkParams entry.
    val mod = graft.operators.Nsw.SampleMod
    val c1 = corpus.filter(col("vec_id") % mod === 0)
    val knnOnly = graft.operators.Nsw.edgesOn(c1, 4, 1).count()
    val withStep = graft.operators.Nsw.edgesOn(c1, 4, mod).count()
    assert(withStep > knnOnly,
      s"idStep=$mod added no surviving layer-1 long links ($withStep vs $knnOnly)")
  }

  test("HNSW hierarchy: full ranked top-3, self-excluded, layer-1 routing stays on the sample") {
    val out = graft.operators.Nsw.hnswSearch(spark, SparkTestSession.Sf0001).collect()
    assert(out.length === 15) // 5 queries × top-3
    out.foreach(r => assert(r.getLong(1) !== r.getLong(0), "query returned itself"))
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L))
      val cosines = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
    // the routing layer is the deterministic 1-in-SampleMod sample: its
    // edge table must only ever touch sample members
    import org.apache.spark.sql.functions.col
    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val e1 = e.filter(col("vec_id") % graft.operators.Nsw.SampleMod === 0)
    val l1edges = graft.operators.Nsw.edgesOn(e1).collect()
    val mod = graft.operators.Nsw.SampleMod
    assert(l1edges.nonEmpty)
    l1edges.foreach { r =>
      assert(r.getLong(0) % mod === 0L && r.getLong(1) % mod === 0L,
        s"layer-1 edge off the sample: ${r.getLong(0)} -> ${r.getLong(1)}")
    }
  }

  test("NN-descent: rounds improve the k-NN graph over its random init, search clears the floor") {
    import org.apache.spark.sql.functions.col
    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // brute-force truth: each node's true top-Degree cosine neighbors
    val vecs = e.collect().map(r => r.getLong(0) ->
      r.getSeq[Double](1).toArray).toMap
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
    def hitRate(edges: Array[(Long, Long)]): Double = {
      val hits = edges.count { case (s, d) => truth(s).contains(d) }
      hits.toDouble / (truth.size * deg)
    }
    // "a neighbor of my neighbor is probably my neighbor" must actually
    // buy something: the converged graph recovers a large share of the
    // true k-NN edges the affine-formula init graph can only hit by luck
    val init = graft.operators.Nsw.nnDescentKnn(e, 0).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val converged = graft.operators.Nsw.nnDescentKnn(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (h0, hN) = (hitRate(init), hitRate(converged))
    assert(hN > h0 + 0.2, s"NN-descent no better than init: $h0 -> $hN")
    assert(hN >= 0.5, s"converged k-NN graph hit rate $hN")
    // search over the finished graph: full ranked top-3, self-excluded
    val out = graft.operators.Nsw.nndSearch(spark, SparkTestSession.Sf0001).collect()
    assert(out.length === 15) // 5 queries × top-3
    out.foreach(r => assert(r.getLong(1) !== r.getLong(0), "query returned itself"))
    out.groupBy(_.getLong(0)).values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sorted.toSeq === Seq(1L, 2L, 3L))
      val cosines = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
    // recall floor on the fixture (0.53 measured; SCALING.md) — the
    // LSH-free build must land in the graph-method band, not the
    // single-bucket band
    val r = recallByMethod
    assert(r("nsw_nnd") > r("lsh_multiprobe"),
      s"nsw_nnd ${r("nsw_nnd")} vs multiprobe ${r("lsh_multiprobe")}")
    assert(r("nsw_nnd") >= 0.4, s"nsw_nnd recall ${r("nsw_nnd")}")
  }

  test("NSW edge build: pair-grade exchanges carry ids + one scalar, never vectors") {
    // The bucket join may exchange corpus rows WITH their vector (L rows
    // per vector — bounded by the corpus, not the pair count); once rows
    // become (src, dst, ...) pairs, no exchange may carry an array column.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.ArrayType
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // a prior test's persisted edge frame would otherwise replace this
      // plan's exchanges with an InMemoryTableScan
      spark.catalog.clearCache()
      val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val plan = graft.operators.Nsw.edgesOn(e).queryExecution.executedPlan
      val exchanges = plan.collect { case s: ShuffleExchangeExec => s }
      assert(exchanges.nonEmpty)
      val offenders = exchanges.filter { ex =>
        val names = ex.output.map(_.name).toSet
        ex.output.exists(_.dataType.isInstanceOf[ArrayType]) &&
          names.contains("src") && names.contains("dst")
      }
      assert(offenders.isEmpty,
        s"pair-grade exchange carries vectors:\n${offenders.map(_.output.mkString(", ")).mkString("\n")}")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("clustered-corpus harness: the recall ordering flips with corpus geometry") {
    import graft.operators.AnnRecall
    // The oracle-checked form of the per-corpus claim (SCALING.md): on the
    // derived clustered corpus residual encoding beats raw-PQ composition
    // (centers carry the energy, so IVFADC's code budget quantizes the
    // small residual ball finely while IVFPQ wastes it re-encoding
    // centers), and graph search + trained IVF saturate.
    val rows = AnnRecall.annRecallClustered(spark, SparkTestSession.Sf0001).collect()
    val r = rows.groupBy(_.getString(0)).map { case (m, rs) =>
      m -> rs.map(_.getDouble(3)).sum / rs.length
    }
    assert(r.keySet === AnnRecall.clusteredMethodNames.toSet)
    assert(r("ivfadc") > r("ivfpq"),
      s"ivfadc ${r("ivfadc")} should beat ivfpq ${r("ivfpq")} on the clustered corpus")
    assert(r("nsw") >= 0.8, s"nsw clustered recall ${r("nsw")}")
    assert(r("ivf_nprobe") >= 0.8, s"ivf_nprobe clustered recall ${r("ivf_nprobe")}")
    // and the uniform fixture does NOT show the ivfadc advantage — the
    // flip is real, not a harness artifact
    assert(recallByMethod("ivfadc") <= recallByMethod("ivfpq"))
  }

  test("bulk all-corpus search agrees with the per-batch loop on the shared query set") {
    import org.apache.spark.sql.functions.col
    // Same graph, same entries, same expansion and tie-break semantics —
    // only the frontier-state location differs (DataFrame keyed by
    // query_id vs driver map). The first 5 queries must come out
    // identical, and every corpus node must report a full ranked top-3.
    val bulk = graft.operators.Nsw.bulkSearch(spark, SparkTestSession.Sf0001)
    val sharedBulk = bulk.filter(col("query_id") < 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    val batch = graft.operators.Nsw.nswSearch(spark, SparkTestSession.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    assert(sharedBulk === batch)
    val all = bulk.collect()
    val n = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001).count()
    assert(all.length === 3 * n, "every corpus node reports a full top-3")
    all.foreach(r => assert(r.getLong(1) !== r.getLong(0), "query returned itself"))
    // the 2-layer hierarchy's bulk form: same agreement on the shared
    // query set, full coverage of the corpus
    val hb = graft.operators.Nsw.hnswBulkSearch(spark, SparkTestSession.Sf0001)
    val sharedHb = hb.filter(col("query_id") < 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    val hBatch = graft.operators.Nsw.hnswSearch(spark, SparkTestSession.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).sorted
    assert(sharedHb === hBatch)
    assert(hb.count() === 3 * n)
  }

  test("recall harness is single-sourced: union, grid, and oracle all derive from MethodSpecs") {
    import graft.operators.AnnRecall
    // The Spark union and the method × query grid are built from the same
    // MethodSpecs list, so the output's method set must equal it exactly —
    // a frame mislabeled or silently dropped by the grid join shows up here.
    val out = AnnRecall.annRecall(spark, SparkTestSession.Sf0001)
    val methodsInOutput = out.select("method").distinct()
      .collect().map(_.getString(0)).toSet
    assert(methodsInOutput === AnnRecall.methodNames.toSet)
    // The DuckDB oracle's UNION ALL branches and VALUES grid are generated
    // from MethodSpecs too: every method appears exactly once in each.
    val sql = AnnRecall.annRecallSql
    AnnRecall.methodNames.foreach { m =>
      assert(s"'$m' AS method".r.findAllIn(sql).length === 1,
        s"oracle UNION ALL branch for $m")
      assert(s"\\('$m'\\)".r.findAllIn(sql).length === 1,
        s"oracle VALUES grid entry for $m")
    }
  }

  test("approximate results are true subsets of each query's scored space") {
    val out = graft.operators.IvfKMeans.kmeansNprobeSearch(spark, SparkTestSession.Sf0001).collect()
    assert(out.length === 15) // 5 queries × top-3
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.values.foreach { rs =>
      val ranks = rs.map(_.getLong(2)).sorted
      assert(ranks.toSeq === Seq(1L, 2L, 3L))
      val cosines = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (a, b) => a >= b })
    }
  }

  test("multi-table LSH returns full ranked top-3 per query") {
    val out = graft.operators.Similarity.annLshMultitable(spark, SparkTestSession.Sf0001).collect()
    assert(out.length === 15)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length === 15)
  }

  test("no exchange carries per-candidate vector payloads (multiprobe, multitable, pq, ivfpq)") {
    // Structural check of the at-scale shuffle claim: with auto-broadcast
    // off (forcing the neighbor-id join to shuffle) and AQE off (so the
    // final plan tree is inspectable), every ShuffleExchangeExec output
    // that contains an array column must be a corpus-side exchange (one
    // row per vector, no query_id) — a per-candidate exchange (query_id
    // present) must be ids/scalars only. The old plan shape (qv broadcast
    // joined BEFORE the neighbor shuffle) fails this: its neighbor-join
    // exchange output is (query_id, neighbor_id, qv).
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for ((method, needsIdDedup) <- Seq(
          (graft.operators.Similarity.annLshMultiprobe _, true),
          (graft.operators.Similarity.annLshMultitable _, true),
          // PQ paths: codes are ints, the lookup table broadcasts — no
          // exchange anywhere may carry a vector column
          (graft.operators.Pq.pqSearch _, false),
          (graft.operators.Ivfpq.ivfpqSearch _, false))) {
        val plan = method(spark, SparkTestSession.Sf0001).queryExecution.executedPlan
        val exchanges = plan.collect { case s: ShuffleExchangeExec => s }
        assert(exchanges.nonEmpty, "expected at least one shuffle with broadcast off")
        val offenders = exchanges.filter { ex =>
          val attrs = ex.output
          attrs.exists(_.dataType.isInstanceOf[ArrayType]) &&
            attrs.exists(_.name == "query_id")
        }
        assert(offenders.isEmpty,
          s"per-candidate exchange carries vectors:\n${offenders.map(_.output.mkString(", ")).mkString("\n")}")
        if (needsIdDedup)
          // the dedup distinct must exchange the bare id pair
          assert(exchanges.exists(ex =>
            ex.output.map(_.name).toSet == Set("query_id", "neighbor_id")),
            "expected an ids-only dedup exchange")
      }
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("size-derived planes dial: pinned at oracle fixture sizes, grows with log N") {
    import graft.operators.Nsw
    // every oracle-checked fixture (≤ 2000 vectors) must land on the pinned
    // dial — the DuckDB mirrors unroll exactly that many planes
    Seq(0L, 1L, 500L, 2000L).foreach(n =>
      assert(Nsw.sizedPlanes(n) === 4, s"N=$n"))
    // the ×10 replay corpus gets the measured resize (SCALING.md: 20.0× → 4.0×)
    assert(Nsw.sizedPlanes(20000L) === 8)
    // occupancy-constant growth: +1 plane per corpus doubling, monotone
    assert(Nsw.sizedPlanes(40000L) === 9)
    val dials = Seq(2000L, 4000L, 8000L, 16000L, 32000L).map(Nsw.sizedPlanes)
    assert(dials === dials.sorted)
  }

  test("size-derived SEARCH and cell dials: pinned at oracle fixture sizes, grow with log N") {
    import graft.operators.Nsw
    // the serve-time hop budget is the DEFAULT since round 10, so the
    // hash gates depend on it landing exactly on the pinned dials at
    // every oracle fixture size (≤ 2000 vectors; routing layer ≤ 250)
    Seq(0L, 1L, 500L, 2000L).foreach { n =>
      assert(Nsw.sizedHops(n) === 3, s"layer-0 hops at N=$n")
      assert(Nsw.sizedHopsFloor(n / 8, 2) === 2, s"routing hops at N=$n")
    }
    // grown corpora deepen log-style — the ×10 probe's measured recovery
    assert(Nsw.sizedHops(20000L) === 7)
    assert(Nsw.sizedHopsFloor(20000L / 8, 2) === 4)
    val hops = Seq(2000L, 8000L, 32000L, 128000L).map(Nsw.sizedHops)
    assert(hops === hops.sorted)
    // the cell build's per-cell planes dial: pinned at all fixtures for
    // the 8-cell quantizer, +1 per corpus doubling past that
    Seq(500L, 2000L).foreach(n =>
      assert(Nsw.sizedCellPlanes(n, 8) === 4, s"cell planes at N=$n"))
    assert(Nsw.sizedCellPlanes(20000L, 8) === Nsw.sizedPlanes(20000L / 8))
  }
}
