package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.OracleParity.pround
import graft.io.Tables
import graft.tools.CacheRegistry

/** Iterative graph analytics over relationship graphs derived from the
  * relational tables — the missing sibling of the connected-components
  * family ([[Components]]): CC answers "which rows are the same thing",
  * PageRank answers "which nodes matter". A training-data pipeline uses
  * exactly this shape for DOMAIN REPUTATION — Common-Crawl-scale curation
  * ranks hosts by the link graph (the original use [Page et al. 1999]) and
  * feeds the rank into the quality prior alongside the CCNet LM buckets
  * ([[Filtering.lmPerplexity]]).
  *
  * The graph here is the customer↔supplier co-purchase graph (an edge per
  * distinct (o_custkey, l_suppkey) pair observed in lineitem⋈orders, both
  * directions), standing in for the host-link graph the fixture lacks.
  *
  * Scale shape — the canonical iterative-shuffle pattern:
  *   - the edge and degree tables are built ONCE and cached (at 100 TB:
  *     materialized and bucketed by `src`, so every iteration's
  *     contribution join is co-located and shuffle-free);
  *   - each iteration is one join (rank × edges) + one groupBy(dst) — a
  *     single shuffle of (dst, 13-byte decimal) pairs, map-side combined;
  *     nothing is ever collected to the driver;
  *   - the rank frame is EAGERLY CHECKPOINTED every round
  *     ([[CacheRegistry.checkpointTracked]], the NN-descent discipline):
  *     leaving it lazy nests each round's whole subtree inside the next
  *     round's join build side, which the planner re-plans and partially
  *     re-executes per level — measured 12–32 s with wild variance at
  *     sf0.1 versus a stable ~3 s checkpointed. The rank table is
  *     O(nodes), far smaller than edges, so materializing it per round
  *     is exactly what a 100 TB run would do too.
  *
  * Float parity with the DuckDB oracle (OracleParity rules): every
  * contribution is 9dp-pround'ed then summed as DECIMAL(30,9) — exact,
  * order-independent — and each iteration's rank is re-rounded to 9dp, so
  * both engines carry bit-identical doubles through all five iterations by
  * induction (a raw double sum would be partition-order-dependent).
  */
object Graph {

  private val Damping = 0.85
  private val Teleport = 0.15
  private val Iters = 5
  private val TopK = 20

  /** graph_pagerank — 5-iteration damped PageRank on the co-purchase
    * graph; top [[TopK]] nodes by rank. Every node in the undirected graph
    * has degree ≥ 1, so no dangling-mass term is needed (a directed link
    * graph would add the standard redistribute-dangling-mass broadcast
    * scalar per iteration). */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    // node ids stay 8-byte LONGS through every shuffle (customer 2k,
    // supplier 2k+1 — disjoint by parity); the display strings are built
    // only on the 20 output rows. Shuffling concatenated string keys
    // through distinct + repartition + 5 iteration joins costs real
    // serialization and hashing at 100 TB for no semantic gain.
    val pairs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
    // adjacency HASH-PARTITIONED by src and cached: deg (a groupBy on the
    // same key) and every iteration's rank join then line up with zero
    // exchange on the edge side — the local analogue of bucketing the
    // materialized adjacency, which is how the 100 TB run keeps the big
    // table stationary across all five rounds
    val edges = CacheRegistry.persistTracked(
      pairs.select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .union(pairs.select((col("sk") * 2 + 1).as("src"), (col("ck") * 2).as("dst")))
        .repartition(col("src")))
    val deg = CacheRegistry.persistTracked(
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg")))
    // node count: a single scalar (the documented driver boundary — one
    // count() job), folded into the per-iteration teleport constant; a
    // broadcast-scalar crossJoin here would re-run the count aggregate
    // inside every iteration's plan (6 extra jobs, measured)
    val n = deg.count()
    // edges ⋈ deg is ITERATION-INVARIANT (deg is a function of edges) —
    // round 18 (guide §1.2: don't recompute what a loop never changes):
    // joining it inside the loop rebuilt the same hash join 5×. Hoisted
    // and cached once; both inputs are already hash-partitioned by src,
    // so the join is exchange-free and the cached frame keeps src
    // partitioning for every iteration's rank join.
    val edgeDeg = CacheRegistry.persistTracked(edges.join(deg, Seq("src")))
    var pr = CacheRegistry.checkpointTracked(
      deg.select(col("src").as("node"), pround(lit(1.0 / n), 9).as("pr")))
    for (_ <- 1 to Iters) {
      val mass = edgeDeg
        // shuffle-hash: the O(nodes) rank frame is the only moving side;
        // a sort-merge join would re-sort the stationary adjacency every
        // round, a broadcast would not survive a 100M-node rank table
        .join(pr.hint("shuffle_hash"), col("src") === col("node"))
        .select(col("dst"),
          pround(col("pr") / col("deg"), 9).cast("decimal(30,9)").as("w"))
        .groupBy(col("dst"))
        .agg(sum(col("w")).as("m"))
      pr = CacheRegistry.checkpointTracked(
        mass.select(col("dst").as("node"),
          pround(lit(Teleport / n) +
            lit(Damping) * col("m").cast("double"), 9).as("pr")))
    }
    pr.join(deg, col("node") === col("src"))
      .select(
        when(col("node") % 2 === 0, concat(lit("c"), (col("node") / 2).cast("long")))
          .otherwise(concat(lit("s"), ((col("node") - 1) / 2).cast("long")))
          .as("node"),
        col("deg"), col("pr"))
      .orderBy(col("pr").desc, col("node"))
      .limit(TopK)
  }

  /** The oracle unrolls the five iterations as a CTE chain — each round is
    * the same join + decimal-sum groupBy the Spark plan runs. */
  val pagerankSql: String = {
    def iter(i: Int): String = {
      val prev = if (i == 1) "p0" else s"p${i - 1}"
      s"""i$i AS (
         |  SELECT e.dst,
         |         sum(CAST(floor(p.pr / d.deg * 1000000000 + 0.5)
         |               / 1000000000.0 AS DECIMAL(30,9))) AS m
         |  FROM ed e JOIN deg d ON e.src = d.src
         |            JOIN $prev p ON e.src = p.node
         |  GROUP BY e.dst),
         |p$i AS (
         |  SELECT dst AS node,
         |         floor(($Teleport::DOUBLE / n + $Damping::DOUBLE * m::DOUBLE)
         |               * 1000000000 + 0.5) / 1000000000.0 AS pr
         |  FROM i$i, nn)""".stripMargin
    }
    s"""WITH pairs AS (
       |  SELECT DISTINCT 'c' || o_custkey::VARCHAR AS c,
       |                  's' || l_suppkey::VARCHAR AS s
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |ed AS (
       |  SELECT c AS src, s AS dst FROM pairs
       |  UNION ALL
       |  SELECT s AS src, c AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
       |nn AS (SELECT count(*) AS n FROM deg),
       |p0 AS (
       |  SELECT src AS node,
       |         floor(1.0::DOUBLE / n * 1000000000 + 0.5) / 1000000000.0 AS pr
       |  FROM deg, nn),
       |${(1 to Iters).map(iter).mkString(",\n")}
       |SELECT p.node, d.deg, p.pr
       |FROM p$Iters p JOIN deg d ON p.node = d.src
       |ORDER BY p.pr DESC, p.node LIMIT $TopK""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> pagerank
  )

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> pagerankSql
  )
}
