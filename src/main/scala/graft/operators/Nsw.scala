package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.functions.VectorFunctions.{asDouble, cosineSimilarity}
import graft.functions.OracleParity.pround
import graft.tools.CacheRegistry

/** NSW-style graph ANN (the navigable-small-world construction of Malkov
  * et al., Information Systems 2014 — the single-layer ancestor of HNSW):
  * a k-NN GRAPH over the corpus, searched by greedy BEAM expansion from
  * fixed entry points. The two phases separate exactly the way a 100 TB
  * deployment wants them to:
  *
  *   - '''Build''' (once, corpus-wide): candidate edges come from the
  *     multi-table LSH family already used by `ann_lsh_multitable`
  *     ([[Similarity.TableMults]] — integer-arithmetic planes, so both
  *     engines build bit-identical tables); each node keeps its top-[[Degree]]
  *     candidates by exact cosine, and edges are symmetrized (an NSW graph
  *     is undirected: the reverse links are what make greedy search able to
  *     route back toward a hub). Candidate generation is a bounded equi-join
  *     on (table, bucket) — never all-pairs — and the expensive exchanges
  *     carry at most `L` copies of each corpus vector (the bucket join),
  *     never a per-pair payload: pair-grade traffic is ids + one scalar.
  *     The edge table is O(N·[[Degree]]) 16-byte rows — the persisted,
  *     reusable index.
  *
  *   - '''Search''' (per query batch): score the [[Entries]] fixed entry
  *     nodes, then [[Hops]] rounds of: take the top-[[Beam]] scored nodes
  *     per query, expand their graph neighbors (frontier ids broadcast
  *     against the distributed edge table), score only the NEW nodes
  *     (fresh ids broadcast against the corpus, query vectors broadcast
  *     last), accumulate. The beam state itself is driver-held — see
  *     [[searchWithEdges]] for why that boundary is the right one.
  *
  * Every tie breaks on (cos DESC, node_id) and the driver merges exactly
  * the doubles the distributed scoring produced, so the whole search
  * replays bit-for-bit in DuckDB ([[searchCtes]]) — entry scoring, beam
  * cuts, visited-set anti-joins and all. Recall lands in `ann_recall`
  * beside the other approximate paths; measured numbers in SCALING.md.
  *
  * Not a reference operator (the reference's search is the brute-force scan
  * of search.ts) — part of the beyond-reference ANN mandate.
  */
object Nsw {

  private[operators] val Degree = 6
  private[operators] val Beam = 8
  private[operators] val Hops = 3
  private[operators] val Entries = 4
  private val K = 3

  private def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  /** Deterministic long-range links per node (formula, no data): on a
    * strongly clustered corpus every node's nearest neighbors are
    * same-cluster, so a PURE k-NN graph is disconnected and the beam can
    * never leave the entry clusters (AnnSpec's clustered-corpus test
    * demonstrates this: recall 0.0 without these links). NSW gets its long
    * links from insertion order; the declarative equivalent is Kleinberg's
    * small-world augmentation — [[LongLinkParams]].length pseudo-random
    * links `src → (src·mult + off) mod N`, identical integer arithmetic in
    * both engines. Links whose target id doesn't exist simply don't join —
    * dense ids are not assumed. */
  private[operators] val LongLinkParams: Seq[(Long, Long)] = Seq((48271L, 11L), (69621L, 29L))

  /** The symmetrized k-NN edge table: multitable-LSH candidate pairs,
    * top-[[Degree]] per source by exact cosine, plus every reverse edge,
    * plus the [[LongLinkParams]] small-world links (also symmetrized).
    * Self-contained per call; persisted by the caller (it feeds one join
    * per search hop). */
  private[graft] def edgesOn(e: DataFrame): DataFrame =
    edgesOn(e, Similarity.TablePlanes)

  /** Planes-per-table is THE scale dial for the graph build, exactly as in
    * [[Dedup.dedupEmbeddingCosinePlanes]]: with planes fixed, bucket
    * occupancy — and with it candidate pairs — grows linearly in corpus
    * size, making the build O(N²·L/2^planes). Production sizing is
    * planes ≈ log2(N·L / target_candidates_per_node); the SfScale ×10 run
    * measures both the fixture-pinned dial and this resized one
    * (SCALING.md). The oracle-checked query pins planes=[[Similarity.TablePlanes]]. */
  private[graft] def edgesOn(e: DataFrame, planes: Int): DataFrame = {
    // all 4 tables' buckets in one codegen kernel pass per vector
    val tb = graft.functions.VectorFunctions.hyperplaneBucketsT(
      col("v"), Similarity.TableMults, planes)
    val b = e.select(col("vec_id"), col("v"), posexplode(tb).as(Seq("t", "bucket")))
    // score DURING the bucket join (vectors ride the corpus-side exchange,
    // L rows per vector), then immediately drop to (src, dst, cos) — every
    // downstream shuffle carries ids + one scalar only
    val scored = b.as("a")
      .join(b.as("c"),
        col("a.t") === col("c.t") && col("a.bucket") === col("c.bucket") &&
          col("a.vec_id") =!= col("c.vec_id"))
      .select(col("a.vec_id").as("src"), col("c.vec_id").as("dst"),
        cosineSimilarity(col("a.v"), col("c.v")).as("cos"))
    // The same pair co-buckets in up to L tables, so candidates carry
    // duplicates. A corpus-wide pre-window DISTINCT was the measured
    // hotspot (a full hash-dedup of the pair set); instead rank first and
    // dedup the survivors: duplicates of a pair share (cos, dst) and so
    // occupy ADJACENT ranks, meaning the top Degree·L rows always contain
    // the top Degree distinct dsts — the tiny post-cut dedup + re-rank is
    // provably equivalent to the oracle's distinct-then-rank.
    val w = Window.partitionBy(col("src")).orderBy(desc("cos"), col("dst"))
    val knn = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Degree * Similarity.TableMults.length)
      .select(col("src"), col("dst"), col("cos"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= Degree)
      .select(col("src"), col("dst"))
    // n is a driver scalar like the k-means K — the long-link modulus
    val n = e.count()
    val long = LongLinkParams.map { case (mult, off) =>
      e.select(col("vec_id").as("src"),
        ((col("vec_id") * mult + off) % n).as("dst"))
    }.reduce(_ unionByName _)
      .filter(col("src") =!= col("dst"))
      // only keep links whose target exists (ids need not be dense)
      .join(e.select(col("vec_id").as("dst")), Seq("dst"), "left_semi")
      .select(col("src"), col("dst"))
    val directed = knn.unionByName(long)
    directed
      .unionByName(directed.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  /** Fixed-hop beam search over the graph — see the object scaladoc. The
    * edge table is the reusable index: one [[CacheRegistry.sharedTracked]]
    * build (keyed by data dir) serves the standalone query AND the recall
    * harness — the at-scale form is a materialized edge table every search
    * batch reads, exactly like the dedup family's shared token corpus. */
  private[operators] def searchOn(spark: SparkSession, dir: String): DataFrame = {
    val e = vectors(spark, dir)
    searchWithEdges(e, CacheRegistry.sharedTracked(s"nsw-edges:$dir")(edgesOn(e)))
  }

  /** The beam state (visited scores + frontier) lives on the DRIVER: it is
    * Q · (Entries + Hops·Beam·degree) rows — bounded by the search dials,
    * INDEPENDENT of corpus size — the same legitimate driver boundary as
    * the k-means centroids ([[IvfKMeans]]), and the shape every production
    * graph-ANN search loop has. What stays distributed is everything
    * corpus-sized: the edge table (frontier ids broadcast against it to
    * expand — one job per hop) and the candidate scoring (fresh ids
    * broadcast against the corpus, query vectors broadcast last — one job
    * per hop, no exchange ever carries a per-candidate vector). A first
    * fully-DataFrame formulation (per-hop windows + anti-joins on persisted
    * ~500-row frames) was measured at 6.7 s for the hops alone at sf0.1 —
    * all near-empty-stage scheduling overhead; the driver loop runs the
    * same deterministic expansion in ~2 small jobs per hop. At 100 TB,
    * bucket the corpus by vec_id so each hop's candidate fetch prunes
    * instead of scanning.
    */
  private[graft] def searchWithEdges(e: DataFrame, edges: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    // one tiny job: the data-derived query and entry id sets (both < 5)
    val qIds = q.select(col("query_id")).as[Long].collect().sorted.toSeq
    val entryIds = qIds.filter(_ < Entries)
    // (query, node) → cos, exact doubles as computed distributed
    def score(ids: Seq[(Long, Long)]): Seq[((Long, Long), Double)] = {
      val idsDf = ids.toDF("query_id", "node_id")
      e.select(col("vec_id").as("node_id"), col("v").as("nv"))
        .join(broadcast(idsDf), Seq("node_id"))
        .join(broadcast(q), Seq("query_id"))
        .select(col("query_id"), col("node_id"),
          cosineSimilarity(col("nv"), col("qv")).as("cos"))
        .as[(Long, Long, Double)].collect()
        .map { case (qid, nid, cos) => ((qid, nid), cos) }.toSeq
    }
    val ids0 = for (qid <- qIds; ent <- entryIds if ent != qid) yield (qid, ent)
    val visited = scala.collection.mutable.Map.from(score(ids0))
    def topByQuery(k: Int): Seq[(Long, Long, Double)] = visited.toSeq
      .map { case ((qid, nid), cos) => (qid, nid, cos) }
      .groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        rs.sortBy { case (_, nid, cos) => (-cos, nid) }.take(k)
      }
    for (_ <- 1 to Hops) {
      val frontier = topByQuery(Beam).map { case (qid, nid, _) => (qid, nid) }
      // one job: frontier ids broadcast against the distributed edge table
      val expanded = edges
        .join(broadcast(frontier.toDF("query_id", "node_id")),
          col("node_id") === col("src"))
        .select(col("query_id"), col("dst"))
        .as[(Long, Long)].collect()
      val fresh = expanded.distinct
        .filter { case (qid, nid) => qid != nid && !visited.contains((qid, nid)) }
      if (fresh.nonEmpty) visited ++= score(fresh.toSeq)
    }
    val ranked = topByQuery(K).groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      rs.zipWithIndex.map { case ((qid, nid, cos), i) => (qid, nid, (i + 1).toLong, cos) }
    }
    ranked.toDF("query_id", "node_id", "rank", "cos")
      .select(col("query_id"), col("node_id").as("neighbor_id"),
        col("rank"), pround(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  def nswSearch(spark: SparkSession, dir: String): DataFrame =
    searchOn(spark, dir)

  /** Production-dial variant for scale measurement: identical search over
    * a graph whose candidate buckets use `planes` planes per table. */
  def nswSearchPlanes(spark: SparkSession, dir: String, planes: Int): DataFrame = {
    val e = vectors(spark, dir)
    searchWithEdges(e,
      CacheRegistry.sharedTracked(s"nsw-edges:$dir:p$planes")(edgesOn(e, planes)))
  }

  // ------------------------------------------------------------- oracle SQL

  /** CTE block (no WITH): graph build + unrolled beam search → `nswranked`.
    * Assumes `e(vec_id, v)` and a per-table bucket relation
    * `bRel(vec_id, t, bucket)` ([[Similarity.multitableBucketsSql]]) are in
    * scope — the recall harness shares its `mtb` buckets. All names
    * nw-prefixed. */
  private[operators] def searchCtes(bRel: String): String = {
    val cos = (a: String, b: String) =>
      s"""list_dot_product($a, $b)
         |           / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))""".stripMargin
    def scoreSql(idsRel: String, out: String): String =
      s"""$out AS (
         |  SELECT i.query_id, i.node_id, ${cos("n.v", "qv.v")} AS cos
         |  FROM $idsRel i
         |  JOIN e n ON n.vec_id = i.node_id
         |  JOIN e qv ON qv.vec_id = i.query_id)""".stripMargin
    val hops = (1 to Hops).map { h =>
      s"""nwf$h AS (
         |  SELECT query_id, node_id FROM (
         |    SELECT query_id, node_id,
         |           row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, node_id) AS rn
         |    FROM nws${h - 1})
         |  WHERE rn <= $Beam),
         |nwx$h AS (
         |  SELECT DISTINCT f.query_id, ed.dst AS node_id
         |  FROM nwf$h f JOIN nwedges ed ON f.node_id = ed.src
         |  WHERE ed.dst <> f.query_id),
         |nwn$h AS (
         |  SELECT x.query_id, x.node_id
         |  FROM nwx$h x LEFT JOIN nws${h - 1} s
         |    ON s.query_id = x.query_id AND s.node_id = x.node_id
         |  WHERE s.node_id IS NULL),
         |${scoreSql(s"nwn$h", s"nwh$h")},
         |nws$h AS (
         |  SELECT query_id, node_id, cos FROM nws${h - 1}
         |  UNION ALL
         |  SELECT query_id, node_id, cos FROM nwh$h)""".stripMargin
    }.mkString(",\n")
    s"""nwpairs AS (
       |  SELECT DISTINCT a.vec_id AS src, c.vec_id AS dst
       |  FROM $bRel a JOIN $bRel c ON a.t = c.t AND a.bucket = c.bucket
       |  WHERE a.vec_id <> c.vec_id),
       |nwgs AS (
       |  SELECT p.src, p.dst, ${cos("s.v", "d.v")} AS cos
       |  FROM nwpairs p
       |  JOIN e s ON s.vec_id = p.src
       |  JOIN e d ON d.vec_id = p.dst),
       |nwknn AS (
       |  SELECT src, dst FROM (
       |    SELECT src, dst,
       |           row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rn
       |    FROM nwgs)
       |  WHERE rn <= $Degree),
       |nwlong AS (
       |  SELECT src, dst FROM (
       |${LongLinkParams.map { case (mult, off) =>
           s"    SELECT vec_id AS src, (vec_id * $mult + $off) % (SELECT count(*) FROM e) AS dst FROM e"
         }.mkString("\n    UNION ALL\n")})
       |  WHERE src <> dst AND dst IN (SELECT vec_id FROM e)),
       |nwdirected AS (
       |  SELECT src, dst FROM nwknn
       |  UNION ALL
       |  SELECT src, dst FROM nwlong),
       |nwedges AS (
       |  SELECT src, dst FROM nwdirected
       |  UNION
       |  SELECT dst AS src, src AS dst FROM nwdirected),
       |nwq AS (SELECT vec_id AS query_id FROM e WHERE vec_id < 5),
       |nwids0 AS (
       |  SELECT q.query_id, ent.vec_id AS node_id
       |  FROM nwq q CROSS JOIN (SELECT vec_id FROM e WHERE vec_id < $Entries) ent
       |  WHERE ent.vec_id <> q.query_id),
       |${scoreSql("nwids0", "nws0")},
       |$hops,
       |nswranked AS (
       |  SELECT query_id, node_id AS neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, node_id) AS rank
       |  FROM nws$Hops)""".stripMargin
  }

  val nswSearchSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |${Similarity.multitableBucketsSql("e", "nwb")},
       |${searchCtes("nwb")}
       |SELECT query_id, neighbor_id, rank, floor(cos * 10000 + 0.5) / 10000.0 AS cosine
       |FROM nswranked WHERE rank <= $K
       |ORDER BY query_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_nsw_search" -> nswSearch
  )

  val oracles: Map[String, String] = Map(
    "ann_nsw_search" -> nswSearchSql
  )
}
