package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.functions.OracleParity.pround

/** Recall harness for the approximate ANN paths — the number a user needs
  * before trusting an approximate search over the exact scan: recall@3 of
  * each method (single-cell IVF, nprobe=2 IVF, single-table LSH, Hamming-1
  * multi-probe LSH, 4-table LSH, PQ/ADC, IVFPQ, NSW graph search) against
  * `ann_brute_force_topk` on the same query set. Fully deterministic (all approximate methods and the
  * ground truth are), so the whole comparison is oracle-checkable in
  * DuckDB, training replay included. Round-3 measurement: ivf_nprobe and
  * lsh_multitable both land at recall@3 = 0.93 on the sf0.01 fixture
  * (scan fractions 0.24 / 0.48 — see SCALING.md).
  *
  * Shape: ground truth and both approximations are per-query top-k
  * DataFrames; recall = |approx ∩ truth| / k via a left join on
  * (query_id, neighbor_id) and a count of hits — no collect, scales with
  * the query batch. The per-group counts are then right-joined onto the
  * full method × query grid so a (method, query) pair with ZERO candidates
  * scores recall 0 instead of silently dropping out — without the grid a
  * sparse method (single-table LSH misses buckets entirely at fixture
  * scale) would have its mean recall biased upward.
  */
object AnnRecall {

  private val K = 3

  /** Everything an approximate method's frame builder may need; one shared
    * k-means training feeds both IVF rows and one shared PQ training feeds
    * both PQ rows (the harness compares search policies, not training
    * runs). PQ codebooks are lazy — trained only if a PQ method is listed. */
  private final case class MethodInputs(
      spark: SparkSession, dir: String,
      e: DataFrame, assigned: DataFrame, centroids: Seq[(Int, Array[Double])]) {
    lazy val pqCodebooks: Seq[Seq[(Int, Array[Double])]] = Pq.trainCodebooks(e)
    lazy val residualCodebooks: Seq[Seq[(Int, Array[Double])]] =
      Ivfadc.residualCodebooks(assigned, centroids)
  }

  /** One approximate ANN method under test: its display name, its Spark
    * candidate frame, and the name of its ranked CTE inside
    * [[annRecallSql]]. SINGLE SOURCE OF TRUTH — the Spark union, the
    * method × query grid, and the oracle's UNION ALL + VALUES clauses are
    * all derived from this list, so a method added here appears in every
    * derived place and a method added anywhere else cannot exist
    * (the desync AnnSpec pins down). */
  private final case class Method(
      name: String,
      frame: MethodInputs => DataFrame,
      rankedCte: String)

  private val MethodSpecs: Seq[Method] = Seq(
    Method("ivf_kmeans", in => IvfKMeans.kmeansSearchOn(in.assigned), "iranked"),
    Method("ivf_nprobe",
      in => IvfKMeans.kmeansNprobeSearchOn(in.e, in.assigned, in.centroids), "npranked"),
    Method("lsh", in => Similarity.annLshBuckets(in.spark, in.dir), "lranked"),
    Method("lsh_multiprobe", in => Similarity.annLshMultiprobe(in.spark, in.dir), "mranked"),
    Method("lsh_multitable", in => Similarity.annLshMultitable(in.spark, in.dir), "mtranked"),
    Method("pq_adc", in => Pq.searchOn(in.e, in.pqCodebooks), "pqranked"),
    Method("ivfpq",
      in => Ivfpq.searchOn(in.e, in.assigned, in.centroids, in.pqCodebooks), "ipranked"),
    Method("ivfadc",
      in => Ivfadc.searchOn(in.e, in.assigned, in.centroids, in.residualCodebooks), "adranked"),
    Method("nsw", in => Nsw.searchOn(in.spark, in.dir), "nswranked"),
    Method("hnsw", in => Nsw.hnswSearchOn(in.spark, in.dir), "hnswranked"),
    Method("nsw_nnd", in => Nsw.nndSearchOn(in.spark, in.dir), "ndranked"))

  private[graft] def methodNames: Seq[String] = MethodSpecs.map(_.name)

  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = Similarity.annBruteForceK(spark, dir, K)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    val (e, assigned, centroids) = IvfKMeans.trained(spark, dir)
    val in = MethodInputs(spark, dir, e, assigned, centroids)
    val approx = MethodSpecs.map { m =>
      m.frame(in).select(lit(m.name).as("method"), col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _)
    val perGroup = approx
      .join(truth, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("method"), col("query_id"))
      .agg(count(col("hit")).as("hits"))
    // full grid: every method must report every query, recall 0 when the
    // method produced no candidates at all for that query
    import spark.implicits._
    val grid = truth.select(col("query_id")).distinct()
      .crossJoin(methodNames.toDF("method"))
    grid.join(perGroup, Seq("method", "query_id"), "left")
      .withColumn("hits", coalesce(col("hits"), lit(0L)))
      .withColumn("recall", pround(col("hits").cast("double") / lit(K.toDouble), 4))
      .orderBy(col("method"), col("query_id"))
  }

  /** DuckDB mirror: brute-force truth, LSH buckets, and the FULL k-means
    * training replay (IvfKMeans.trainingSql) composed as one query. CTE
    * names are prefixed (b/l/i) where they would collide. */
  val annRecallSql: String = {
    val cos = (a: String, b: String) =>
      s"""list_dot_product($a, $b)
         |           / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))""".stripMargin
    s"""WITH ${IvfKMeans.trainingSql},
       |bq AS (SELECT vec_id AS query_id, v AS qe FROM e WHERE vec_id < 5),
       |bscored AS (
       |  SELECT bq.query_id, e.vec_id AS neighbor_id, ${cos("e.v", "bq.qe")} AS cos
       |  FROM e CROSS JOIN bq WHERE e.vec_id <> bq.query_id),
       |branked AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM bscored),
       |truth AS (SELECT query_id, neighbor_id FROM branked WHERE rank <= $K),
       |lb AS (SELECT vec_id, v,
       |         ${VectorFunctions.hyperplaneBucketSql("v", 8)} AS bucket
       |       FROM e),
       |lq AS (SELECT vec_id AS query_id, v AS qv, bucket FROM lb WHERE vec_id < 5),
       |lscored AS (
       |  SELECT lq.query_id, c.vec_id AS neighbor_id, ${cos("c.v", "lq.qv")} AS cos
       |  FROM lb c JOIN lq ON c.bucket = lq.bucket
       |  WHERE c.vec_id <> lq.query_id),
       |lranked AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM lscored),
       |mq AS (SELECT vec_id AS query_id, v AS qv,
       |              unnest([bucket, ${(0 until 8).map(j => s"xor(bucket, ${1 << j})").mkString(", ")}]) AS bucket
       |       FROM lb WHERE vec_id < 5),
       |mcand AS (
       |  SELECT DISTINCT mq.query_id, c.vec_id AS neighbor_id, c.v AS nv, mq.qv
       |  FROM lb c JOIN mq ON c.bucket = mq.bucket
       |  WHERE c.vec_id <> mq.query_id),
       |mscored AS (
       |  SELECT query_id, neighbor_id, ${cos("nv", "qv")} AS cos
       |  FROM mcand),
       |mranked AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM mscored),
       |iq AS (SELECT vec_id AS query_id, v AS qv, cluster FROM afinal WHERE vec_id < 5),
       |iscored AS (
       |  SELECT iq.query_id, a.vec_id AS neighbor_id, ${cos("a.v", "iq.qv")} AS cos
       |  FROM afinal a JOIN iq ON a.cluster = iq.cluster
       |  WHERE a.vec_id <> iq.query_id),
       |iranked AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM iscored),
       |${IvfKMeans.nprobeSql("npq")},
       |npscored AS (
       |  SELECT npq.query_id, a.vec_id AS neighbor_id, ${cos("a.v", "npq.qv")} AS cos
       |  FROM afinal a JOIN npq ON a.cluster = npq.cluster
       |  WHERE a.vec_id <> npq.query_id),
       |npranked AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM npscored),
       |${Pq.recallCtes},
       |${Ivfpq.recallCtes("npq")},
       |${Ivfadc.recallCtes("npq")},
       |${Similarity.multitableBucketsSql("e", "mtb")},
       |${Nsw.searchCtes("mtb")},
       |${Nsw.hnswCtes("mtb", "nwedges")},
       |${Nsw.nndCtes},
       |mtq AS (SELECT vec_id AS query_id, t, bucket FROM mtb WHERE vec_id < 5),
       |mtpairs AS (
       |  SELECT DISTINCT mtq.query_id, c.vec_id AS neighbor_id
       |  FROM mtb c JOIN mtq ON c.t = mtq.t AND c.bucket = mtq.bucket
       |  WHERE c.vec_id <> mtq.query_id),
       |mtscored AS (
       |  SELECT p.query_id, p.neighbor_id, ${cos("n.v", "qe.v")} AS cos
       |  FROM mtpairs p
       |  JOIN e n ON n.vec_id = p.neighbor_id
       |  JOIN e qe ON qe.vec_id = p.query_id),
       |mtranked AS (
       |  SELECT query_id, neighbor_id,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM mtscored),
       |approx AS (
       |${MethodSpecs.map(m =>
            s"  SELECT '${m.name}' AS method, query_id, neighbor_id FROM ${m.rankedCte} WHERE rank <= $K")
          .mkString("\n  UNION ALL\n")}),
       |hits AS (
       |  SELECT a.method, a.query_id, count(t.neighbor_id) AS hits
       |  FROM approx a
       |  LEFT JOIN truth t ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
       |  GROUP BY a.method, a.query_id),
       |grid AS (
       |  SELECT m.method, q.query_id
       |  FROM (SELECT DISTINCT query_id FROM truth) q
       |  CROSS JOIN (VALUES ${MethodSpecs.map(m => s"('${m.name}')").mkString(", ")}) m(method))
       |SELECT g.method AS method, g.query_id AS query_id,
       |       coalesce(h.hits, 0) AS hits,
       |       floor(coalesce(h.hits, 0)::DOUBLE / ${K}.0 * 10000 + 0.5) / 10000.0 AS recall
       |FROM grid g
       |LEFT JOIN hits h ON g.method = h.method AND g.query_id = h.query_id
       |ORDER BY method, query_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall" -> annRecall
  )

  val oracles: Map[String, String] = Map(
    "ann_recall" -> annRecallSql
  )
}
