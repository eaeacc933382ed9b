package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.functions.OracleParity.pround

/** Recall harness for the approximate ANN paths — the number a user needs
  * before trusting `ann_lsh_buckets` or `ann_ivf_kmeans_search` over the
  * exact scan: recall@3 of each method against `ann_brute_force_topk` on
  * the same query set. Fully deterministic (both approximate methods and
  * the ground truth are), so the whole comparison is oracle-checkable in
  * DuckDB, training replay included.
  *
  * Shape: ground truth and both approximations are per-query top-k
  * DataFrames; recall = |approx ∩ truth| / k via a left join on
  * (query_id, neighbor_id) and a count of hits — no collect, scales with
  * the query batch.
  */
object AnnRecall {

  private val K = 3

  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val truth = Similarity.annBruteForceK(spark, dir, K)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    val approx =
      IvfKMeans.kmeansSearch(spark, dir)
        .select(lit("ivf_kmeans").as("method"), col("query_id"), col("neighbor_id"))
        .unionByName(
          Similarity.annLshBuckets(spark, dir)
            .select(lit("lsh").as("method"), col("query_id"), col("neighbor_id")))
        .unionByName(
          Similarity.annLshMultiprobe(spark, dir)
            .select(lit("lsh_multiprobe").as("method"), col("query_id"), col("neighbor_id")))
    approx
      .join(truth, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("method"), col("query_id"))
      .agg(count(col("hit")).as("hits"))
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
       |approx AS (
       |  SELECT 'ivf_kmeans' AS method, query_id, neighbor_id FROM iranked WHERE rank <= $K
       |  UNION ALL
       |  SELECT 'lsh' AS method, query_id, neighbor_id FROM lranked WHERE rank <= $K
       |  UNION ALL
       |  SELECT 'lsh_multiprobe' AS method, query_id, neighbor_id FROM mranked WHERE rank <= $K)
       |SELECT a.method AS method, a.query_id AS query_id,
       |       count(t.neighbor_id) AS hits,
       |       floor(count(t.neighbor_id)::DOUBLE / ${K}.0 * 10000 + 0.5) / 10000.0 AS recall
       |FROM approx a
       |LEFT JOIN truth t ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
       |GROUP BY a.method, a.query_id
       |ORDER BY method, query_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_recall" -> annRecall
  )

  val oracles: Map[String, String] = Map(
    "ann_recall" -> annRecallSql
  )
}
