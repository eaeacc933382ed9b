package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVFPQ — the classic composition (Jégou et al., TPAMI 2011 §IV): the
  * trained-k-means IVF restricts WHICH vectors are scored (each query
  * probes its NProbe nearest cells) and product quantization replaces HOW
  * they are scored (4 table lookups against one-byte codes instead of a
  * 64-float cosine). At 100 TB this is the shape that matters: the scan
  * touches nprobe/K of the corpus AND reads 4 bytes per candidate —
  * the two dials (probe count, code budget) compose multiplicatively.
  *
  * Everything reuses the already-replayable pieces — IVF training
  * ([[IvfKMeans.trainingSql]]), PQ codebooks + lookup table
  * ([[Pq.recallCtes]]) and probe selection ([[IvfKMeans.nprobeSql]]) — so
  * the composition is hash-checked end to end like its parents, and its
  * recall lands in `ann_recall` beside them.
  */
object Ivfpq {

  def ivfpqSearch(spark: SparkSession, dir: String): DataFrame = {
    val (e, assigned, centroids) = IvfKMeans.trained(spark, dir)
    searchOn(e, assigned, centroids,
      graft.tools.CacheRegistry.sharedObject(s"pq-codebooks:$dir")(
        graft.tools.IndexStore.readOrBuildCodebooks(spark, dir, "pq-codebooks")(
          Pq.trainCodebooksSized(e))))
  }

  private[graft] def searchOn(
      e: DataFrame, assigned: DataFrame, centroids: Seq[(Int, Array[Double])],
      cbs: Seq[Seq[(Int, Array[Double])]]): DataFrame = {
    // one map-side pass: cluster is already on `assigned`; add the M codes
    val enc = Pq.withCodes(assigned, cbs).drop("v")
    val probes = IvfKMeans.nprobeCells(e, centroids).select(col("query_id"), col("cluster"))
    val candCodes = Pq.explodeCodes(
      enc.join(broadcast(probes), Seq("cluster"))
        .filter(col("vec_id") =!= col("query_id")),
      Seq("query_id", "vec_id"), cbs.length)
    val terms = candCodes
      .join(broadcast(Pq.qlutFor(e, cbs)), Seq("query_id", "m", "code"))
    Pq.adcRank(terms, cbs.length)
  }

  /** CTE block (no WITH): candidates from the probed cells, scored by the
    * PQ lookup table → `ipranked`. Assumes [[IvfKMeans.trainingSql]]
    * (`afinal`), [[Pq.recallCtes]] (`pqcodes`, `pqqlut`) and a probe
    * relation `probeRel(query_id, cluster)` are in scope. */
  private[operators] def recallCtes(probeRel: String): String = {
    val qd = (0 until 4).map(m => s"max(CASE WHEN ql.m = $m THEN qdot END) AS qd_$m")
      .mkString(",\n         ")
    val cn = (0 until 4).map(m => s"max(CASE WHEN ql.m = $m THEN cnorm2 END) AS cn_$m")
      .mkString(",\n         ")
    s"""ipcand AS (
       |  SELECT a.vec_id, p.query_id, pc.m, pc.code
       |  FROM afinal a
       |  JOIN $probeRel p ON a.cluster = p.cluster
       |  JOIN pqcodes pc ON pc.vec_id = a.vec_id
       |  WHERE a.vec_id <> p.query_id),
       |ipg AS (
       |  SELECT ql.query_id, c.vec_id AS neighbor_id, ql.qnorm,
       |         $qd,
       |         $cn
       |  FROM ipcand c
       |  JOIN pqqlut ql ON c.query_id = ql.query_id AND c.m = ql.m AND c.code = ql.code
       |  GROUP BY ql.query_id, c.vec_id, ql.qnorm),
       |ipscored AS (
       |  SELECT query_id, neighbor_id,
       |         (qd_0 + qd_1 + qd_2 + qd_3) / (qnorm * sqrt(cn_0 + cn_1 + cn_2 + cn_3)) AS cos
       |  FROM ipg),
       |ipranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM ipscored)""".stripMargin
  }

  val ivfpqSearchSql: String =
    s"""WITH ${IvfKMeans.trainingSql},
       |${Pq.recallCtes},
       |${IvfKMeans.nprobeSql("ivq")},
       |${recallCtes("ivq")}
       |SELECT query_id, neighbor_id, rank,
       |       floor(cos * 10000 + 0.5) / 10000.0 AS approx_cosine
       |FROM ipranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivfpq" -> ivfpqSearch
  )

  val oracles: Map[String, String] = Map(
    "ann_ivfpq" -> ivfpqSearchSql
  )
}
