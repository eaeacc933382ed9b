package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{CentroidResidual, VectorFunctions}
import graft.functions.OracleParity.pround

/** IVFADC proper (Jégou, Douze, Schmid, "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011 §IV.A): where [[Ivfpq]] PQ-encodes the raw
  * vectors, IVFADC encodes the RESIDUAL `r = v − c[cluster]` — the part of
  * the vector the coarse quantizer can't explain. Residuals have a fraction
  * of the raw vectors' variance, so the same 4-byte code budget spends its
  * 16 codewords per subspace on a much tighter ball, and the approximate
  * cosine decomposes exactly:
  *
  *   q·v̂  = q·c + Σ_m q_m·r_m[code_m]                    (numerator)
  *   ‖v̂‖² = ‖c‖² + 2·Σ_m c_m·r_m[code_m] + Σ_m ‖r_m[code_m]‖²
  *
  * Every non-lookup term is precomputable into three tiny broadcast
  * tables: the per-(query, m, code) lookup table ([[Pq.qlutFor]], M·K rows
  * per query, shared machinery with plain PQ), a per-(query, cell) q·c +
  * ‖c‖² table (NProbe rows per query), and a per-(cell, m, code) cross
  * table (K_cells·M·K rows, computed driver-side from the two trained
  * codebooks — 512 doubles here). Per candidate the scan still reads
  * exactly 4 one-byte codes; the extra correction terms join on (cluster)
  * and (cluster, m, code), both broadcast.
  *
  * Scale shape: identical to [[Ivfpq]] — probe selection is a pure map,
  * candidates come from a broadcast equi-join on `cluster` (nprobe/K of
  * the corpus), no vectors ride in any exchange, and the only shuffle is
  * the per-(query, candidate) pivot aggregation. The residual encode is
  * one extra codegen'd map pass ([[graft.functions.CentroidResidual]]).
  *
  * Determinism: the coarse training is [[IvfKMeans]]'s replayable Lloyd,
  * the residual subtraction is exact IEEE arithmetic (order-free), the PQ
  * training over residuals reuses [[Pq.trainCodebooks]]'s DECIMAL-mean
  * replay, and the score adds its terms in the same association in both
  * engines — `(qc + (qd_0+..+qd_3))` over
  * `qnorm·sqrt(cnorm2c + 2·(cr_0+..+cr_3) + (rn_0+..+rn_3))` — so
  * `ann_ivfadc` is fully hash-checked against DuckDB, training included.
  */
object Ivfadc {

  private val M = Pq.M
  private val SubDim = Pq.SubDim

  /** Left-to-right fold — the same IEEE sequence as list_dot_product. */
  private def dotLR(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** (vec_id, v = v − c[cluster], cluster) — one codegen'd map pass. */
  private[operators] def residuals(
      assigned: DataFrame, centroids: Seq[(Int, Array[Double])]): DataFrame =
    assigned.select(col("vec_id"),
      CentroidResidual.column(col("v"), col("cluster"), centroids).as("v"),
      col("cluster"))

  /** PQ codebooks trained on the residual table — [[Pq.trainCodebooks]]'s
    * deterministic replay, fed residuals instead of raw vectors. */
  private[graft] def residualCodebooks(
      assigned: DataFrame, centroids: Seq[(Int, Array[Double])])
      : Seq[Seq[(Int, Array[Double])]] =
    Pq.trainCodebooks(residuals(assigned, centroids).select(col("vec_id"), col("v")))

  /** [[residualCodebooks]] at the size-derived code budget
    * ([[Pq.sizedDials]]) — the STORED default, pinned at oracle fixtures. */
  private[graft] def residualCodebooksSized(
      assigned: DataFrame, centroids: Seq[(Int, Array[Double])])
      : Seq[Seq[(Int, Array[Double])]] =
    Pq.trainCodebooksSized(residuals(assigned, centroids).select(col("vec_id"), col("v")))

  def ivfadcSearch(spark: SparkSession, dir: String): DataFrame = {
    val (e, assigned, centroids) = IvfKMeans.trained(spark, dir)
    searchOn(e, assigned, centroids,
      graft.tools.CacheRegistry.sharedObject(s"ivfadc-codebooks:$dir")(
        graft.tools.IndexStore.readOrBuildCodebooks(spark, dir, "ivfadc-codebooks")(
          residualCodebooksSized(assigned, centroids))))
  }

  private[graft] def searchOn(
      e: DataFrame, assigned: DataFrame, centroids: Seq[(Int, Array[Double])],
      rcbs: Seq[Seq[(Int, Array[Double])]]): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cents = centroids.sortBy(_._1)
    // residual-encode the corpus: cluster + M one-byte codes per vector
    val enc = Pq.withCodes(residuals(assigned, centroids), rcbs).drop("v")
    // per (query, probed cell): q·c and ‖c‖² — NProbe rows per query
    val centDf = cents.map { case (cid, a) => (cid, a.toSeq) }.toDF("cluster", "cvec")
    val probeTerms = IvfKMeans.nprobeCells(e, centroids)
      .join(broadcast(centDf), Seq("cluster"))
      .select(col("query_id"), col("cluster"),
        VectorFunctions.dot(col("qv"), col("cvec")).as("qc"),
        VectorFunctions.dot(col("cvec"), col("cvec")).as("cnorm2c"))
    // per (cell, m, code): c_m·r_m[code] — K_cells·M·K rows, driver-side
    // from the two trained codebooks (the same left-to-right fold as the
    // oracle's list_dot_product over the centroid slice)
    val subDim = rcbs.head.head._2.length
    val crDf = (for {
      (cid, c) <- cents
      (cb, m) <- rcbs.zipWithIndex
      (code, r) <- cb
    } yield (cid, m, code, dotLR(c.slice(m * subDim, (m + 1) * subDim), r)))
      .toDF("cluster", "m", "code", "cr")
    val cand = enc.join(broadcast(probeTerms), Seq("cluster"))
      .filter(col("vec_id") =!= col("query_id"))
    val terms = Pq.explodeCodes(cand, Seq("query_id", "vec_id", "cluster", "qc", "cnorm2c"),
        rcbs.length)
      .join(broadcast(Pq.qlutFor(e, rcbs)), Seq("query_id", "m", "code"))
      .join(broadcast(crDf), Seq("cluster", "m", "code"))
    rankResidual(terms, rcbs.length)
  }

  /** Pivot the per-(query, candidate) terms to fixed subspace columns and
    * add in FIXED order (same association as the oracle — see the class
    * scaladoc), score, rank top-3 per query. */
  private def rankResidual(terms: DataFrame, mCount: Int = M): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pivots =
      (0 until mCount).map(m => max(when(col("m") === m, col("qdot"))).as(s"qd_$m")) ++
        (0 until mCount).map(m => max(when(col("m") === m, col("cnorm2"))).as(s"rn_$m")) ++
        (0 until mCount).map(m => max(when(col("m") === m, col("cr"))).as(s"cr_$m"))
    val g = terms
      .groupBy(col("query_id"), col("vec_id"), col("qnorm"), col("qc"), col("cnorm2c"))
      .agg(pivots.head, pivots.tail: _*)
    val qdSum = (0 until mCount).map(m => col(s"qd_$m")).reduce(_ + _)
    val rnSum = (0 until mCount).map(m => col(s"rn_$m")).reduce(_ + _)
    val crSum = (0 until mCount).map(m => col(s"cr_$m")).reduce(_ + _)
    val w = Window.partitionBy(col("query_id")).orderBy(desc("cos"), col("vec_id"))
    g.withColumn("cos",
        (col("qc") + qdSum)
          / (col("qnorm") * sqrt(col("cnorm2c") + lit(2.0) * crSum + rnSum)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"), pround(col("cos"), 4).as("approx_cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ------------------------------------------------------------- oracle SQL

  /** CTE block (no WITH): residual table, residual-PQ training
    * ([[Pq.lutCtes]] with rp/rpq prefixes), the two correction-term
    * tables, candidate scoring → `adranked`. Assumes
    * [[IvfKMeans.trainingSql]] (`e`, `afinal`, final centroids) and a
    * probe relation `probeRel(query_id, qv, cluster)` are in scope. */
  /** CTE (no WITH): the residual table over `afinal` + final centroids —
    * shared by [[recallCtes]] and the `index_build_ivfadc` summary oracle. */
  private[operators] def residualESql: String =
    s"""eres AS (
       |  SELECT a.vec_id,
       |         list_transform(generate_series(1, ${IvfKMeans.Dim}),
       |                        i -> a.v[i] - c.cv[i]) AS v
       |  FROM afinal a JOIN ${IvfKMeans.finalCentroidsRel} c ON a.cluster = c.cluster)""".stripMargin

  private[operators] def recallCtes(probeRel: String): String = {
    val cRel = IvfKMeans.finalCentroidsRel
    val qd = (0 until M).map(m => s"max(CASE WHEN ql.m = $m THEN ql.qdot END) AS qd_$m")
      .mkString(",\n         ")
    val rn = (0 until M).map(m => s"max(CASE WHEN ql.m = $m THEN ql.cnorm2 END) AS rn_$m")
      .mkString(",\n         ")
    val cr = (0 until M).map(m => s"max(CASE WHEN ql.m = $m THEN cr.cr END) AS cr_$m")
      .mkString(",\n         ")
    val qdSum = (0 until M).map(m => s"qd_$m").mkString(" + ")
    val rnSum = (0 until M).map(m => s"rn_$m").mkString(" + ")
    val crSum = (0 until M).map(m => s"cr_$m").mkString(" + ")
    s"""$residualESql,
       |${Pq.lutCtes("eres", "rp", "rpq")},
       |adqc AS (
       |  SELECT p.query_id, p.cluster,
       |         list_dot_product(p.qv, c.cv) AS qc,
       |         list_dot_product(c.cv, c.cv) AS cnorm2c
       |  FROM $probeRel p JOIN $cRel c ON p.cluster = c.cluster),
       |adcr AS (
       |  SELECT c.cluster, l.m, l.code,
       |         list_dot_product(c.cv[(l.m * $SubDim + 1):((l.m + 1) * $SubDim)], l.cv) AS cr
       |  FROM $cRel c CROSS JOIN rpqlut l),
       |adg AS (
       |  SELECT ql.query_id, cd.vec_id AS neighbor_id, ql.qnorm, qc.qc, qc.cnorm2c,
       |         $qd,
       |         $rn,
       |         $cr
       |  FROM (SELECT a.vec_id, p.query_id, a.cluster
       |        FROM afinal a JOIN $probeRel p ON a.cluster = p.cluster
       |        WHERE a.vec_id <> p.query_id) cd
       |  JOIN rpqcodes pc ON pc.vec_id = cd.vec_id
       |  JOIN rpqqlut ql ON ql.query_id = cd.query_id AND ql.m = pc.m AND ql.code = pc.code
       |  JOIN adcr cr ON cr.cluster = cd.cluster AND cr.m = pc.m AND cr.code = pc.code
       |  JOIN adqc qc ON qc.query_id = cd.query_id AND qc.cluster = cd.cluster
       |  GROUP BY ql.query_id, cd.vec_id, ql.qnorm, qc.qc, qc.cnorm2c),
       |adscored AS (
       |  SELECT query_id, neighbor_id,
       |         (qc + ($qdSum))
       |           / (qnorm * sqrt(cnorm2c + 2.0 * ($crSum) + ($rnSum))) AS cos
       |  FROM adg),
       |adranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM adscored)""".stripMargin
  }

  val ivfadcSearchSql: String =
    s"""WITH ${IvfKMeans.trainingSql},
       |${IvfKMeans.nprobeSql("adq")},
       |${recallCtes("adq")}
       |SELECT query_id, neighbor_id, rank,
       |       floor(cos * 10000 + 0.5) / 10000.0 AS approx_cosine
       |FROM adranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_ivfadc" -> ivfadcSearch
  )

  val oracles: Map[String, String] = Map(
    "ann_ivfadc" -> ivfadcSearchSql
  )
}
