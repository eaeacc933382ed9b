package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.OracleParity.pround
import graft.io.{OracleViews, Tables}

/** Column profiling — the data-quality report a training-data pipeline
  * runs over every ingest before anything downstream trusts the table:
  * per-column row/null/empty counts, distinct cardinality (exact + KMV
  * sketch), and mean value length, computed in ONE stacked pass rather
  * than |columns| separate scans.
  *
  * Scale shape: `explode` fans each row into (column, value-as-string)
  * pairs map-side — no extra scan per column — and everything aggregates
  * by the |columns|-row `col` key with map-side combine; the KMV
  * distinct sketch (the [[graft.functions.KmvSketch]] Aggregator, ≤64
  * longs of state per column) is what production would keep at 100 TB,
  * where per-column `countDistinct` means |columns| parallel
  * distinct-shuffles of the corpus. The exact distinct rides along here
  * as the sketch's oracle (the `q_approx_distinct` bench convention:
  * this query pays sketch + exact by design).
  *
  * Profiled table: the `games` view — its tri-state description
  * convention (null / blank / populated, reference:
  * src/lib/commands/downloadDescriptions.ts:13-18) is exactly the
  * null-vs-empty distinction `n_null`/`n_empty` exist to surface.
  * Values are profiled through their canonical string forms (longs,
  * booleans, strings — both engines render them identically; no doubles
  * in the view, so no float-formatting divergence), making the whole
  * report deterministic and fully hash-checked.
  */
object Profile {

  private val ProfiledCols = Seq("universeId", "name", "description",
    "descriptionFetched", "gameplayDescription", "playerCount")

  private[graft] def profileOn(g: DataFrame): DataFrame = {
    val kmv = udaf(graft.functions.KmvSketch)
    val stacked = g
      .select(explode(array(ProfiledCols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.c").as("col"), col("s.v").as("v"))
    // null counts derive from (total rows − non-null rows), so the exploded
    // frame is aggregated ONCE (nulls never enter the sketch); the total is
    // a column-pruned count-star broadcast alongside
    val tot = g.agg(count(lit(1)).as("n"))
    val vals = stacked.filter(col("v").isNotNull).groupBy(col("col"))
      .agg(count(lit(1)).as("n_vals"),
        sum(when(col("v") === "", 1L).otherwise(0L)).as("n_empty"),
        kmv(conv(substring(md5(col("v")), 1, 8), 16, 10).cast("long"))
          .as("distinct_kmv"),
        countDistinct(col("v")).as("n_distinct"),
        pround(sum(length(col("v"))).cast("double") / count(col("v")), 4)
          .as("avg_len"))
    vals.crossJoin(broadcast(tot))
      .select(col("col"), col("n"), (col("n") - col("n_vals")).as("n_null"),
        pround((col("n") - col("n_vals")).cast("double") / col("n"), 4)
          .as("null_frac"),
        col("n_empty"), col("n_distinct"), col("distinct_kmv"), col("avg_len"))
      .orderBy(col("col"))
  }

  def profileGames(spark: SparkSession, dir: String): DataFrame =
    profileOn(Tables.games(spark, dir))

  val profileGamesSql: String = {
    val k = graft.functions.KmvSketch.K
    OracleViews.withGames(
      s""", stacked AS (
         |  SELECT 'universeId' AS col, universeId::VARCHAR AS v FROM games
         |  UNION ALL SELECT 'name', name FROM games
         |  UNION ALL SELECT 'description', description FROM games
         |  UNION ALL SELECT 'descriptionFetched', descriptionFetched::VARCHAR
         |    FROM games
         |  UNION ALL SELECT 'gameplayDescription', gameplayDescription FROM games
         |  UNION ALL SELECT 'playerCount', playerCount::VARCHAR FROM games),
         |tot AS (SELECT count(*) AS n FROM games),
         |nn AS (SELECT col, v FROM stacked WHERE v IS NOT NULL),
         |hh AS (SELECT DISTINCT col,
         |         CAST('0x' || substring(md5(v), 1, 8) AS BIGINT) AS hv
         |       FROM nn),
         |r AS (SELECT col, hv,
         |        row_number() OVER (PARTITION BY col ORDER BY hv) AS rn
         |      FROM hh),
         |s AS (SELECT col, count(*) AS nh, max(hv) AS hk
         |      FROM r WHERE rn <= $k GROUP BY col),
         |ex AS (SELECT col, count(*) AS n_vals,
         |         CAST(sum(CASE WHEN v = '' THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_empty,
         |         count(DISTINCT v) AS n_distinct,
         |         floor(sum(length(v))::DOUBLE / count(v) * 10000 + 0.5)
         |           / 10000.0 AS avg_len
         |       FROM nn GROUP BY col)
         |SELECT ex.col, tot.n, tot.n - ex.n_vals AS n_null,
         |  floor((tot.n - ex.n_vals)::DOUBLE / tot.n * 10000 + 0.5) / 10000.0
         |    AS null_frac,
         |  ex.n_empty, ex.n_distinct,
         |  CASE WHEN s.nh < $k OR s.hk <= 0 THEN s.nh
         |       ELSE CAST(floor(($k - 1) * 4294967296.0 / s.hk + 0.5)
         |                 AS BIGINT) END AS distinct_kmv,
         |  ex.avg_len
         |FROM ex JOIN s ON s.col = ex.col CROSS JOIN tot
         |ORDER BY ex.col""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_games" -> profileGames
  )

  val oracles: Map[String, String] = Map(
    "q_profile_games" -> profileGamesSql
  )
}
