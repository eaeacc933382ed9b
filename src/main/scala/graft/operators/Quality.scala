package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{OracleViews, Tables}

/** Data-quality operators: the reference's tri-state predicates (P4-P7),
  * prune cascade with first-matching-reason attribution (P12/A6 —
  * reference: src/lib/commands/pruneGames.ts:152-232), count/stats
  * aggregations (A1/A2 — countGames.ts:10-17, stats.get.ts:44-102), the
  * `/games` listing (T2/T6 — games.get.ts:63-84) and the CLI formatting
  * functions (F10/F12 — findSimilarGames.ts:69-77).
  *
  * All counts are single-pass conditional aggregations (map-side partial
  * aggregation; one row crosses the wire per partition). The prune cascade
  * is a when-chain — one scan, no per-reason passes — and the
  * missing-embedding check is a broadcast-able left join, not N lookups.
  */
object Quality {

  private def blank(c: Column): Column = c.isNull || trim(c) === ""

  /** A1 — countGames: total + non-blank description/gameplay counts. */
  def countGames(spark: SparkSession, dir: String): DataFrame =
    Tables.games(spark, dir).agg(
      count(lit(1)).as("total"),
      count(when(!blank(col("description")), 1)).as("with_description"),
      count(when(!blank(col("gameplayDescription")), 1)).as("with_gameplay"))

  val countGamesSql: String = OracleViews.withGames(
    """SELECT count(*) AS total,
      |  count(CASE WHEN description IS NOT NULL AND trim(description) <> '' THEN 1 END) AS with_description,
      |  count(CASE WHEN gameplayDescription IS NOT NULL AND trim(gameplayDescription) <> '' THEN 1 END) AS with_gameplay
      |FROM games""".stripMargin)

  /** The partial-coverage embedding set used by stats/prune queries to make
    * the missing-embedding / orphan paths non-trivial (every doc has a
    * vector in the fixture, unlike real gathered data). */
  private def embSubset(spark: SparkSession, dir: String): DataFrame =
    Tables.gameEmbeddings(spark, dir).filter(col("universeId") % 7 =!= 3)

  private val embSubsetSql =
    "emb AS (SELECT vec_id AS universeId FROM embeddings WHERE vec_id % 7 <> 3)"

  /** A2 — stats endpoint: one row of table-health counters. The reference's
    * description counter tests exactly undefined | '' | null — NO trim, a
    * whitespace-only description is "present" (stats.get.ts:74-80) — while
    * gameplayDescription is falsy-or-blank-after-trim (:82-84). */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    val games = Tables.games(spark, dir)
    val emb = embSubset(spark, dir)
    val g = games.join(emb.select(col("universeId"), lit(1).as("has_emb")),
      Seq("universeId"), "left")
    val main = g.agg(
      count(lit(1)).as("total_games"),
      count(when(col("description").isNull || col("description") === "", 1))
        .as("lacking_description"),
      count(when(blank(col("gameplayDescription")), 1)).as("lacking_gameplay"),
      count(when(col("has_emb").isNull, 1)).as("lacking_embedding"))
    val orphans = emb.join(games, Seq("universeId"), "left_anti")
      .agg(count(lit(1)).as("orphan_embeddings"))
    main.crossJoin(orphans)
  }

  val statsSql: String = OracleViews.withGames(
    s""", $embSubsetSql
       |SELECT
       |  (SELECT count(*) FROM games) AS total_games,
       |  (SELECT count(*) FROM games WHERE description IS NULL OR description = '') AS lacking_description,
       |  (SELECT count(*) FROM games WHERE gameplayDescription IS NULL OR trim(gameplayDescription) = '') AS lacking_gameplay,
       |  (SELECT count(*) FROM games g WHERE NOT EXISTS
       |     (SELECT 1 FROM emb e WHERE e.universeId = g.universeId)) AS lacking_embedding,
       |  (SELECT count(*) FROM emb e WHERE NOT EXISTS
       |     (SELECT 1 FROM games g WHERE g.universeId = e.universeId)) AS orphan_embeddings""".stripMargin)

  /** P12/A6 — prune cascade: each game gets its FIRST matching prune reason
    * (the reference's `continue` chain, pruneGames.ts:152-198), then
    * per-reason counts, plus the post-prune orphan-embedding count
    * (pruneGames.ts:221-231 — orphans are judged against the PRUNED game
    * set, hence the anti-join on kept games only). */
  def pruneCascade(spark: SparkSession, dir: String): DataFrame = {
    val emb = embSubset(spark, dir)
    val g = Tables.games(spark, dir)
      .join(emb.select(col("universeId"), lit(1).as("has_emb")), Seq("universeId"), "left")
    val reasons = g.withColumn("reason",
      when(col("has_emb").isNull, "missing embedding")
        .when(col("playerCount") === 0, "zero players")
        .when(col("playerCount").isNull, "missing playerCount")
        .when(blank(col("description")), "empty description")
        .when(blank(col("gameplayDescription")), "empty gameplayDescription")
        .otherwise("kept"))
    val counts = reasons.groupBy(col("reason")).agg(count(lit(1)).as("n"))
    val orphanCount = emb
      .join(reasons.filter(col("reason") === "kept").select("universeId"),
        Seq("universeId"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("orphan embeddings").as("reason"), col("n"))
    counts.unionByName(orphanCount).orderBy(col("reason"))
  }

  val pruneCascadeSql: String = OracleViews.withGames(
    s""", $embSubsetSql,
       |reasons AS (
       |  SELECT g.universeId,
       |    CASE WHEN e.universeId IS NULL THEN 'missing embedding'
       |         WHEN g.playerCount = 0 THEN 'zero players'
       |         WHEN g.playerCount IS NULL THEN 'missing playerCount'
       |         WHEN g.description IS NULL OR trim(g.description) = '' THEN 'empty description'
       |         WHEN g.gameplayDescription IS NULL OR trim(g.gameplayDescription) = '' THEN 'empty gameplayDescription'
       |         ELSE 'kept' END AS reason
       |  FROM games g LEFT JOIN emb e ON g.universeId = e.universeId)
       |SELECT reason, count(*) AS n FROM reasons GROUP BY reason
       |UNION ALL
       |SELECT 'orphan embeddings' AS reason, count(*) AS n FROM emb
       |WHERE universeId NOT IN (SELECT universeId FROM reasons WHERE reason = 'kept')
       |ORDER BY reason""".stripMargin)

  /** P4-P7 — tri-state description predicates: `undefined` (never fetched)
    * vs `null` (fetched, known-blank) vs blank/non-blank string
    * (reference: downloadDescriptions.ts:13-18). */
  def tristatePredicates(spark: SparkSession, dir: String): DataFrame =
    Tables.games(spark, dir).agg(
      count(when(!blank(col("description")), 1)).as("has_description"),
      count(when(!col("descriptionFetched") ||
        (col("description").isNotNull && trim(col("description")) === ""), 1))
        .as("needs_description"),
      count(when(col("descriptionFetched") && col("description").isNull, 1))
        .as("known_blank"),
      count(when(col("playerCount").isNull, 1)).as("needs_player_count"))

  val tristatePredicatesSql: String = OracleViews.withGames(
    """SELECT
      |  count(CASE WHEN description IS NOT NULL AND trim(description) <> '' THEN 1 END) AS has_description,
      |  count(CASE WHEN NOT descriptionFetched
      |              OR (description IS NOT NULL AND trim(description) = '') THEN 1 END) AS needs_description,
      |  count(CASE WHEN descriptionFetched AND description IS NULL THEN 1 END) AS known_blank,
      |  count(CASE WHEN playerCount IS NULL THEN 1 END) AS needs_player_count
      |FROM games""".stripMargin)

  /** T2/T6 — `/games?limit=50`: name sort + limit + 5-column projection.
    * Binary UTF-8 name ordering with universeId tiebreak (documented
    * divergence from JS localeCompare — SURVEY §7.4). */
  def gamesList(spark: SparkSession, dir: String): DataFrame =
    Tables.games(spark, dir)
      .orderBy(col("name"), col("universeId"))
      .limit(50)
      .select(col("universeId"), col("rootPlaceId"), col("name"),
        col("description"), col("gameplayDescription"))

  val gamesListSql: String = OracleViews.withGames(
    """SELECT universeId, rootPlaceId, name, description, gameplayDescription
      |FROM games
      |ORDER BY name, universeId
      |LIMIT 50""".stripMargin)

  /** F10/F12 — presentation scalars: the CLI link template and the
    * 43-char-truncate-or-pad display name
    * (reference: findSimilarGames.ts:69,72-77). */
  def formatLinks(spark: SparkSession, dir: String): DataFrame =
    Tables.games(spark, dir).select(
      col("universeId"),
      concat(lit("https://roblox.com/games/"), col("rootPlaceId").cast("string")).as("link"),
      when(length(col("name")) > 43, concat(substring(col("name"), 1, 43), lit("...")))
        .otherwise(rpad(col("name"), 46, " ")).as("display_name"))
      .orderBy(col("universeId"))

  val formatLinksSql: String = OracleViews.withGames(
    """SELECT universeId,
      |  'https://roblox.com/games/' || CAST(rootPlaceId AS VARCHAR) AS link,
      |  CASE WHEN length(name) > 43 THEN substring(name, 1, 43) || '...'
      |       ELSE rpad(name, 46, ' ') END AS display_name
      |FROM games
      |ORDER BY universeId""".stripMargin)

  /** T2 variant — case-insensitive name sort, the portable approximation
    * of the reference's localeCompare ordering (games.get.ts:63): order by
    * lower(name) with binary tiebreaks. True ICU collation (Spark 4
    * COLLATE UNICODE_CI) differs between engines, so the engine offers
    * both and the oracle checks the portable one. */
  def gamesListCi(spark: SparkSession, dir: String): DataFrame =
    Tables.games(spark, dir)
      .orderBy(lower(col("name")), col("name"), col("universeId"))
      .limit(50)
      .select(col("universeId"), col("name"))

  val gamesListCiSql: String = OracleViews.withGames(
    """SELECT universeId, name
      |FROM games
      |ORDER BY lower(name), name, universeId
      |LIMIT 50""".stripMargin)

  /** T2 variant #3 — true ICU collation via Spark 4 `COLLATE UNICODE_CI`,
    * the closest engine-native match to the reference's localeCompare
    * (games.get.ts:63). Hash-checked against DuckDB's statically-linked
    * ICU collations (`ORDER BY name COLLATE en`): on the fixture's names
    * the two orderings are provably identical (the derived names are
    * all-lowercase ASCII, where every collation reduces to binary order,
    * and `universeId` breaks all ties). The engines DO diverge off-fixture
    * on strings differing only by case — Spark's UNICODE_CI ties them
    * (universeId decides) while DuckDB's `en` is tertiary, lowercase-first
    * — which QualitySpec pins explicitly on accent/case fixtures. */
  def gamesListIcu(spark: SparkSession, dir: String): DataFrame =
    Tables.games(spark, dir)
      .orderBy(collate(col("name"), "UNICODE_CI"), col("universeId"))
      .limit(50)
      .select(col("universeId"), col("name"))

  val gamesListIcuSql: String = OracleViews.withGames(
    """SELECT universeId, name
      |FROM games
      |ORDER BY name COLLATE en, universeId
      |LIMIT 50""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a1_count_games" -> countGames,
    "a2_stats" -> stats,
    "p12_prune_cascade" -> pruneCascade,
    "p4_tristate_predicates" -> tristatePredicates,
    "t2_games_list" -> gamesList,
    "t2_games_list_ci" -> gamesListCi,
    "t2_games_list_icu" -> gamesListIcu,
    "f10_format_links" -> formatLinks
  )

  val oracles: Map[String, String] = Map(
    "a1_count_games" -> countGamesSql,
    "a2_stats" -> statsSql,
    "p12_prune_cascade" -> pruneCascadeSql,
    "p4_tristate_predicates" -> tristatePredicatesSql,
    "t2_games_list" -> gamesListSql,
    "t2_games_list_ci" -> gamesListCiSql,
    "t2_games_list_icu" -> gamesListIcuSql,
    "f10_format_links" -> formatLinksSql
  )
}
