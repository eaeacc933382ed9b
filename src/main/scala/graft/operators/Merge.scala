package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.{OracleViews, Tables}

/** The reference's core merge-upsert (J1 family — reference:
  * src/lib/commands/gatherGames.ts:56-91 and variants at
  * gatherGamesRolimons.ts:220-257, gatherGamesFromSearch.ts:64-92):
  * full-outer join of a fresh snapshot against the existing table on the
  * primary key, with per-column merge policy:
  *
  *   - OVERWRITE: matched rows take the fresh value (name, rootPlaceId —
  *     and playerCount in the search variant);
  *   - COALESCE:  fresh value if non-null else existing (description in the
  *     Rolimons variant);
  *   - KEEP:      enrichment columns always come from the existing side.
  *
  * Scale design: a shuffle full-outer hash join on the key — both sides
  * hash-partition on universeId, so at 100 TB each executor merges one
  * co-located slice; AQE handles skew. (On a Delta/Iceberg table this same
  * policy is `MERGE WHEN MATCHED UPDATE ... WHEN NOT MATCHED INSERT`.)
  * The reference's O(n²) `games.find` probe (gatherGames.ts:66) is
  * deliberately NOT replicated.
  */
object Merge {

  /** Parameterized merge-upsert. All column sets exclude the key. */
  def mergeUpsert(
      existing: DataFrame,
      fresh: DataFrame,
      key: String,
      overwriteCols: Seq[String],
      coalesceCols: Seq[String],
      keepCols: Seq[String]): DataFrame = {
    val e = existing.alias("e")
    val f = fresh.alias("f")
    val freshPresent = col(s"f.$key").isNotNull
    def pick(c: String): Column =
      if (overwriteCols.contains(c)) when(freshPresent, col(s"f.$c")).otherwise(col(s"e.$c"))
      else if (coalesceCols.contains(c)) coalesce(col(s"f.$c"), col(s"e.$c"))
      else col(s"e.$c")
    val outCols = coalesce(col(s"e.$key"), col(s"f.$key")).as(key) +:
      (overwriteCols ++ coalesceCols ++ keepCols).map(c => pick(c).as(c))
    e.join(f, col(s"e.$key") === col(s"f.$key"), "full_outer")
      .select(outCols: _*)
  }

  /** Existing snapshot: 2/3 of the games table, enrichments included. */
  private def existingSnapshot(spark: SparkSession, dir: String): DataFrame =
    Tables.games(spark, dir).filter(col("universeId") % 3 =!= 1)
      .drop("descriptionFetched")

  /** Fresh snapshot: every even key, gathered anew — updated name and
    * rootPlaceId, no enrichments except the variant columns. */
  private def freshSnapshot(spark: SparkSession, dir: String): DataFrame =
    Tables.games(spark, dir).filter(col("universeId") % 2 === 0)
      .select(
        col("universeId"),
        (col("universeId") + 2000000L).as("rootPlaceId"),
        concat(col("name"), lit(" v2")).as("name"),
        when(col("universeId") % 5 === 0,
          concat(lit("refreshed "), col("universeId").cast("string"))).as("description"),
        (col("universeId") % 100 + 1).as("playerCount"))

  private val snapshotsSql: String =
    """existing AS (SELECT universeId, rootPlaceId, name, description,
      |                    gameplayDescription, playerCount
      |             FROM games WHERE universeId % 3 <> 1),
      |fresh AS (SELECT universeId,
      |                 universeId + 2000000 AS rootPlaceId,
      |                 name || ' v2' AS name,
      |                 CASE WHEN universeId % 5 = 0
      |                      THEN 'refreshed ' || CAST(universeId AS VARCHAR) END AS description,
      |                 universeId % 100 + 1 AS playerCount
      |          FROM games WHERE universeId % 2 = 0)""".stripMargin

  /** J1 base merge: overwrite name/rootPlaceId, keep all enrichments
    * (reference: gatherGames.ts:60-86). */
  def mergeBase(spark: SparkSession, dir: String): DataFrame =
    mergeUpsert(
      existingSnapshot(spark, dir), freshSnapshot(spark, dir), "universeId",
      overwriteCols = Seq("rootPlaceId", "name"),
      coalesceCols = Seq.empty,
      keepCols = Seq("description", "gameplayDescription", "playerCount"))
      .orderBy(col("universeId"))

  val mergeBaseSql: String = OracleViews.withGames(
    s""", $snapshotsSql
       |SELECT coalesce(e.universeId, f.universeId) AS universeId,
       |  CASE WHEN f.universeId IS NOT NULL THEN f.rootPlaceId ELSE e.rootPlaceId END AS rootPlaceId,
       |  CASE WHEN f.universeId IS NOT NULL THEN f.name ELSE e.name END AS name,
       |  e.description AS description,
       |  e.gameplayDescription AS gameplayDescription,
       |  e.playerCount AS playerCount
       |FROM existing e FULL OUTER JOIN fresh f ON e.universeId = f.universeId
       |ORDER BY universeId""".stripMargin)

  /** J1b+J1c variant merge: additionally coalesce description from fresh
    * (gatherGamesRolimons.ts:220-257) and overwrite playerCount
    * (gatherGamesFromSearch.ts:64-92). */
  def mergeVariants(spark: SparkSession, dir: String): DataFrame =
    mergeUpsert(
      existingSnapshot(spark, dir), freshSnapshot(spark, dir), "universeId",
      overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
      coalesceCols = Seq("description"),
      keepCols = Seq("gameplayDescription"))
      .orderBy(col("universeId"))

  val mergeVariantsSql: String = OracleViews.withGames(
    s""", $snapshotsSql
       |SELECT coalesce(e.universeId, f.universeId) AS universeId,
       |  CASE WHEN f.universeId IS NOT NULL THEN f.rootPlaceId ELSE e.rootPlaceId END AS rootPlaceId,
       |  CASE WHEN f.universeId IS NOT NULL THEN f.name ELSE e.name END AS name,
       |  CASE WHEN f.universeId IS NOT NULL THEN f.playerCount ELSE e.playerCount END AS playerCount,
       |  coalesce(f.description, e.description) AS description,
       |  e.gameplayDescription AS gameplayDescription
       |FROM existing e FULL OUTER JOIN fresh f ON e.universeId = f.universeId
       |ORDER BY universeId""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j1_merge_upsert" -> mergeBase,
    "j1bc_merge_variants" -> mergeVariants
  )

  val oracles: Map[String, String] = Map(
    "j1_merge_upsert" -> mergeBaseSql,
    "j1bc_merge_variants" -> mergeVariantsSql
  )
}
