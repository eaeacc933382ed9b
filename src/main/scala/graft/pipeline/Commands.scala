package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.enrich.EnrichmentClient
import graft.io.Tables
import graft.operators.{Enrich, Merge, Quality, Similarity, TextSearch}

/** Command registry mirroring the reference's CLI surface
  * (src/lib/commands.ts:15-29). Each command is a named driver program over
  * the engine's operators; the gather* commands take a pre-fetched snapshot
  * DataFrame because their HTTP pagination sources are inherently
  * sequential driver-side work (SURVEY §7.4 — do not force-parallelize).
  *
  * This is the layer a job scheduler (the reference's SQLite job queue,
  * §2.10 POST endpoints) would invoke; job bookkeeping itself is a plain
  * table + groupBy("status").count() (A3) and deliberately not rebuilt as
  * a custom subsystem.
  */
object Commands {

  /** gatherGames / gatherGamesFromSearch / gatherGamesRolimons — merge a
    * freshly gathered snapshot into the existing table (J1 family). */
  def gatherGames(existing: DataFrame, fresh: DataFrame): DataFrame =
    Merge.mergeUpsert(existing, fresh, "universeId",
      overwriteCols = Seq("rootPlaceId", "name"),
      coalesceCols = Seq.empty,
      keepCols = Seq("description", "gameplayDescription", "playerCount"))

  def gatherGamesRolimons(existing: DataFrame, fresh: DataFrame): DataFrame =
    Merge.mergeUpsert(existing, fresh, "universeId",
      overwriteCols = Seq("rootPlaceId", "name"),
      coalesceCols = Seq("description"),
      keepCols = Seq("gameplayDescription", "playerCount"))

  def gatherGamesFromSearch(existing: DataFrame, fresh: DataFrame): DataFrame =
    Merge.mergeUpsert(existing, fresh, "universeId",
      overwriteCols = Seq("rootPlaceId", "name", "playerCount"),
      coalesceCols = Seq.empty,
      keepCols = Seq("description", "gameplayDescription"))

  /** countGames (A1). */
  def countGames(spark: SparkSession, dir: String): DataFrame =
    Quality.countGames(spark, dir)

  /** pruneGames (P12/A6). */
  def pruneGames(spark: SparkSession, dir: String): DataFrame =
    Quality.pruneCascade(spark, dir)

  /** search (F1-F7). */
  def search(spark: SparkSession, dir: String, query: String, limit: Int): DataFrame =
    TextSearch.search(Tables.games(spark, dir), query, limit)

  /** findSimilarGames (§2.10 similar-search). */
  def findSimilarGames(spark: SparkSession, dir: String): DataFrame =
    Similarity.similarSearch(spark, dir)

  /** clearGameplayDescriptions (P15 — clearGameplayDescriptions.ts:14-16). */
  def clearGameplayDescriptions(games: DataFrame): DataFrame =
    games.withColumn("gameplayDescription", lit(null).cast("string"))

  /** downloadDescriptions (S8/J3/P5-P7 — reference:
    * src/lib/commands/downloadDescriptions.ts:28-77): batch-fetch details
    * for the work set (needsDescription ∨ needsPlayerCount), then merge:
    *
    *   - returned rows overwrite description (blank → null, the
    *     known-blank tri-state) and playerCount (missing `playing` → 0);
    *   - requested-but-MISSING ids (the J3 anti-join set) get
    *     description := null only if they needed one — marking them
    *     known-blank so re-runs skip them; playerCount untouched;
    *   - rows outside the work set pass through unchanged.
    *
    * Expects the games DataFrame to carry `descriptionFetched` (the
    * tri-state flag — SURVEY §1.2). The fetch itself is a partition-batched
    * client call, so API fan-out scales with executors. */
  def downloadDescriptions(
      spark: SparkSession,
      games: DataFrame,
      client: EnrichmentClient,
      batchSize: Int = graft.model.Constants.RobloxBatchSize): DataFrame = {
    import spark.implicits._
    val needsDesc = !col("descriptionFetched") ||
      (col("description").isNotNull && trim(col("description")) === "")
    val inWorkset = needsDesc || col("playerCount").isNull
    val details = games.filter(inWorkset).select(col("universeId")).as[Long]
      .mapPartitions(it => it.grouped(batchSize).flatMap(b => client.gameDetails(b)))
      .map(d => (d.id, d.description, d.playing))
      .toDF("universeId", "d_desc", "d_playing")
      .withColumn("d_returned", lit(1))
    val returned = col("d_returned").isNotNull
    games.join(details, Seq("universeId"), "left")
      .select(
        col("universeId"), col("rootPlaceId"), col("name"),
        when(!inWorkset, col("description"))
          .when(returned,
            when(col("d_desc").isNotNull && trim(col("d_desc")) =!= "", col("d_desc")))
          .otherwise(when(needsDesc, lit(null)).otherwise(col("description")))
          .as("description"),
        when(!inWorkset, col("descriptionFetched"))
          .when(returned, lit(true))
          .otherwise(needsDesc || col("descriptionFetched"))
          .as("descriptionFetched"),
        col("gameplayDescription"),
        when(!inWorkset, col("playerCount"))
          .when(returned, coalesce(col("d_playing"), lit(0L)))
          .otherwise(col("playerCount"))
          .as("playerCount"))
  }

  /** generateEmbeddings (E2) over the anti-join work set. */
  def generateEmbeddings(spark: SparkSession, docs: DataFrame, existingIds: DataFrame,
      client: EnrichmentClient): DataFrame =
    Enrich.generateEmbeddings(spark, docs, existingIds, client)

  /** processGamesFromSearch — the reference's 4-stage DAG
    * (processGamesFromSearch.ts:14-27): gather → enrich → embed, expressed
    * as sequential actions in one driver program; Spark's scheduler
    * parallelizes within each stage instead of the reference's
    * Promise.all. */
  def processGamesFromSearch(
      spark: SparkSession,
      existing: DataFrame,
      fresh: DataFrame,
      embeddingsExisting: DataFrame,
      client: EnrichmentClient): (DataFrame, DataFrame) = {
    val merged = gatherGamesFromSearch(existing, fresh)
    val docs = merged.select(col("universeId").as("doc_id"),
      coalesce(col("gameplayDescription"), col("description"), col("name")).as("text"))
    val embedded = Enrich.generateEmbeddings(spark, docs, embeddingsExisting, client)
    (merged, embedded)
  }
}
