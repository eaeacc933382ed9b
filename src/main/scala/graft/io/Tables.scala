package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver-generated parquet tables (TESTDATA.md) plus the
  * derived `games` view that stands in for the reference's games.json table
  * (FIXTURES.md §2: documents ⋈ embeddings stands in for games ⋈ embeddings).
  *
  * All readers are plain parquet scans so Catalyst pushes filters and prunes
  * columns into the file source — at 100 TB the scan is the dominant cost and
  * must only read what the query projects.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** The events fixture stores TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects; with spark.sql.legacy.parquet.nanosAsLong=true (set by
    * Verify/Bench sessions) it arrives as LONG nanos and is converted here
    * to a microsecond timestamp — the same truncation DuckDB applies. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Deterministic `games` view derived from `documents`, matching the
    * reference's Game schema (reference: src/types.d.ts:59-66) including the
    * tri-state description convention via modular null/blank injection.
    * Mirrored 1:1 by [[OracleViews.gamesSql]] for the DuckDB oracle.
    */
  def games(spark: SparkSession, dir: String): DataFrame = {
    val d = documents(spark, dir)
    d.select(
      col("doc_id").as("universeId"),
      (col("doc_id") + lit(1000000L)).as("rootPlaceId"),
      array_join(slice(split(col("text"), " "), 1, 4), " ").as("name"),
      // tri-state (reference: src/lib/commands/downloadDescriptions.ts:13-18):
      //   %17 → never fetched (null + descriptionFetched=false)
      //   %19 → fetched, known-blank (null + descriptionFetched=true)
      //   %23 → fetched, empty string (refetch candidate)
      when(col("doc_id") % 17 === 0, lit(null))
        .when(col("doc_id") % 19 === 0, lit(null))
        .when(col("doc_id") % 23 === 0, lit(""))
        .otherwise(col("text")).as("description"),
      (col("doc_id") % 17 =!= 0).as("descriptionFetched"),
      when(col("doc_id") % 3 === 0, lit(null))
        .otherwise(concat(lit("**Gameplay Summary**: "), col("text"))).as("gameplayDescription"),
      when(col("doc_id") % 13 === 0, lit(null))
        .otherwise(col("n_chars")).as("playerCount")
    )
  }

  /** Game embeddings view: `embeddings` keyed by universeId = vec_id. */
  def gameEmbeddings(spark: SparkSession, dir: String): DataFrame =
    embeddings(spark, dir).select(
      col("vec_id").as("universeId"),
      col("embedding"))
}

/** DuckDB-SQL mirrors of the derived views, prefixed as CTEs in oracle SQL. */
object OracleViews {
  /** Must stay semantically identical to [[Tables.games]]. */
  val gamesSql: String =
    """games AS (
      |  SELECT doc_id AS universeId,
      |         doc_id + 1000000 AS rootPlaceId,
      |         array_to_string((string_split(text, ' '))[1:4], ' ') AS name,
      |         CASE WHEN doc_id % 17 = 0 THEN NULL
      |              WHEN doc_id % 19 = 0 THEN NULL
      |              WHEN doc_id % 23 = 0 THEN ''
      |              ELSE text END AS description,
      |         doc_id % 17 <> 0 AS descriptionFetched,
      |         CASE WHEN doc_id % 3 = 0 THEN NULL
      |              ELSE '**Gameplay Summary**: ' || text END AS gameplayDescription,
      |         CASE WHEN doc_id % 13 = 0 THEN NULL ELSE n_chars END AS playerCount
      |  FROM documents
      |)""".stripMargin

  val gameEmbeddingsSql: String =
    """game_embeddings AS (
      |  SELECT vec_id AS universeId, embedding FROM embeddings
      |)""".stripMargin

  def withGames(body: String): String = s"WITH $gamesSql\n$body"
  def withGamesAndEmbeddings(body: String): String =
    s"WITH $gamesSql,\n$gameEmbeddingsSql\n$body"
}
