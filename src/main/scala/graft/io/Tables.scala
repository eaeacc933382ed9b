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

  /** Inferred schema per fixture file, cached for the life of the JVM.
    *
    * Why (round 18, optimization guide §1.2 "per-task work" at the driver):
    * every `spark.read.parquet(path)` WITHOUT an explicit schema runs a
    * footer-inference Spark job before the query's own jobs — ~30-80 ms of
    * job + scheduling gap per call, and operators read these tables
    * hundreds of times across a suite run. The fixture files are immutable
    * inputs (the driver regenerates them only between runs), so one
    * inference per (path) is exact; later reads pass the cached schema and
    * skip the job. Keyed by the resolved path string — distinct sfDirs
    * cache independently. The nanosAsLong session flag is identical across
    * all graft sessions, so the inferred type per path never varies. */
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.getOrElseUpdate(path, spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  /** The events fixture's `ts` column arrives in a host-dependent parquet
    * flavor, and the engine must read all of them identically (an engine
    * that only reads one writer's files is not portable):
    *   - TIMESTAMP(NANOS): Spark's reader rejects it outright; with
    *     spark.sql.legacy.parquet.nanosAsLong=true (set by Verify/Bench/test
    *     sessions) it arrives as LONG nanos → truncated to micros here, the
    *     same truncation DuckDB applies.
    *   - TIMESTAMP_NTZ (isAdjustedToUTC=false micros, what pandas/pyarrow
    *     write by default): cast to TIMESTAMP. Every graft session pins
    *     spark.sql.session.timeZone=UTC, so the cast is instant-preserving
    *     and matches DuckDB's naive read of the same values.
    *   - TIMESTAMP (instant micros): passes through.
    * All downstream event operators assume `ts` is TimestampType after this
    * point; TimestampFlavorSpec replays every Events query against all three
    * shapes to keep it that way. */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(load(spark, dir, "events"))

  /** Flavor normalization for any dataframe carrying an events-style `ts`
    * column (used by the batch reader above and by streaming fixtures). */
  def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
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
