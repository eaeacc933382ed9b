package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.enrich.{EnrichmentClient, StubEnrichmentClient}
import graft.io.{OracleViews, Tables}
import graft.model.Constants

/** Enrichment operators (SURVEY §2.8): row/batch-wise external-service
  * calls expressed as `mapPartitions` with a pluggable [[EnrichmentClient]].
  *
  * The distributed shape is the point: the WORK SET is derived by anti-join
  * (the reference's skip-already-done pruning, P10 — generateEmbeddings.ts:
  * 24-29), each partition batches its rows (10 per embed request, 50 per
  * details request) through its own client instance, and re-runs are
  * idempotent because the anti-join re-derives the remaining work — no
  * checkpoint files (E5) needed. At 1000 executors this gives
  * 1000-way-parallel API fan-out with per-partition rate limiting.
  */
object Enrich {

  /** E2 — embedding generation over the anti-join work set. */
  def generateEmbeddings(
      spark: SparkSession,
      docs: DataFrame,
      existingIds: DataFrame,
      client: EnrichmentClient,
      batchSize: Int = Constants.EmbeddingBatchSize): DataFrame = {
    import spark.implicits._
    val workSet = docs.select(col("doc_id"), col("text"))
      .join(existingIds, Seq("doc_id"), "left_anti")
    workSet.as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val vecs = client.embed(batch.map(_._2))
          batch.map(_._1).zip(vecs)
        }
      }
      .toDF("doc_id", "embedding")
  }

  /** Oracle-checked stub-embedding query: docs lacking a vector in the
    * partial-coverage embedding set get a deterministic stub embedding;
    * output exploded to (doc_id, dim_idx, v) rows. */
  def embedStub(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val existing = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 7 =!= 3)
      .select(col("vec_id").as("doc_id"))
    generateEmbeddings(spark, docs, existing, new StubEnrichmentClient(8))
      .select(col("doc_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("dim_idx"), col("v"))
      .orderBy(col("doc_id"), col("dim_idx"))
  }

  val embedStubSql: String =
    """SELECT d.doc_id, j.j AS dim_idx,
      |  ((CAST('0x' || substring(md5(d.text), 1, 8) AS BIGINT) * j.j) % 1000) / 1000.0 AS v
      |FROM documents d
      |CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS j) j
      |WHERE NOT EXISTS (SELECT 1 FROM embeddings e
      |                  WHERE e.vec_id % 7 <> 3 AND e.vec_id = d.doc_id)
      |ORDER BY doc_id, dim_idx""".stripMargin

  /** E1 + F15 — gameplay-description generation: eligibility filter (P9 —
    * non-blank description, blank gameplayDescription), stub LLM analysis,
    * then the markdown composition of generateGameplayDescriptions.ts:
    * 160-163. */
  def gameplayMarkdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val client = new StubEnrichmentClient(8)
    val eligible = Tables.games(spark, dir)
      .filter(col("description").isNotNull && trim(col("description")) =!= "" &&
        (col("gameplayDescription").isNull || trim(col("gameplayDescription")) === ""))
      .select(col("universeId"), col("name"), col("description"), col("playerCount"))
    eligible.as[(Long, String, String, Option[Long])]
      .mapPartitions { it =>
        it.map { case (id, name, desc, pc) =>
          val a = client.analyze(name, desc, pc)
          val md = s"**Gameplay Summary**: ${a.gameplaySummary}\n\n" +
            s"**Genre Tags**: ${a.genreTags.mkString(", ")}\n\n" +
            s"**Game Features**: ${a.gameFeatures.mkString(", ")}"
          (id, md)
        }
      }
      .toDF("universeId", "gameplayDescription")
      .orderBy(col("universeId"))
  }

  val gameplayMarkdownSql: String = OracleViews.withGames(
    """, eligible AS (
      |  SELECT universeId, name, description, playerCount,
      |         string_split_regex(lower(description), '\s+') AS toks
      |  FROM games
      |  WHERE description IS NOT NULL AND trim(description) <> ''
      |    AND (gameplayDescription IS NULL OR trim(gameplayDescription) = ''))
      |SELECT universeId,
      |  '**Gameplay Summary**: ' || array_to_string(toks[1:6], ' ')
      |  || chr(10) || chr(10) || '**Genre Tags**: ' || array_to_string(toks[1:2], ', ')
      |  || chr(10) || chr(10) || '**Game Features**: '
      |  || CASE WHEN playerCount > 100 THEN 'multiplayer' ELSE '' END AS gameplayDescription
      |FROM eligible
      |ORDER BY universeId""".stripMargin)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e2_embed_stub" -> embedStub,
    "e1_gameplay_markdown" -> gameplayMarkdown
  )

  val oracles: Map[String, String] = Map(
    "e2_embed_stub" -> embedStubSql,
    "e1_gameplay_markdown" -> gameplayMarkdownSql
  )
}
