package graft

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{CosineSimilarity, HashedWordNGrams, HashedWords60, SimHash60, SortedLongIntersectCount}
import graft.io.Tables
import graft.operators.{AnnRecall, Components, Dedup, Ivfpq, Nsw, Pq, Quality, Similarity, TextSearch}

/** SQL surface for the engine: custom Catalyst expressions
  * (`SELECT cosine_similarity(a, b) ...`) AND whole operators as table
  * functions (`SELECT * FROM similar_search(42, 10)`), so a spark.sql-only
  * user can run the flagship queries without touching the Column API.
  * Two registration paths:
  *
  *   - `--conf spark.sql.extensions=graft.GraftExtensions` at session build
  *     (the standard SparkSessionExtensions hook);
  *   - [[GraftExtensions.register]] on an already-running session.
  *
  * Table functions resolve their input tables from the session conf
  * `spark.graft.dataDir` (set it to the parquet fixture directory). The
  * builder runs at ANALYSIS time on the driver: it assembles the same
  * DataFrame the Column API would and splices its analyzed logical plan
  * into the calling query, so Catalyst optimizes the whole statement as
  * one tree — the TVF adds no execution-time indirection whatsoever.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    GraftExtensions.tableBuilders.foreach { case (name, info, builder) =>
      e.injectTableFunction((FunctionIdentifier(name), info, builder))
    }
  }
}

object GraftExtensions {

  private def toDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[graft] val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (es: Seq[Expression]) => CosineSimilarity(toDoubleArray(es(0)), toDoubleArray(es(1)))),
    ("sorted_long_intersect_count",
      new ExpressionInfo(classOf[SortedLongIntersectCount].getName, "sorted_long_intersect_count"),
      (es: Seq[Expression]) => SortedLongIntersectCount(es(0), es(1))),
    ("simhash60",
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (es: Seq[Expression]) => SimHash60(es(0))),
    ("hashed_words60",
      new ExpressionInfo(classOf[HashedWords60].getName, "hashed_words60"),
      (es: Seq[Expression]) => HashedWords60(es(0))),
    ("hashed_word_ngrams",
      new ExpressionInfo(classOf[HashedWordNGrams].getName, "hashed_word_ngrams"),
      (es: Seq[Expression]) => HashedWordNGrams(es(0), litInt(es(1), "n")))
  )

  // ------------------------------------------------------ table functions

  /** Conf key naming the parquet data directory the TVFs read. */
  val DataDirKey = "spark.graft.dataDir"

  private def dataDir(spark: SparkSession): String =
    spark.conf.getOption(DataDirKey).getOrElse(throw new IllegalStateException(
      s"set $DataDirKey before calling a graft table function"))

  private def litString(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def litNum(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def arity(es: Seq[Expression], name: String, min: Int, max: Int): Unit =
    if (es.length < min || es.length > max) throw new IllegalArgumentException(
      s"$name takes $min to $max arguments, got ${es.length}")

  /** A TVF body: build the operator's DataFrame against the conf'd data
    * dir and splice its analyzed plan into the calling statement. */
  private def plan(body: (SparkSession, String) => DataFrame): LogicalPlan = {
    val spark = SparkSession.active
    body(spark, dataDir(spark)).queryExecution.analyzed
  }

  private def tvfInfo(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(GraftExtensions.getClass.getName, null, name, usage, "")

  /** Whole-operator SQL table functions. Arguments must be literals (they
    * parameterize the plan the builder constructs — same contract as
    * `range(...)`). Optional trailing k/limit arguments default to the
    * endpoint defaults. */
  private[graft] val tableBuilders: Seq[(String, ExpressionInfo, Seq[Expression] => LogicalPlan)] = Seq(
    ("similar_search",
      tvfInfo("similar_search", "similar_search(universeId[, k]) - top-k similar games"),
      (es: Seq[Expression]) => {
        arity(es, "similar_search", 1, 2)
        val id = litNum(es(0), "universeId")
        val k = es.lift(1).map(litNum(_, "k").toInt).getOrElse(10)
        plan((s, d) => Similarity.similarSearchOn(
          Tables.games(s, d), Tables.gameEmbeddings(s, d), id, k))
      }),
    ("vector_search",
      tvfInfo("vector_search", "vector_search([k]) - top-k games by cosine vs the stub query vector"),
      (es: Seq[Expression]) => {
        arity(es, "vector_search", 0, 1)
        val k = es.headOption.map(litNum(_, "k").toInt).getOrElse(10)
        plan((s, d) => Similarity.vectorSearchOn(
          Tables.games(s, d), Tables.gameEmbeddings(s, d), Similarity.defaultQueryVector, k))
      }),
    ("text_search",
      tvfInfo("text_search", "text_search(query[, limit]) - relevance-cascade search over games"),
      (es: Seq[Expression]) => {
        arity(es, "text_search", 1, 2)
        val q = litString(es(0), "query").toLowerCase.trim
        val limit = es.lift(1).map(litNum(_, "limit").toInt).getOrElse(10)
        plan((s, d) => TextSearch.search(Tables.games(s, d), q, limit))
      }),
    ("games_list",
      tvfInfo("games_list", "games_list() - name-sorted 50-game listing"),
      (es: Seq[Expression]) => {
        arity(es, "games_list", 0, 0)
        plan(Quality.gamesList)
      }),
    ("graft_stats",
      tvfInfo("graft_stats", "graft_stats() - the /stats endpoint counters"),
      (es: Seq[Expression]) => {
        arity(es, "graft_stats", 0, 0)
        plan(Quality.stats)
      }),
    ("dedup_exact",
      tvfInfo("dedup_exact", "dedup_exact() - exact duplicate groups over documents"),
      (es: Seq[Expression]) => {
        arity(es, "dedup_exact", 0, 0)
        plan(Dedup.dedupExact)
      }),
    ("dedup_minhash",
      tvfInfo("dedup_minhash", "dedup_minhash() - MinHash+LSH near-duplicate pairs over documents"),
      (es: Seq[Expression]) => {
        arity(es, "dedup_minhash", 0, 0)
        plan(Dedup.dedupMinhashLsh)
      }),
    ("dedup_simhash",
      tvfInfo("dedup_simhash", "dedup_simhash() - SimHash near-duplicate pairs over documents"),
      (es: Seq[Expression]) => {
        arity(es, "dedup_simhash", 0, 0)
        plan(Dedup.dedupSimhash)
      }),
    ("pq_search",
      tvfInfo("pq_search", "pq_search() - top-3 neighbors per query by product-quantized ADC cosine"),
      (es: Seq[Expression]) => {
        arity(es, "pq_search", 0, 0)
        plan(Pq.pqSearch)
      }),
    ("ivfpq_search",
      tvfInfo("ivfpq_search", "ivfpq_search() - top-3 neighbors per query from probed IVF cells scored by PQ codes"),
      (es: Seq[Expression]) => {
        arity(es, "ivfpq_search", 0, 0)
        plan(Ivfpq.ivfpqSearch)
      }),
    ("nsw_search",
      tvfInfo("nsw_search", "nsw_search() - top-3 neighbors per query by NSW graph beam search"),
      (es: Seq[Expression]) => {
        arity(es, "nsw_search", 0, 0)
        plan(Nsw.nswSearch)
      }),
    ("hnsw_search",
      tvfInfo("hnsw_search", "hnsw_search() - top-3 neighbors per query by 2-layer HNSW-style search"),
      (es: Seq[Expression]) => {
        arity(es, "hnsw_search", 0, 0)
        plan(Nsw.hnswSearch)
      }),
    ("nsw_nnd_search",
      tvfInfo("nsw_nnd_search", "nsw_nnd_search() - top-3 neighbors per query by beam search over the NN-descent-built graph"),
      (es: Seq[Expression]) => {
        arity(es, "nsw_nnd_search", 0, 0)
        plan(Nsw.nndSearch)
      }),
    ("ann_recall",
      tvfInfo("ann_recall", "ann_recall() - recall@3 of every approximate ANN method vs brute-force truth"),
      (es: Seq[Expression]) => {
        arity(es, "ann_recall", 0, 0)
        plan(AnnRecall.annRecall)
      }),
    ("ann_recall_clustered",
      tvfInfo("ann_recall_clustered", "ann_recall_clustered() - recall@3 on the derived clustered corpus (regime flip)"),
      (es: Seq[Expression]) => {
        arity(es, "ann_recall_clustered", 0, 0)
        plan(AnnRecall.annRecallClustered)
      }),
    ("nsw_bulk_search",
      tvfInfo("nsw_bulk_search", "nsw_bulk_search() - top-3 NSW neighbors for EVERY corpus node (DataFrame-frontier bulk search)"),
      (es: Seq[Expression]) => {
        arity(es, "nsw_bulk_search", 0, 0)
        plan(Nsw.bulkSearch)
      }),
    ("hnsw_bulk_search",
      tvfInfo("hnsw_bulk_search", "hnsw_bulk_search() - top-3 2-layer HNSW neighbors for EVERY corpus node"),
      (es: Seq[Expression]) => {
        arity(es, "hnsw_bulk_search", 0, 0)
        plan(Nsw.hnswBulkSearch)
      }),
    ("dedup_corpus_clean",
      tvfInfo("dedup_corpus_clean", "dedup_corpus_clean() - the deduplicated corpus: one surviving document per duplicate family"),
      (es: Seq[Expression]) => {
        arity(es, "dedup_corpus_clean", 0, 0)
        plan(Components.dedupCorpusClean)
      })
  )

  /** Register all engine functions (scalar + table) on a live session. */
  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
    tableBuilders.foreach { case (name, _, builder) =>
      spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
  }
}
