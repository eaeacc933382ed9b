package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Quality, Similarity, TextSearch}
import graft.io.Tables

/** The spark.sql-only user surface: whole operators registered as table
  * functions ([[GraftExtensions]] tableBuilders). Each case runs an
  * operator purely through `spark.sql` and asserts the exact rows the
  * DataFrame API produces — the TVF must be the same plan, not a sibling
  * implementation. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf0001

  private def install(): Unit = {
    GraftExtensions.register(spark)
    spark.conf.set(GraftExtensions.DataDirKey, dir)
  }

  private def sameRows(sql: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val viaSql = spark.sql(sql).collect().toSeq
    val viaApi = df.collect().toSeq
    assert(viaSql.nonEmpty, s"vacuous comparison — $sql returned no rows")
    assert(viaSql === viaApi)
  }

  test("similar_search(id, k) matches the DataFrame API") {
    install()
    sameRows(
      "SELECT * FROM similar_search(42, 10)",
      Similarity.similarSearchOn(
        Tables.games(spark, dir), Tables.gameEmbeddings(spark, dir), 42L, 10))
  }

  test("similar_search(id) defaults k to the endpoint's 10") {
    install()
    assert(spark.sql("SELECT * FROM similar_search(42)").count() === 10)
  }

  test("vector_search(k) matches the DataFrame API") {
    install()
    sameRows(
      "SELECT * FROM vector_search(7)",
      Similarity.vectorSearchOn(
        Tables.games(spark, dir), Tables.gameEmbeddings(spark, dir),
        Similarity.defaultQueryVector, 7))
  }

  test("text_search(query, limit) matches the DataFrame API") {
    install()
    sameRows(
      "SELECT * FROM text_search('merge', 10)",
      TextSearch.search(Tables.games(spark, dir), "merge", 10))
  }

  test("graft_stats() and games_list() match the DataFrame API") {
    install()
    sameRows("SELECT * FROM graft_stats()", Quality.stats(spark, dir))
    sameRows("SELECT * FROM games_list()", Quality.gamesList(spark, dir))
  }

  test("dedup TVFs match the DataFrame API") {
    install()
    sameRows("SELECT * FROM dedup_exact()", Dedup.dedupExact(spark, dir))
    sameRows("SELECT * FROM dedup_simhash()", Dedup.dedupSimhash(spark, dir))
    graft.tools.CacheRegistry.release()
    sameRows("SELECT * FROM dedup_minhash()", Dedup.dedupMinhashLsh(spark, dir))
    graft.tools.CacheRegistry.release()
  }

  test("ANN TVFs match the DataFrame API") {
    install()
    sameRows("SELECT * FROM pq_search()", graft.operators.Pq.pqSearch(spark, dir))
    sameRows("SELECT * FROM ivfpq_search()", graft.operators.Ivfpq.ivfpqSearch(spark, dir))
    sameRows("SELECT * FROM nsw_search()", graft.operators.Nsw.nswSearch(spark, dir))
    sameRows("SELECT * FROM hnsw_search()", graft.operators.Nsw.hnswSearch(spark, dir))
    // the whole recall harness as one SQL table
    sameRows("SELECT * FROM ann_recall()", graft.operators.AnnRecall.annRecall(spark, dir))
    sameRows("SELECT * FROM ann_recall_clustered()",
      graft.operators.AnnRecall.annRecallClustered(spark, dir))
    sameRows("SELECT * FROM nsw_bulk_search()", graft.operators.Nsw.bulkSearch(spark, dir))
    sameRows("SELECT * FROM hnsw_bulk_search()", graft.operators.Nsw.hnswBulkSearch(spark, dir))
    sameRows("SELECT * FROM dedup_corpus_clean()",
      graft.operators.Components.dedupCorpusClean(spark, dir))
  }

  test("TVFs compose with ordinary SQL around them") {
    install()
    val n = spark.sql(
      """SELECT matchType, count(*) AS c
        |FROM text_search('Merge', 10)
        |GROUP BY matchType""".stripMargin).collect().map(_.getLong(1)).sum
    assert(n === 10)
  }

  test("a missing spark.graft.dataDir fails with a clear message") {
    GraftExtensions.register(spark)
    val saved = spark.conf.getOption(GraftExtensions.DataDirKey)
    spark.conf.unset(GraftExtensions.DataDirKey)
    try {
      val e = intercept[Exception](spark.sql("SELECT * FROM games_list()").collect())
      assert(e.getMessage.contains(GraftExtensions.DataDirKey) ||
        Option(e.getCause).exists(_.getMessage.contains(GraftExtensions.DataDirKey)))
    } finally saved.foreach(spark.conf.set(GraftExtensions.DataDirKey, _))
  }
}
