package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.io.{CompatIO, Tables}
import graft.operators.{Relational, Similarity}

class SketchAndRoundTripSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("approx distinct sketch lands within its 2% target of exact") {
    // the HLL estimate itself (the query now outputs the exact count plus
    // the contract boolean, so bound the raw sketch here directly)
    val raw = Tables.lineitem(spark, SparkTestSession.Sf0001)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("a"),
        countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(raw.nonEmpty)
    raw.foreach { case (flag, a, n) =>
      assert(math.abs(a - n).toDouble / n < 0.05, s"$flag: approx $a vs exact $n")
    }
    // and the query's contract column must certify the same bound
    val rows = Relational.approxDistinct(spark, SparkTestSession.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(3),
      s"${r.getString(0)}: approx_within_5pct is false"))
  }

  test("games.json writer round-trips through the reader (S3 ↔ S1)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-rt").toString
    val games = Seq(
      (3L, 30L, "gamma", Some("g"), None: Option[String], Some(2L)),
      (1L, 10L, "alpha", None: Option[String], Some("gp"), None: Option[Long]))
      .toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount")
    CompatIO.writeGamesJson(games, s"$dir/out")
    val back = CompatIO.readGamesJson(spark, s"$dir/out")
    assert(back.orderBy("universeId").collect() === games.orderBy("universeId").collect())
  }

  test("top-k is a prefix of the larger top-k (SURVEY §5.4 property)") {
    val games = Tables.games(spark, SparkTestSession.Sf0001)
    val emb = Tables.gameEmbeddings(spark, SparkTestSession.Sf0001)
    val top5 = Similarity.similarSearchOn(games, emb, 42L, 5).collect().map(_.getLong(0)).toSeq
    val top10 = Similarity.similarSearchOn(games, emb, 42L, 10).collect().map(_.getLong(0)).toSeq
    assert(top10.take(5) === top5)
  }
}
