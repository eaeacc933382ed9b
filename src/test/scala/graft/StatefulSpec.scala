package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.ArrayExpressions
import graft.operators.{Dedup, Events}
import graft.streaming.StatefulSessions

class StatefulSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("flatMapGroupsWithState sessionization equals the SQL-window version") {
    val stateful = StatefulSessions.sessionize(spark, SparkTestSession.Sf0001)
      .collect()
      .map(s => (s.user_id, s.session_id, s.n_events, s.session_start, s.session_end))
      .toSet
    val sql = Events.sessionize(spark, SparkTestSession.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))
      .toSet
    assert(stateful.nonEmpty)
    assert(stateful === sql)
  }

  test("salted block pair join returns exactly the unsalted pair set") {
    val grams = Dedup.corpus(spark, SparkTestSession.Sf0001)
      .select(col("doc_id"), col("lang"), col("source"),
        ArrayExpressions.hashedWordNGrams(split(lower(col("text")), "\\s+"), 2).as("grams"))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("a_doc_id"), col("b_doc_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val unsalted = {
      val x = grams.select(col("doc_id").as("a_doc_id"), col("lang"), col("source"))
      val y = grams.select(col("doc_id").as("b_doc_id"), col("lang"), col("source"))
      pairSet(x.join(y, Seq("lang", "source")).filter(col("a_doc_id") < col("b_doc_id")))
    }
    val salted = pairSet(
      ArrayExpressions.saltedBlockPairJoin(grams, Seq("lang", "source"), "doc_id", k = 4))
    assert(salted === unsalted)
    assert(salted.nonEmpty)
  }
}
