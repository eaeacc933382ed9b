package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.Tables
import graft.streaming.StreamingShardManifest

/** Streamed ≡ batch for the live shard manifest: the same mergeable
  * aggregation over the same projection, so the streamed report over the
  * ingested corpus must EQUAL `cur_shard_manifest`'s rows, arrival order
  * irrelevant, with state bounded at |shards| rows. */
class StreamingShardManifestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("manifest streams in complete mode, shard-bounded state, equals the batch manifest") {
    val drop = Files.createTempDirectory("graft-sman-in").toString
    val ckpt = Files.createTempDirectory("graft-sman-ckpt").toString
    val d = Tables.documents(spark, SparkTestSession.Sf0001)
      .select(col("doc_id"), col("text"))
    // two drops in a deliberately scrambled order — every manifest column
    // is commutative, so arrival order must not matter
    d.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(drop)
    d.filter(col("doc_id") % 2 === 0).coalesce(1).write.mode("append").parquet(drop)

    val in = StreamingShardManifest.readDocs(spark, drop)
    val q = StreamingShardManifest.startComplete(
      StreamingShardManifest.manifestStream(in), "sman", ckpt, Trigger.AvailableNow())
    assert(q.awaitTermination(120000L), "stream did not drain within 120s")

    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val streamed = canon(spark.sql(
      "SELECT shard, n_docs, n_tokens, min_doc_id, max_doc_id, content_xor FROM sman")
      .collect())
    // the oracle-checked batch query itself is the reference
    val batch = canon(
      graft.operators.Curation.shardManifest(spark, SparkTestSession.Sf0001).collect())
    assert(streamed.length === 8)
    assert(streamed === batch, "streamed manifest must equal the batch manifest")

    // state = one row per shard, while the corpus carries ~60x the rows
    val stateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(stateRows.nonEmpty && stateRows.max <= 8L,
      s"manifest state must stay shard-bounded, saw ${stateRows.toSeq}")
    q.stop()
  }
}
