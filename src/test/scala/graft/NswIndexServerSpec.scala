package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.streaming.{NswIndexServer, StreamingNswIndex}

/** The serve side of the incremental index: a long-running answerer must
  * pick up newly committed index versions mid-stream (pointer watch), and
  * must NOT reload anything while the pointer is unmoved. */
class NswIndexServerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val querySchema = StructType(Seq(
    StructField("query_id", LongType),
    StructField("qv", ArrayType(DoubleType))))

  test("server swaps in committed versions mid-stream and is idle otherwise") {
    val idxDir = Files.createTempDirectory("graft-srv-idx").toString

    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val index = new StreamingNswIndex(spark, idxDir, e)
    val server = new NswIndexServer(spark, idxDir)

    // query with an exact copy of corpus vector 2 (query id outside the
    // corpus id range so seed self-exclusion never triggers)
    val v2 = e.filter(col("vec_id") === 2).select(col("v"))
      .head().getSeq[Double](0).toArray
    val queries = Seq((1000000L, v2.toSeq)).toDF("query_id", "qv")

    val before = server.answer(queries).collect().sortBy(_.getLong(2))
    assert(server.refreshCount === 1L, "first answer loads the index once")
    assert(server.servedVersion === Some(0L))
    assert(before.head.getLong(1) === 2L && before.head.getDouble(3) === 1.0,
      "the copied vector's original is the top neighbor")
    assert(!before.map(_.getLong(1)).contains(900000L))

    server.answer(queries)
    assert(server.refreshCount === 1L, "unmoved pointer must not reload")

    // writer commits a new version: a brand-new vector identical to the query
    index.insertBatch(Seq((900000L, v2.toSeq)).toDF("vec_id", "v"), 0L)
    val after = server.answer(queries).collect().sortBy(_.getLong(2))
    assert(server.refreshCount === 2L, "moved pointer triggers exactly one reload")
    assert(server.servedVersion === Some(1L))
    val topIds = after.take(2).map(_.getLong(1)).toSet
    assert(topIds === Set(2L, 900000L),
      s"served results must include the newly indexed vector, got ${topIds.mkString(",")}")
    assert(after.take(2).forall(_.getDouble(3) === 1.0))
  }

  test("streaming request batches append answers tagged with their batch id") {
    val idxDir = Files.createTempDirectory("graft-srv-idx2").toString
    val reqDir = Files.createTempDirectory("graft-srv-req").toString
    val ckptDir = Files.createTempDirectory("graft-srv-ckpt").toString
    val outDir = Files.createTempDirectory("graft-srv-out").toString + "/answers"

    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    new StreamingNswIndex(spark, idxDir, e) // commits v0
    val server = new NswIndexServer(spark, idxDir)

    // two request drops → two micro-batches
    val qs = e.filter(col("vec_id") < 4)
      .select((col("vec_id") + 2000000L).as("query_id"), col("v").as("qv"))
    qs.filter(col("query_id") < 2000002L).coalesce(1).write.parquet(s"$reqDir/a")
    qs.filter(col("query_id") >= 2000002L).coalesce(1).write.parquet(s"$reqDir/b")

    val stream = spark.readStream.schema(querySchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$reqDir/*")
    server.start(stream, ckptDir, outDir).awaitTermination(240000L)

    val out = spark.read.parquet(outDir)
    assert(out.select("batch_id").distinct().count() === 2L)
    assert(out.select("query_id").distinct().count() === 4L)
    // each query got a full top-k and its rank-1 neighbor is its source
    // vector (the query IS a corpus vector under a shifted id)
    val top1 = out.filter(col("rank") === 1).collect()
    assert(top1.length === 4)
    assert(top1.forall(r => r.getLong(1) === r.getLong(0) - 2000000L))
    assert(server.refreshCount === 1L, "no commits between batches → one load")
  }

  test("with a quantizer attached, serving routes and matches the batch routed search") {
    import graft.operators.{IvfKMeans, Nsw}
    import graft.streaming.{BucketedAppendState, StreamingIvfIndex}
    val idxDir = Files.createTempDirectory("graft-srv-idx3").toString
    val qDir = Files.createTempDirectory("graft-srv-ivf").toString

    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    new StreamingNswIndex(spark, idxDir, e)  // graph v0
    new StreamingIvfIndex(spark, qDir, e)    // centroids v0
    val server = new NswIndexServer(spark, idxDir, Some(qDir))

    // corpus-member queries (the batch routed search's own query frame)
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val got = server.answer(q)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3))

    // batch reference over the SAME served graph + quantizer artifacts
    val vs = new BucketedAppendState(spark, idxDir)
    val vectors = vs.read("vectors")
    val edges = Nsw.symmetrizeWithLongLinks(vectors, vs.read("knn"), 1)
    val cents = new BucketedAppendState(spark, qDir).read("centroids").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toSeq
    val assigned = IvfKMeans.assign(vectors, cents)
    val n = vectors.count()
    val want = Nsw.searchWithRoutedEntries(vectors, edges, cents, assigned,
        Nsw.sizedHops(n), Nsw.sizedBeam(n), Nsw.sizedProbeCells(n))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._3))

    assert(got.nonEmpty && got.toSeq === want.toSeq,
      "streaming routed serving must be row-identical to the batch routed search")

    // no quantizer commit between answers → assignment is not recomputed
    val before = server.refreshCount
    server.answer(q)
    assert(server.refreshCount === before,
      "unmoved pointers must not recompute routing state")
  }
}
