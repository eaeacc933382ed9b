package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.streaming.StreamingNswIndex

/** Incremental NSW index maintenance: micro-batches of new vectors are
  * inserted by search-then-connect, and the grown graph must search as
  * well as a from-scratch batch rebuild over the same final corpus. */
class StreamingNswIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType))))

  test("incrementally grown graph reaches batch-rebuilt recall on the fixture") {
    val dropDir = Files.createTempDirectory("graft-nsw-drops").toString
    val idxDir = Files.createTempDirectory("graft-nsw-idx").toString
    val ckptDir = Files.createTempDirectory("graft-nsw-ckpt").toString

    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // initial corpus: first 300 ids (contains the entry nodes and the 5
    // fixture queries); two micro-batch drops grow it to the full corpus
    val initial = e.filter(col("vec_id") < 300)
    e.filter(col("vec_id") >= 300 && col("vec_id") < 400)
      .coalesce(1).write.parquet(s"$dropDir/a")
    e.filter(col("vec_id") >= 400)
      .coalesce(1).write.parquet(s"$dropDir/b")

    val index = new StreamingNswIndex(spark, idxDir, initial)
    val stream = spark.readStream.schema(vecSchema)
      .option("maxFilesPerTrigger", 1) // one drop per micro-batch
      .parquet(s"$dropDir/*")
    index.start(stream, ckptDir).awaitTermination(240000L)

    val n = e.count()
    assert(index.currentVectors().count() === n, "all drops inserted")
    // every inserted node is connected: it has out-edges in the k-NN state
    val knownSrcs = index.currentKnn().select("src").distinct()
      .collect().map(_.getLong(0)).toSet
    assert((300L until n).forall(knownSrcs.contains), "every new node got edges")

    // brute-force truth for the 5 fixture queries
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val truth = (0L until 5L).flatMap { q =>
      vecs.collect { case (o, w) if o != q => (o, cos(vecs(q), w)) }
        .toSeq.sortBy { case (o, c) => (-c, o) }.take(3).map(n => (q, n._1))
    }.toSet
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.count(r => truth.contains((r.getLong(0), r.getLong(1)))).toDouble / truth.size

    val grown = recallOf(index.search().collect())
    val rebuilt = recallOf(graft.operators.Nsw.searchWithEdges(
      e, graft.operators.Nsw.edgesOn(e)).collect())
    info(s"recall@3: incrementally grown $grown vs batch rebuilt $rebuilt")
    // the insertion-built graph must reach the rebuild's recall band — one
    // sample (1/15) of slack for the differing edge sets (search-found vs
    // LSH-found k-NN; long links identical, recomputed per version)
    assert(grown >= rebuilt - 1.0 / 15.0 - 1e-9,
      s"incrementally grown graph recall $grown vs rebuilt $rebuilt")

    // 2-LAYER: the maintained routing layer (deterministic vec_id % 8
    // membership, inserted by the same search-then-connect over the
    // sample graph) must reach the batch-rebuilt hierarchy's recall
    val knn1Srcs = index.currentKnn1().select("src").distinct()
      .collect().map(_.getLong(0)).toSet
    assert((304L until n by 8).forall(knn1Srcs.contains),
      "every new sample member got routing-layer edges")
    val e1 = e.filter(col("vec_id") % 8 === 0)
    val grown2 = recallOf(index.search2().collect())
    val rebuilt2 = recallOf(graft.operators.Nsw.hnswWithEdges(
      e, graft.operators.Nsw.edgesOn(e1, 4, 8),
      graft.operators.Nsw.edgesOn(e)).collect())
    info(s"2-layer recall@3: grown $grown2 vs batch rebuilt $rebuilt2")
    assert(grown2 >= rebuilt2 - 1.0 / 15.0 - 1e-9,
      s"incrementally grown hierarchy recall $grown2 vs rebuilt $rebuilt2")

    // the round-12 storage refit's write shape, pinned LAST so the recall
    // comparisons above see exactly the streamed corpus: a replayed batch
    // is a no-op (None), and a genuinely new batch's commit is
    // BUCKET-PRUNED — it appends only into the buckets the fresh ids hash
    // to, writing a strict subset of the state's bytes (the postings
    // maintainer's measured claim, pinned here for the graph family)
    assert(index.insertBatch(e.filter(col("vec_id") >= 400), 1L) === None,
      "replayed batch must be a no-op")
    val extra = e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"), col("v"))
    val st = index.insertBatch(extra, 2L).get
    assert(st.writtenBytes < st.stateBytes,
      s"append commit must be change-sized: ${st.writtenBytes}/${st.stateBytes}")
    assert(st.touchedBuckets < st.totalBuckets,
      s"append commit must be bucket-pruned: ${st.touchedBuckets}/${st.totalBuckets}")

    // TAKEDOWN (round-13): remove a served node — bucket-pruned commit,
    // and the beam can never visit or return it again (every serve path
    // scores through an inner join against the vectors table, so
    // survivors' dangling edges to it are harmless)
    val victim = index.search().filter(col("query_id") === 0L)
      .orderBy(col("rank")).select(col("neighbor_id")).head().getLong(0)
    val dst = index.removeBatch(Seq(victim).toDF("vec_id"), 4L).get
    assert(dst.touchedBuckets < dst.totalBuckets,
      s"takedown must be bucket-pruned: ${dst.touchedBuckets}/${dst.totalBuckets}")
    assert(index.currentVectors().filter(col("vec_id") === victim).isEmpty)
    assert(index.search().filter(col("neighbor_id") === victim).isEmpty,
      "a removed vector must stop being served")
    assert(index.search2().filter(col("neighbor_id") === victim).isEmpty,
      "a removed vector must stop being served by the 2-layer search")

    // EDGE REPAIR (round-14, verdict r13 #4): take down a node that IS a
    // stored adjacency target — repair re-links exactly the srcs that
    // pointed at it and nothing else, the dangling references disappear
    // from state, and a graph with nothing dangling burns no version
    val victim2 = index.currentKnn()
      .groupBy(col("dst")).count().orderBy(org.apache.spark.sql.functions.desc("count"))
      .head().getLong(0)
    index.removeBatch(Seq(victim2).toDF("vec_id"), 5L)
    val survivorIds = index.currentVectors().select("vec_id")
      .collect().map(_.getLong(0)).toSet
    // same definition repairBatch uses: srcs with ANY dst no longer in
    // the vectors table (victim2's danglers, plus any the earlier
    // takedown left behind)
    val danglingSrcs = index.currentKnn()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => !survivorIds.contains(p._2)).map(_._1).toSet
    assert(danglingSrcs.nonEmpty, "the chosen victim had in-edges")
    val preRepair = index.currentKnn()
      .filter(!col("src").isin(danglingSrcs.toSeq.map(java.lang.Long.valueOf): _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rst = index.repairBatch(6L).get
    assert(rst.touchedBuckets < rst.totalBuckets,
      s"repair must be bucket-pruned: ${rst.touchedBuckets}/${rst.totalBuckets}")
    val post = index.currentKnn().collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(post.forall(p => survivorIds.contains(p._2)),
      "repair removes every dangling reference")
    assert(!post.exists(p => p._1 == p._2), "repair never links a node to itself")
    assert(post.filterNot(p => danglingSrcs.contains(p._1)).toSet === preRepair,
      "repair replaces ONLY the affected srcs' rows")
    assert(danglingSrcs.forall(s => post.exists(_._1 == s)),
      "every affected src is re-linked")
    // replay no-op, and a clean graph doesn't burn a version
    assert(index.repairBatch(6L) === None)
    assert(index.repairBatch(7L) === None,
      "no dangling edges -> no version burned")
  }

  test("rebuild policy: the deleted-fraction dial triggers a retrain and resets (round 15)") {
    val idxDir = Files.createTempDirectory("graft-nsw-policy").toString
    val e = graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val n = e.count()
    val index = new StreamingNswIndex(spark, idxDir, e,
      rebuildAtDeletedFraction = 0.3)
    assert(index.deletedFractionSinceBuild() === 0.0)

    // first takedown: 20% of the corpus — BELOW the dial, no retrain
    val del1 = e.filter(col("vec_id") % 5 === 1).select(col("vec_id"))
    val nDel1 = del1.count()
    assert(index.removeBatch(del1, 1L).nonEmpty)
    assert(math.abs(index.deletedFractionSinceBuild() - nDel1.toDouble / n) < 1e-9,
      "the policy counter must track exactly what left")
    assert(index.maybeRebuild(2L).isEmpty, "below the dial: no retrain")
    // ...and it burned no version: version 2 is still claimable
    val del2 = e.filter(col("vec_id") % 5 === 2).select(col("vec_id"))
    val nDel2 = del2.count()
    assert(index.removeBatch(del2, 2L).nonEmpty,
      "a declined maybeRebuild must not burn its version")

    // cumulative 40% — ABOVE the dial: retrain fires, counter resets
    assert(index.deletedFractionSinceBuild() >= 0.3)
    assert(index.maybeRebuild(3L).nonEmpty, "crossing the dial must retrain")
    assert(index.deletedFractionSinceBuild() === 0.0,
      "a rebuild resets the policy baseline to the survivor corpus")
    assert(index.maybeRebuild(4L).isEmpty, "fresh build: nothing to do")
    assert(index.currentVectors().count() === n - nDel1 - nDel2)
    // the rebuilt graph is dangling-free: repair finds nothing to do
    assert(index.repairBatch(4L).isEmpty)
    // deleted ids are not served; survivors are searchable
    assert(index.search().filter(col("neighbor_id") % 5 === 1).isEmpty)
    assert(index.search().count() > 0)
  }
}
