package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.streaming.StreamingIvfIndex

/** Incremental IVF maintenance: frozen-centroid assignment on arrival must
  * equal the batch assignment (same kernel, same centroids), and the drift
  * trigger must fire a retrain exactly when a batch stops fitting the
  * trained cells. */
class StreamingIvfIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("v", ArrayType(DoubleType))))

  private def vectors() =
    graft.io.Tables.embeddings(spark, SparkTestSession.Sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("in-distribution batches assign on frozen centroids, no retrain; matches batch assignment") {
    val dropDir = Files.createTempDirectory("graft-ivf-drops").toString
    val idxDir = Files.createTempDirectory("graft-ivf-idx").toString
    val ckptDir = Files.createTempDirectory("graft-ivf-ckpt").toString
    val e = vectors()
    val initial = e.filter(col("vec_id") < 300)
    e.filter(col("vec_id") >= 300 && col("vec_id") < 400)
      .coalesce(1).write.parquet(s"$dropDir/a")
    e.filter(col("vec_id") >= 400)
      .coalesce(1).write.parquet(s"$dropDir/b")

    val index = new StreamingIvfIndex(spark, idxDir, initial)
    val trainedCentroids = index.currentCentroids()
    val stream = spark.readStream.schema(vecSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dropDir/*")
    index.start(stream, ckptDir).awaitTermination(240000L)

    // same-distribution drops must NOT trigger retraining — ingest stays a
    // map-only assignment pass
    assert(index.retrains === 0)
    assert(index.currentAssigned().count() === e.count())
    // streamed assignment == one-shot assignment on the same centroids
    // (the kernel is deterministic; freezing centroids makes the incremental
    // path exactly reproducible)
    val streamed = index.currentAssigned()
      .select(col("vec_id"), col("cluster"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val oneShot = graft.operators.IvfKMeans.assign(e, trainedCentroids)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(streamed === oneShot)

    // restartability: a fresh handle on the same dir resumes from the
    // commit pointer — same centroids, no retrain from scratch
    val resumed = new StreamingIvfIndex(spark, idxDir, initial)
    assert(resumed.currentCentroids().toMap.view.mapValues(_.toSeq).toMap
      === index.currentCentroids().toMap.view.mapValues(_.toSeq).toMap)
    assert(resumed.currentAssigned().count() === e.count())
  }

  test("chronic drift: committed distortion counters cross the dial, maybeRetrain restores fit (round 16)") {
    val idxDir = Files.createTempDirectory("graft-ivf-idx3").toString
    val e = vectors()
    val initial = e.filter(col("vec_id") < 200)
    // the acute per-batch check is disabled (huge driftFactor): every
    // batch slips under it — exactly the failure shape the corpus-wide
    // dial exists for
    val index = new StreamingIvfIndex(spark, idxDir, initial,
      driftFactor = 1e9, retrainAtDistortionFactor = 1.2)
    assert(index.distortionSinceTrain() === 1.0,
      "at-train counters must read exactly the baseline")

    import org.apache.spark.sql.functions.expr
    val shifted = e.filter(col("vec_id") >= 200 && col("vec_id") < 1000)
      .select((col("vec_id") + 100000L).as("vec_id"),
        expr("transform(v, x -> x + 1.5D)").as("v"))
    (0 until 4).foreach { i =>
      index.insertBatch(shifted.filter(col("vec_id") % 4 === i), i.toLong)
    }
    assert(index.retrains === 0, "no single batch may trip the acute trigger")
    val drifted = index.distortionSinceTrain()
    assert(drifted > 1.2, s"cumulative distortion must cross the dial, got $drifted")
    // an already-committed version is a replay no-op even above the dial
    assert(index.maybeRetrain(2L).isEmpty)
    // the dial fires: full Lloyd retrain over the current corpus
    assert(index.maybeRetrain(10L).nonEmpty)
    assert(index.retrains === 1)
    val restored = index.distortionSinceTrain()
    assert(restored === 1.0, s"retrain must reset the counters to the new fit, got $restored")
    assert(index.distInfo()._1 === index.currentAssigned().count())
    // below the dial: no-op, no version burned
    val v = index.maybeRetrain(11L)
    assert(v.isEmpty)

    // takedowns subtract the leavers' share change-sized — the dial sees
    // cells hollowing out without any corpus scan
    val leavers = index.currentAssigned().select(col("vec_id"))
      .filter(col("vec_id") >= 100000L).limit(100)
    assert(index.removeBatch(leavers, 12L).nonEmpty)
    assert(index.distInfo()._1 === index.currentAssigned().count(),
      "counters must track the surviving corpus after a takedown")
  }

  test("an out-of-distribution batch trips the drift trigger and retrains on the grown corpus") {
    val dropDir = Files.createTempDirectory("graft-ivf-drops2").toString
    val idxDir = Files.createTempDirectory("graft-ivf-idx2").toString
    val ckptDir = Files.createTempDirectory("graft-ivf-ckpt2").toString
    val e = vectors()
    val initial = e.filter(col("vec_id") < 400)
    // shifted far outside the training distribution: every coordinate +5
    import org.apache.spark.sql.functions.expr
    val shifted = e.filter(col("vec_id") >= 400)
      .select((col("vec_id") + 100000L).as("vec_id"),
        expr("transform(v, x -> x + 5.0D)").as("v"))
    shifted.coalesce(1).write.parquet(s"$dropDir/a")

    val index = new StreamingIvfIndex(spark, idxDir, initial)
    val before = index.currentCentroids().toMap
    val stream = spark.readStream.schema(vecSchema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dropDir/*")
    index.start(stream, ckptDir).awaitTermination(240000L)

    assert(index.retrains === 1, "shifted batch must trip the drift trigger")
    // the retrain is a REAL Lloyd run on the grown corpus: identical to
    // training from scratch on the same rows
    val grown = index.currentAssigned().select(col("vec_id"), col("v"))
    val fromScratch = graft.operators.IvfKMeans.trainCentroids(grown).toMap
    val after = index.currentCentroids().toMap
    assert(after.keySet === fromScratch.keySet)
    after.foreach { case (c, v) =>
      assert(v.toSeq === fromScratch(c).toSeq, s"centroid $c differs from scratch training")
    }
    assert(after !== before)
  }
}
