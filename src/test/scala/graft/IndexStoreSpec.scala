package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.IndexStore

/** The persisted ANN-artifact store behind the index build/serve split:
  * read-through builds, forced rebuilds, exact driver-object round-trips,
  * and stale-corpus pruning. */
class IndexStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** A tiny corpus dir with an embeddings.parquet for fingerprinting. */
  private def mkCorpus(parent: String, seed: Long): String = {
    val dir = s"$parent/graft-iss-corp"
    Seq((seed, Seq(1.0f, 2.0f)), (seed + 1, Seq(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("readOrBuild builds once; rebuild overwrites; later reads see the rebuild") {
    val dir = mkCorpus(Files.createTempDirectory("graft-iss1").toString, 0L)
    var builds = 0
    def edges(a: Long, b: Long) = { builds += 1; Seq((a, b)).toDF("src", "dst") }
    val first = IndexStore.readOrBuild(spark, dir, "spec-art")(edges(1L, 2L)).collect()
    assert(builds === 1 && first.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    IndexStore.readOrBuild(spark, dir, "spec-art")(edges(9L, 9L)).collect()
    assert(builds === 1, "second readOrBuild must serve the committed artifact")
    IndexStore.rebuild(spark, dir, "spec-art")(edges(3L, 4L))
    val after = IndexStore.readOrBuild(spark, dir, "spec-art")(edges(9L, 9L)).collect()
    assert(after.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((3L, 4L)))
  }

  test("centroids and codebooks round-trip bit-exactly and serve without rebuilding") {
    val dir = mkCorpus(Files.createTempDirectory("graft-iss2").toString, 10L)
    // awkward doubles on purpose: parquet must round-trip the exact bits
    val cents = Seq(
      (0, Array(1.0 / 3.0, math.Pi, 1e300)),
      (2, Array(-2e-17, 0.1 + 0.2, -0.0)))
    val stored = IndexStore.rebuildCentroids(spark, dir, "spec-cents")(cents)
    assert(stored.map(_._1) === Seq(0, 2))
    stored.zip(cents).foreach { case ((_, got), (_, want)) =>
      assert(got.toSeq.map(java.lang.Double.doubleToRawLongBits)
        === want.toSeq.map(java.lang.Double.doubleToRawLongBits))
    }
    val served = IndexStore.readOrBuildCentroids(spark, dir, "spec-cents")(
      fail("served centroids must not retrain"))
    assert(served.map(_._2.toSeq) === cents.map(_._2.toSeq))

    val cbs = Seq(
      Seq((0, Array(0.5, -0.25)), (1, Array(1.5, 2.5))),
      Seq((0, Array(-1.0, 1e-200))))
    IndexStore.rebuildCodebooks(spark, dir, "spec-cbs")(cbs)
    val back = IndexStore.readOrBuildCodebooks(spark, dir, "spec-cbs")(
      fail("served codebooks must not retrain"))
    assert(back.map(_.map { case (c, v) => (c, v.toSeq) })
      === cbs.map(_.map { case (c, v) => (c, v.toSeq) }))
  }

  test("artifacts of a superseded corpus fingerprint are pruned on write") {
    val dirA = mkCorpus(Files.createTempDirectory("graft-iss3a").toString, 20L)
    val dirB = mkCorpus(Files.createTempDirectory("graft-iss3b").toString, 30L)
    IndexStore.rebuild(spark, dirA, "spec-art")(Seq((1L, 1L)).toDF("src", "dst"))
    val treeA = new java.io.File(IndexStore.artifactPath(spark, dirA, "spec-art")).getParentFile
    assert(treeA.exists, "corpus A's artifact tree must exist after its build")
    // same basename, different data → different fingerprint: writing for B
    // must retire A's whole tree (the superseded-corpus sweep)
    IndexStore.rebuild(spark, dirB, "spec-art")(Seq((2L, 2L)).toDF("src", "dst"))
    assert(!treeA.exists, "superseded fingerprint tree must be pruned")
    val servedB = IndexStore.readOrBuild(spark, dirB, "spec-art")(
      fail("B's committed artifact must serve")).collect()
    assert(servedB.map(_.getLong(0)).toSeq === Seq(2L))
  }
}
