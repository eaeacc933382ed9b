package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Merge
import graft.streaming.BucketedAppendState

/** Direct pins for the maintainers' round-12 storage layer (the
  * maintainer specs exercise it end-to-end; these isolate the commit
  * protocol itself): append semantics, replay no-op, small-table
  * versioning, retention sweep, and both crash windows. */
class BucketedAppendStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(ids: Seq[Long]) =
    ids.map(id => (id, Seq(id.toDouble, 1.0))).toDF("vec_id", "v")
  private def cents(tag: String) =
    Seq((0, Seq(0.0, 1.0), tag)).toDF("cluster", "cv", "tag")

  test("append commits read as the union; replay is a no-op; small tables version") {
    val root = Files.createTempDirectory("bas-spec").toString
    val st = new BucketedAppendState(spark, root, buckets = 8,
      keyed = Map("vectors" -> "vec_id"), keepVersions = 8)
    st.commitFull(0L, Map("vectors" -> vecs(0L until 20L), "meta" -> cents("v0")))
    assert(st.latest === Some(0L))
    assert(st.read("vectors").count() === 20)

    val stats = st.commitAppend(1L,
      Map("vectors" -> vecs(100L until 105L), "meta" -> cents("v1"))).get
    assert(st.read("vectors").as[(Long, Seq[Double])].collect().map(_._1).toSet
      === ((0L until 20L) ++ (100L until 105L)).toSet)
    // change-sized write: a 5-row delta touches at most 5 buckets
    assert(stats.touchedBuckets <= 5 && stats.touchedBuckets > 0)
    assert(stats.writtenBytes < stats.stateBytes)
    // small table is per-version: each read surfaces its own commit
    assert(st.readAt("meta", 0L).select("tag").head().getString(0) === "v0")
    assert(st.readAt("meta", 1L).select("tag").head().getString(0) === "v1")
    // replay of a committed version: None, nothing changes
    assert(st.commitAppend(1L, Map("vectors" -> vecs(Seq(999L)))) === None)
    assert(st.latest === Some(1L))
    assert(st.read("vectors").count() === 25)
  }

  test("retention sweeps expired manifests, generations, and small dirs") {
    val root = Files.createTempDirectory("bas-ret").toString
    val st = new BucketedAppendState(spark, root, buckets = 4,
      keyed = Map("vectors" -> "vec_id"), keepVersions = 2)
    st.commitFull(0L, Map("vectors" -> vecs(0L until 10L), "meta" -> cents("v0")))
    st.commitAppend(1L, Map("vectors" -> vecs(Seq(50L)), "meta" -> cents("v1")))
    st.commitAppend(2L, Map("vectors" -> vecs(Seq(51L)), "meta" -> cents("v2")))
    assert(st.committedVersions === Seq(1L, 2L), "v0 expired under keep-2")
    val err = intercept[IllegalArgumentException](st.readAt("vectors", 0L))
    assert(err.getMessage.contains("expired"))
    // retained versions stay fully readable — including generations only
    // the old manifest referenced that the new ones carried forward
    assert(st.readAt("vectors", 1L).count() === 11)
    assert(st.readAt("vectors", 2L).count() === 12)
    assert(st.readAt("meta", 1L).select("tag").head().getString(0) === "v1")
    assert(!new java.io.File(s"$root/meta-v0").exists, "expired small dir swept")
  }

  test("crash on either side of the manifest rename recovers exactly-once") {
    val root = Files.createTempDirectory("bas-crash").toString
    val boom = new RuntimeException("crash")
    def stateWith(hooks: Merge.IncHooks) = new BucketedAppendState(spark, root,
      buckets = 4, keyed = Map("vectors" -> "vec_id"), keepVersions = 8,
      hooks = hooks)
    stateWith(Merge.IncHooks.none)
      .commitFull(0L, Map("vectors" -> vecs(0L until 10L)))

    // BEFORE the rename: gens written, nothing committed — state reads v0
    val pre = stateWith(Merge.IncHooks(beforeCommit = v => if (v == 1) throw boom))
    assert(intercept[RuntimeException](
      pre.commitAppend(1L, Map("vectors" -> vecs(Seq(50L))))) eq boom)
    assert(pre.latest === Some(0L))
    assert(pre.read("vectors").count() === 10)
    // the retry clears the uncommitted leftovers and lands cleanly
    val clean = stateWith(Merge.IncHooks.none)
    assert(clean.commitAppend(1L, Map("vectors" -> vecs(Seq(50L)))).isDefined)
    assert(clean.read("vectors").count() === 11)

    // AFTER the rename: committed, crash pre-ack — the replay is a no-op
    val post = stateWith(Merge.IncHooks(afterCommit = v => if (v == 2) throw boom))
    assert(intercept[RuntimeException](
      post.commitAppend(2L, Map("vectors" -> vecs(Seq(51L))))) eq boom)
    assert(post.latest === Some(2L))
    assert(post.commitAppend(2L, Map("vectors" -> vecs(Seq(51L)))) === None)
    assert(post.read("vectors").count() === 12)
  }
}
