package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.VersionedState

/** The shared versioned-storage layer behind the streaming indexes:
  * retry-safe overwrite commits, atomic commit pointer, keep-last-K
  * retention. */
class VersionedStateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("keep-last-K retention deletes old versions; reads serve the latest") {
    val dir = Files.createTempDirectory("graft-vstate").toString
    val st = new VersionedState(spark, dir, keepVersions = 2)
    (0 to 4).foreach { v =>
      st.commit(v.toLong, Map("t" -> Seq((v, s"row$v")).toDF("version", "payload")))
    }
    assert(st.latest === Some(4L))
    // only the last K=2 versions survive on disk
    assert(st.versionsOf("t") === Seq(3L, 4L))
    assert(st.read("t").collect().map(_.getInt(0)).toSeq === Seq(4))
  }

  test("a retried commit of the same version overwrites instead of colliding") {
    val dir = Files.createTempDirectory("graft-vstate2").toString
    val st = new VersionedState(spark, dir, keepVersions = 3)
    st.commit(0L, Map("t" -> Seq(1).toDF("x")))
    // the foreachBatch-retry shape: same version written twice (the first
    // attempt is a partial write whose pointer never advanced, or a replay)
    st.commit(1L, Map("t" -> Seq(2).toDF("x")))
    st.commit(1L, Map("t" -> Seq(3).toDF("x")))
    assert(st.read("t").collect().map(_.getInt(0)).toSeq === Seq(3))
    assert(st.latest === Some(1L))
  }

  test("a fresh handle on the same dir resumes from the commit pointer") {
    val dir = Files.createTempDirectory("graft-vstate3").toString
    val st = new VersionedState(spark, dir, keepVersions = 3)
    st.commit(0L, Map("t" -> Seq(10).toDF("x")))
    st.commit(7L, Map("t" -> Seq(11).toDF("x"))) // sparse versions are fine
    val resumed = new VersionedState(spark, dir, keepVersions = 3)
    assert(resumed.latest === Some(7L))
    assert(resumed.read("t").collect().map(_.getInt(0)).toSeq === Seq(11))
  }

  test("pruning covers tables absent from later commits") {
    val dir = Files.createTempDirectory("graft-vstate4").toString
    val st = new VersionedState(spark, dir, keepVersions = 1)
    st.commit(0L, Map("a" -> Seq(1).toDF("x"), "b" -> Seq(1).toDF("x")))
    st.commit(1L, Map("a" -> Seq(2).toDF("x"))) // b not re-committed
    assert(st.versionsOf("a") === Seq(1L))
    assert(st.versionsOf("b") === Seq.empty, "stale b-v0 must be pruned too")
  }
}
