package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def md5_32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d, 16)
  }

  test("asof align matches a naive per-frame scan and handles no-audio-yet frames") {
    val out = Multimodal.asofAlign(spark, SparkTestSession.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val docs = graft.io.Tables.documents(spark, SparkTestSession.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    var expectedRows = 0
    var sawNoAudio = false
    docs.foreach { case (id, text) =>
      val hv = md5_32(text)
      val audio = (0 to (hv % 5 + 1).toInt)
        .map(j => (j.toLong, j * 37L + md5_32(s"$id:$j") % 20))
      (0 to (hv % 7).toInt).foreach { i =>
        val fts = i * 40L
        // naive as-of: latest audio chunk at or before the frame time
        val m = audio.filter(_._2 <= fts).sortBy(_._2).lastOption
        val (ofts, oa, olag) = out((id, i.toLong))
        assert(ofts === fts, s"f_ts doc $id frame $i")
        m match {
          case Some((aIdx, aTs)) =>
            assert(oa === aIdx, s"a_idx doc $id frame $i")
            assert(olag === fts - aTs, s"lag doc $id frame $i")
            // lag is bounded by one audio period only while audio is still
            // arriving; after the last chunk it grows with the frame time
            assert(olag >= 0L)
          case None =>
            sawNoAudio = true
            assert(oa === -1L && olag === -1L, s"no-audio doc $id frame $i")
        }
        expectedRows += 1
      }
    }
    assert(out.size === expectedRows)
    assert(sawNoAudio, "fixture must exercise the frame-before-any-audio case")
  }

  test("asof align plans one partitioned window, no range-join explosion") {
    val plan = Multimodal.asofAlign(spark, SparkTestSession.Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"as-of must not plan a product join:\n$plan")
    assert("windowspecdefinition\\(doc_id".r.findAllIn(plan).nonEmpty,
      s"the carry window must partition by doc_id:\n$plan")
  }

  test("decode stub and frame sample stay deterministic on the fixture") {
    val d1 = Multimodal.decodeStub(spark, SparkTestSession.Sf0001).collect()
    val d2 = Multimodal.decodeStub(spark, SparkTestSession.Sf0001).collect()
    assert(d1.map(_.toString).sorted.toSeq === d2.map(_.toString).sorted.toSeq)
    val f = Multimodal.frameSample(spark, SparkTestSession.Sf0001).collect()
    assert(f.nonEmpty)
    // even frame indices only (stride-2 sampling), resize target pinned
    assert(f.forall(r => r.getInt(1) % 2 === 0))
    assert(f.forall(r => r.getInt(3) === 224 && r.getInt(4) === 224))
  }
}
