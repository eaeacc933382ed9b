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

  test("real-decode phash: golden signatures and banded near-dup pairing over the blob layout (round 16)") {
    // PNG fixtures in the reference layout <dir>/<id>/icon.png, written
    // with a real codec (javax.imageio) — the decode under test reads
    // them back. Golden signatures are ANALYTIC, not recorded: a strictly
    // left-to-right-brightening image sets every gradient bit, a
    // darkening one sets none.
    val dir = java.nio.file.Files.createTempDirectory("phash-images")
    def writePng(id: Long, px: (Int, Int) => Int, w: Int = 64, h: Int = 48): Unit = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = px(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val d = dir.resolve(id.toString)
      java.nio.file.Files.createDirectories(d)
      javax.imageio.ImageIO.write(img, "png", d.resolve("icon.png").toFile)
    }
    writePng(1, (x, _) => x * 4)        // monotone brighter → all 60 bits
    writePng(2, (x, _) => 255 - x * 4)  // monotone darker → zero bits
    // near-dup pair: identical texture, ONE pixel blown out — at most the
    // one affected cell's gradient flips, so Hamming ≤ 1 and at least 3
    // of the 4 bands collide exactly
    def tex(x: Int, y: Int) = ((x * 37 + y * 101) ^ (x * y)) & 0xff
    writePng(10, tex)
    writePng(11, (x, y) => if (x == 0 && y == 0) 255 else tex(x, y))
    writePng(20, (x, y) => ((x * 13) ^ (y * 7 * 29)) & 0xff) // unrelated

    def blob(id: Long): Array[Byte] =
      java.nio.file.Files.readAllBytes(dir.resolve(s"$id/icon.png"))
    assert(Multimodal.dHashOfImage(blob(1)).contains((1L << 60) - 1),
      "monotone-brightening image must set every gradient bit")
    assert(Multimodal.dHashOfImage(blob(2)).contains(0L),
      "monotone-darkening image must set no gradient bit")
    // corrupt bytes yield no row — never a poisoned band bucket
    assert(Multimodal.dHashOfImage("not a png".getBytes("UTF-8")).isEmpty)

    // decode is bit-stable across calls (the golden property a perceptual
    // signature needs; box-average, no platform-dependent scaler)
    assert(Multimodal.dHashOfImage(blob(10)) === Multimodal.dHashOfImage(blob(10)))

    // the banded pipeline over the REAL decode: same banding + verify as
    // the oracle-gated stub query, candidates from (band, chunk)
    // equi-joins only
    val pairs = Multimodal.phashDedupImages(spark, dir.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((10L, 11L)), s"near-dup pair must surface: $pairs")
    assert(pairs((10L, 11L)) <= 1, "one blown-out pixel is at most one gradient flip")
    assert(!pairs.keySet.exists { case (a, b) =>
      Set(a, b).contains(20L) || (Set(a, b) == Set(1L, 2L)) },
      s"unrelated/opposite images must not pair: $pairs")
    graft.tools.CacheRegistry.release(blocking = true)
  }

  test("video dedup: clip verdicts from per-frame signatures (round 16)") {
    import org.apache.spark.sql.functions._
    val out = Multimodal.videoDedup(spark, SparkTestSession.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getDouble(5)))
      .toMap
    graft.tools.CacheRegistry.release(blocking = true)
    val nFrames = graft.operators.Dedup.corpus(spark, SparkTestSession.Sf0001)
      .select(col("doc_id"),
        expr("cast(ceil(size(split(lower(text), '\\\\s+')) / 16.0) as int)").as("nf"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val baseIds = nFrames.keySet.filter(_ < 100000L)
    // every planted exact re-encode matches ALL its frames
    val exactPlanted = baseIds.filter(_ % 4 == 0)
    assert(exactPlanted.nonEmpty)
    exactPlanted.foreach { id =>
      val (na, nb, m, frac) = out.getOrElse((id, id + 100000L),
        fail(s"exact pair $id missing"))
      assert(frac === 1.0 && m === math.min(na, nb), s"exact pair $id: $m/$na/$nb")
    }
    // tail-edited near-dups: every clip with a second (unedited) frame is
    // caught; 1-frame clips are edited in their only frame, so whether
    // they match depends on the edit's Hamming distance — no assertion
    val nearPlanted = baseIds.filter(_ % 5 == 0)
    nearPlanted.foreach { id =>
      if (nFrames(id) >= 2)
        assert(out.contains((id, id + 200000L)), s"near pair $id missing (nf=${nFrames(id)})")
    }
    // verdict-threshold and ordering invariants
    assert(out.keys.forall { case (a, b) => a < b })
    assert(out.values.forall { case (na, nb, m, frac) =>
      frac >= 0.5 && m >= 1 && m <= math.min(na, nb) })
  }

  test("video dedup plans banded equi-joins only, no all-pairs") {
    val plan = Multimodal.videoDedup(spark, SparkTestSession.Sf0001)
      .queryExecution.executedPlan.toString
    graft.tools.CacheRegistry.release(blocking = true)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"video dedup must never plan a product join:\n$plan")
  }

  test("audio dedup: offset voting attributes shifted copies with the shift (round 16)") {
    val out = Multimodal.audioDedup(spark, SparkTestSession.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5), r.getDouble(6)))
      .toMap
    graft.tools.CacheRegistry.release(blocking = true)
    val docIds = graft.io.Tables.documents(spark, SparkTestSession.Sf0001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // exact re-encodes: full agreement at offset 0
    docIds.filter(_ % 4 == 0).foreach { id =>
      val (na, nb, off, m, frac) = out.getOrElse((id, id + 100000L),
        fail(s"exact pair $id missing"))
      assert(off === 0 && frac === 1.0 && m === math.min(na, nb),
        s"exact pair $id: off=$off m=$m/$na/$nb")
    }
    // PREFIX-SHIFTED copies (the 4-token intro = exactly one hop): caught,
    // and the reported alignment IS the shift — the evidence a set-based
    // matcher cannot produce
    docIds.filter(_ % 7 == 0).foreach { id =>
      val (_, _, off, _, frac) = out.getOrElse((id, id + 300000L),
        fail(s"shifted pair $id missing"))
      assert(off === -1, s"shifted pair $id must align at one hop, got $off")
      assert(frac >= 0.5)
    }
    // ordering + verdict invariants
    assert(out.keys.forall { case (a, b) => a < b })
    assert(out.values.forall { case (na, nb, _, m, frac) =>
      frac >= 0.5 && m >= 1 && m <= math.min(na, nb) })
  }

  test("real-decode audio: WAV subfingerprints are gain-invariant, shift-equivariant, and attribute offsets (round 17)") {
    // ANALYTIC golden properties of the band-gradient classifier (the
    // phash precedent: properties, not recorded constants):
    //   - GAIN INVARIANCE: energies scale uniformly, both differences
    //     keep their sign → identical fingerprint;
    //   - SHIFT EQUIVARIANCE: a prefix of exactly k·AfFrameHop samples
    //     shifts every interior subfingerprint by k unchanged — the
    //     property offset voting relies on.
    def noise(seed: Long): () => Double = {
      var s = seed
      () => {
        s = s * 6364136223846793005L + 1442695040888963407L
        ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5
      }
    }
    def synth(nSamples: Int, seed: Long, f0: Double, fmPeriod: Double): Array[Double] = {
      val nz = noise(seed)
      Array.tabulate(nSamples) { t =>
        val sweep = f0 + 3.0 * math.sin(2 * math.Pi * t / fmPeriod)
        0.5 * math.sin(2 * math.Pi * sweep * t / 256.0) + 0.2 * nz()
      }
    }
    val a = synth(8192, seed = 7L, f0 = 5.0, fmPeriod = 2000.0)
    val fpA = graft.operators.Multimodal.wavSubfingerprints(a)
    assert(fpA.length === (8192 - 256) / 128, s"got ${fpA.length}")
    assert(graft.operators.Multimodal.wavSubfingerprints(a.map(_ * 0.25))
      .sameElements(fpA), "uniform gain must not move a single bit")
    val shifted = Array.fill(4 * 128)(0.0) ++ a
    val fpS = graft.operators.Multimodal.wavSubfingerprints(shifted)
    assert((0 until fpA.length).forall(i => fpS(i + 4) === fpA(i)),
      "a 4-hop prefix shifts every interior subfingerprint by exactly 4")

    // end-to-end over real RIFF/PCM bytes through javax.sound.sampled
    val dir = java.nio.file.Files.createTempDirectory("audio-wavs")
    def writeWav(id: Long, samples: Array[Double], sr: Int = 8000): Unit = {
      val n = samples.length
      val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1).putInt(sr).putInt(sr * 2)
        .putShort(2).putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(2 * n)
      samples.foreach(s => bb.putShort(
        math.max(-32768, math.min(32767, math.round(s * 32767.0))).toShort))
      java.nio.file.Files.write(dir.resolve(s"$id.wav"), bb.array())
    }
    writeWav(1L, a)
    writeWav(2L, a)                                    // exact re-upload
    writeWav(3L, Array.fill(4 * 128)(0.0) ++ a)        // 4-hop intro
    writeWav(9L, synth(8192, seed = 999L, f0 = 11.0, fmPeriod = 1700.0)) // unrelated
    java.nio.file.Files.write(dir.resolve("8.wav"),
      "definitely not RIFF".getBytes("UTF-8"))         // corrupt blob
    assert(graft.operators.Multimodal.wavSamples(
      "definitely not RIFF".getBytes("UTF-8")).isEmpty)

    val out = graft.operators.Multimodal.audioDedupWav(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(4), r.getDouble(6))).toMap
    graft.tools.CacheRegistry.release(blocking = true)
    assert(out.contains((1L, 2L)), s"exact re-upload must pair: $out")
    assert(out((1L, 2L))._1 === 0 && out((1L, 2L))._2 >= 0.99,
      s"exact copy aligns at offset 0 with ~full overlap: ${out((1L, 2L))}")
    assert(out.contains((1L, 3L)), s"intro-shifted copy must pair: $out")
    assert(out((1L, 3L))._1 === -4,
      s"the 4-hop intro must be attributed at offset −4: ${out((1L, 3L))}")
    assert(!out.keySet.exists { case (x, y) =>
      Set(x, y).contains(9L) || Set(x, y).contains(8L) },
      s"unrelated and corrupt clips must not pair: $out")
  }

  test("audio dedup plans banded equi-joins only, no all-pairs") {
    val plan = Multimodal.audioDedup(spark, SparkTestSession.Sf0001)
      .queryExecution.executedPlan.toString
    graft.tools.CacheRegistry.release(blocking = true)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"),
      s"audio dedup must never plan a product join:\n$plan")
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
