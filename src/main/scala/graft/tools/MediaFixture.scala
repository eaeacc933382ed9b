package graft.tools

/** Deterministic REAL-BLOB media fixture for pricing the real-decode
  * paths (round 18, verdict r17 #6: `phashDedupImages` and
  * `audioDedupWav` were golden-spec'd but never priced — the bench now
  * carries both as bench-only entries, and a decode-bound entry doubles
  * as a CPU-bound canary next to the xorshift calibration markers).
  *
  * Layout (the reference blob-store shape the readers glob):
  * {{{
  *   <root>/images/<id>/icon.png     256×256 RGB PNGs (ImageIO-encoded)
  *   <root>/audio/<id>.wav           PCM s16le mono RIFF, 16384 samples
  *   <root>/_complete                generation marker (skip-if-exists)
  * }}}
  *
  * Content is pure-deterministic (splitmix over the id — no RNG, no
  * clock), FIXED-SIZE regardless of sfDir (a decode canary prices the
  * codec path, not corpus scale — the ×N scale story for these operators
  * is the stub queries' SCALING.md replays), and carries real near-dup
  * structure so both operators produce verified pairs:
  *
  *   - images: every `id % 3 == 0` base has a `+10000` re-encode with a
  *     uniform brightness lift (dHash is gradient-sign invariant — the
  *     golden spec's property, exercised here at bench scale);
  *   - audio: every `id % 3 == 0` clip has a `+10000` exact re-upload,
  *     and every `id % 5 == 0` a `+20000` copy behind a 4-hop silent
  *     intro (the offset-voting case).
  */
object MediaFixture {

  val Images = 360
  val Clips = 240
  val ImageSide = 256
  val ClipSamples = 16384

  /** Generate (once) and return the fixture root. Generation is
    * driver-side file IO of a few hundred small blobs — single-digit
    * seconds, paid once per machine and amortized by the `_complete`
    * marker (concurrent first callers race benignly: content is
    * deterministic, the marker lands after the last byte). */
  def ensure(): String = {
    val root = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft-media-fixture", "v1")
    val marker = root.resolve("_complete")
    if (java.nio.file.Files.exists(marker)) return root.toString
    java.nio.file.Files.createDirectories(root.resolve("audio"))
    (0 until Images).foreach { i =>
      writePng(root, i.toLong, brightness = 0)
      if (i % 3 == 0) writePng(root, i.toLong + 10000L, base = i.toLong,
        brightness = 24)
    }
    (0 until Clips).foreach { i =>
      val s = clip(i.toLong)
      writeWav(root, i.toLong, s)
      if (i % 3 == 0) writeWav(root, i.toLong + 10000L, s)
      if (i % 5 == 0)
        writeWav(root, i.toLong + 20000L, Array.fill(4 * 128)(0.0) ++ s)
    }
    java.nio.file.Files.write(marker, Array.empty[Byte])
    root.toString
  }

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** A smooth deterministic pattern (sums of id-seeded sinusoids) — PNG
    * compresses it well and the dHash grid sees real gradients, unlike
    * white noise whose gradient signs are coin flips. */
  private def writePng(root: java.nio.file.Path, id: Long, brightness: Int,
      base: Long = -1L): Unit = {
    val seed = if (base >= 0) base else id
    val img = new java.awt.image.BufferedImage(
      ImageSide, ImageSide, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val fx = 1.0 + (mix(seed) & 7)
    val fy = 1.0 + (mix(seed + 1) & 7)
    val ph = (mix(seed + 2) & 1023) / 1024.0 * 2 * math.Pi
    var y = 0
    while (y < ImageSide) {
      var x = 0
      while (x < ImageSide) {
        val v = 0.5 + 0.25 * math.sin(2 * math.Pi * fx * x / ImageSide + ph) +
          0.25 * math.sin(2 * math.Pi * fy * y / ImageSide)
        val g = math.max(0, math.min(255, (v * 255).toInt + brightness))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val dir = root.resolve("images").resolve(id.toString)
    java.nio.file.Files.createDirectories(dir)
    javax.imageio.ImageIO.write(img, "png", dir.resolve("icon.png").toFile)
  }

  /** The golden spec's synth shape: an FM-swept tone plus deterministic
    * noise — band energies move, so subfingerprints carry structure. */
  private def clip(id: Long): Array[Double] = {
    var s = mix(id)
    def nz(): Double = {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }
    val f0 = 4.0 + (mix(id + 7) & 7)
    val fm = 1500.0 + (mix(id + 13) & 1023)
    Array.tabulate(ClipSamples) { t =>
      val sweep = f0 + 3.0 * math.sin(2 * math.Pi * t / fm)
      0.5 * math.sin(2 * math.Pi * sweep * t / 256.0) + 0.2 * nz()
    }
  }

  private def writeWav(root: java.nio.file.Path, id: Long,
      samples: Array[Double], sr: Int = 8000): Unit = {
    val n = samples.length
    val bb = java.nio.ByteBuffer.allocate(44 + 2 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 2 * n)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sr).putInt(sr * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(2 * n)
    samples.foreach(x => bb.putShort(
      math.max(-32768, math.min(32767, math.round(x * 32767.0))).toShort))
    java.nio.file.Files.write(root.resolve("audio").resolve(s"$id.wav"),
      bb.array())
  }
}
