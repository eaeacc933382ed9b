package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Images

object ImagesSpec {
  /** Serializable stubs (top-level: executors must not capture the suite). */
  val resolver: Seq[(Long, String)] => Seq[(Long, String, String)] =
    batch => batch.map { case (id, kind) => (id, kind, s"https://cdn/$kind/$id.png") }
  val fetcher: String => Array[Byte] = url => s"PNGBYTES:$url".getBytes("UTF-8")
}

class ImagesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("missing-image anti-join, URL resolution, and idempotent blob sink") {
    val games = Seq(1L, 2L, 3L).toDF("universeId")
    val listing = Seq((1L, "icon"), (1L, "thumbnail"), (2L, "icon")).toDF("universeId", "kind")

    val missing = Images.missingImages(games, listing)
    val missingSet = missing.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(missingSet === Set((2L, "thumbnail"), (3L, "icon"), (3L, "thumbnail")))

    val urls = Images.resolveUrls(spark, missing, ImagesSpec.resolver)
    assert(urls.count() === 3L)

    val out = Files.createTempDirectory("graft-blobs").toString
    val (w1, s1) = Images.downloadBlobs(spark, urls, out, ImagesSpec.fetcher)
    assert((w1, s1) === ((3L, 0L)))
    assert(Files.exists(Paths.get(out, "3", "icon.png")))
    assert(new String(Files.readAllBytes(Paths.get(out, "2", "thumbnail.png")), "UTF-8")
      === "PNGBYTES:https://cdn/thumbnail/2.png")

    // second run: everything exists → all skipped, nothing rewritten
    val (w2, s2) = Images.downloadBlobs(spark, urls, out, ImagesSpec.fetcher)
    assert((w2, s2) === ((0L, 3L)))
  }
}
