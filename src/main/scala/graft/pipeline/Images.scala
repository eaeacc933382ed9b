package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/** Image-pipeline operators (reference: src/lib/commands/downloadImages.ts):
  *
  *   - P8 — the work set is "games with no icon/thumbnail on disk"; the
  *     reference does fs.existsSync per game (:48-58) — here it's an
  *     anti-join of (game × kind) against a listing of the blob store
  *     (what a `binaryFile`/object-store scan returns), so the existence
  *     check is one distributed join, not N stat calls;
  *   - S11 — thumbnail-URL resolution batches 50 ids per request
  *     (:60-130) through the pluggable client;
  *   - S12 — the blob sink is foreachPartition: each partition downloads
  *     its URLs and writes blobs, SKIPPING files that already exist
  *     (:15-46) — combined with the anti-join work set this makes re-runs
  *     doubly idempotent. Local-FS paths here; at scale the writer targets
  *     an object store and the listing comes from its inventory.
  */
object Images {

  val Kinds: Seq[String] = Seq("icon", "thumbnail")

  /** Listing of the blob store as a REAL distributed scan: Spark's
    * `binaryFile` source over the reference's `<dir>/<universeId>/<kind>.png`
    * layout (downloadImages.ts:15-46) → (universeId, kind) rows, the input
    * to [[missingImages]] and the /stats anti-joins. Only `path` is
    * projected, so the format's column pruning skips reading any blob
    * bytes. At scale the same scan points at an object-store prefix (or
    * its inventory table). */
  def listBlobs(spark: SparkSession, dir: String): DataFrame = {
    val pat = "/(\\d+)/(icon|thumbnail)\\.png$"
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"))
      .select(
        regexp_extract(col("path"), pat, 1).as("id_str"),
        regexp_extract(col("path"), pat, 2).as("kind"))
      .filter(col("id_str") =!= "" && col("kind") =!= "")
      .select(col("id_str").cast("long").as("universeId"), col("kind"))
  }

  /** P8 — (universeId, kind) pairs whose blob is absent from the listing.
    * `listing` has columns (universeId, kind). */
  def missingImages(games: DataFrame, listing: DataFrame): DataFrame =
    games.select(col("universeId"))
      .crossJoin(spark_kinds(games.sparkSession))
      .join(listing, Seq("universeId", "kind"), "left_anti")

  private def spark_kinds(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Kinds.toDF("kind")
  }

  /** S11 — resolve CDN URLs for the missing set, batch-50 per request via
    * an injectable resolver (the Roblox thumbnails API in production). */
  def resolveUrls(
      spark: SparkSession,
      missing: DataFrame,
      resolve: (Seq[(Long, String)]) => Seq[(Long, String, String)],
      batchSize: Int = graft.model.Constants.RobloxBatchSize): DataFrame = {
    import spark.implicits._
    missing.select(col("universeId"), col("kind")).as[(Long, String)]
      .mapPartitions(it => it.grouped(batchSize).flatMap(resolve))
      .toDF("universeId", "kind", "url")
  }

  /** S12 — blob sink: download+write per partition, skip-if-exists.
    * Returns (written, skipped) via accumulators. */
  def downloadBlobs(
      spark: SparkSession,
      urls: DataFrame,
      outDir: String,
      fetch: String => Array[Byte]): (Long, Long) = {
    val written: LongAccumulator = spark.sparkContext.longAccumulator("blobs_written")
    val skipped: LongAccumulator = spark.sparkContext.longAccumulator("blobs_skipped")
    urls.select(col("universeId"), col("kind"), col("url"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          val dir = Paths.get(outDir, r.getLong(0).toString)
          val target = dir.resolve(s"${r.getString(1)}.png")
          if (Files.exists(target)) skipped.add(1)
          else {
            Files.createDirectories(dir)
            Files.write(target, fetch(r.getString(2)))
            written.add(1)
          }
        }
      }
    (written.value, skipped.value)
  }
}
