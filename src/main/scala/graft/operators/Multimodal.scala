package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `BINARY` columns with typed metadata, batch "decoded" inside
  * `mapPartitions`. The reference stores blobs on the filesystem
  * (data/games/images/NNN/icon.png — src/lib/commands/downloadImages.ts:
  * 49-58); at scale the blobs ride IN the table (or a binaryFile scan) so
  * decode work distributes with the data instead of hammering a shared FS.
  *
  * The decode step itself is STUBBED (deterministic fake dimensions derived
  * from the bytes — no image codec ships in this environment); everything
  * around it — binary column, schema, batch shape, partition-parallel
  * execution — is real and oracle-checked. A real deployment replaces
  * `fakeDecode` with the codec call and nothing else moves.
  */
object Multimodal {

  /** The stand-in "decoder": deterministic dimensions from the blob hash.
    * Replace with a real codec (e.g. javax.imageio / ffmpeg bindings). */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    val h = StubHash.h32(bytes)
    (((h % 640) + 16).toInt, (((h / 7) % 480) + 16).toInt, ((h % 7) + 1).toInt)
  }

  private object StubHash {
    def h32(bytes: Array[Byte]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(bytes).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
  }

  /** Binary ingest + batched stub decode: text bytes stand in for image
    * blobs; output is the typed metadata a real decode would produce. */
  def decodeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blobs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("blob"))
    blobs.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch shape: a real codec amortizes per-batch init (decoder
        // context, GPU handle) exactly here
        it.grouped(16).flatMap { batch =>
          batch.map { case (id, bytes) =>
            val (w, h, f) = fakeDecode(bytes)
            (id, bytes.length, w, h, f)
          }
        }
      }
      .toDF("doc_id", "byte_len", "width", "height", "n_frames")
      .orderBy(col("doc_id"))
  }

  val decodeStubSql: String =
    """WITH h AS (
      |  SELECT doc_id,
      |         octet_length(encode(text)) AS byte_len,
      |         CAST('0x' || substring(md5(text), 1, 8) AS BIGINT) AS hv
      |  FROM documents)
      |SELECT doc_id, CAST(byte_len AS INTEGER) AS byte_len,
      |  CAST((hv % 640) + 16 AS INTEGER) AS width,
      |  CAST(((hv // 7) % 480) + 16 AS INTEGER) AS height,
      |  CAST((hv % 7) + 1 AS INTEGER) AS n_frames
      |FROM h
      |ORDER BY doc_id""".stripMargin

  /** F14 — base64 data-URI composition, the vision-input encoding the
    * reference builds for LLM image input
    * (generateGameplayDescriptions.ts:81,97). */
  def dataUri(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(lit("data:image/png;base64,"),
          // Spark's base64 is the MIME variant (CRLF-wrapped every 76
          // chars); strip the wraps for a standard single-line data URI
          regexp_replace(base64(col("text").cast("binary")), "[\\r\\n]", ""))
          .as("data_uri"))
      .orderBy(col("doc_id"))

  val dataUriSql: String =
    """SELECT doc_id,
      |  'data:image/png;base64,' || to_base64(encode(text)) AS data_uri
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_stub" -> decodeStub,
    "f14_data_uri" -> dataUri
  )

  val oracles: Map[String, String] = Map(
    "mm_decode_stub" -> decodeStubSql,
    "f14_data_uri" -> dataUriSql
  )
}
