package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Schemas

/** Readers/writers for the reference's on-disk formats, so a user can point
  * this engine at an existing data directory:
  *
  *   - `games.json` — ONE pretty-printed JSON array sorted by universeId
  *     (reference writer: src/lib/commands/gatherGames.ts:89-93);
  *   - `embeddings.json` — ONE JSON object mapping stringified universeId
  *     to a float vector (generateEmbeddings.ts:17-21,100).
  *
  * These single-file formats are ingest/export compat shims — a single
  * multiLine JSON document cannot be split across executors, so read them
  * once and convert to parquet (the engine-native format of Tables) before
  * doing real work. The writers exist for byte-compatible round-trips back
  * to the reference's tooling.
  */
object CompatIO {

  /** S1 — read games.json (multiLine JSON array) with the declared schema;
    * no inference, matching the reference's trust-the-file behavior. */
  def readGamesJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.game).option("multiLine", true).json(path)

  /** S3 — write a games DataFrame as one canonical games.json: a single
    * JSON ARRAY document sorted by universeId ascending (T1). Spark's
    * `write.json` emits JSON Lines (one object per line — NOT the
    * reference's array format and unreadable by [[readGamesJson]]), so the
    * array document is assembled explicitly. coalesce(1) is intentional —
    * the format is one document by definition; null fields are omitted
    * like JS undefined (tri-state loss documented in SURVEY §1.2). */
  def writeGamesJson(games: DataFrame, path: String): Unit = {
    val spark = games.sparkSession
    import spark.implicits._
    games.orderBy(col("universeId"))
      .coalesce(1)
      .toJSON
      .mapPartitions(rows => Iterator.single(rows.mkString("[\n", ",\n", "\n]")))
      .write.mode(SaveMode.Overwrite).text(path)
  }

  /** S3 round 2 — write the array document as a file LITERALLY named
    * `path` (e.g. `/data/games/games.json`), the artifact the reference's
    * own tooling opens (gatherGames.ts:93 writes one file, not a
    * directory). Spark sinks write directories, so this writes to a temp
    * dir and renames the single part file through the Hadoop FileSystem
    * API — portable to HDFS/object stores, no local-FS assumptions.
    * Formatting is a compact array (one row per line); the reference
    * pretty-prints with indent 4, a whitespace-only divergence its
    * JSON.parse loader does not observe. */
  def writeGamesJsonFile(games: DataFrame, path: String): Unit = {
    writeGamesJson(games, path + ".tmpdir")
    promoteSingleFile(games.sparkSession, path + ".tmpdir", path)
  }

  /** S4 round 2 — single-file embeddings.json, same mechanism. */
  def writeEmbeddingsJsonFile(embeddings: DataFrame, path: String): Unit = {
    writeEmbeddingsJson(embeddings, path + ".tmpdir")
    promoteSingleFile(embeddings.sparkSession, path + ".tmpdir", path)
  }

  private def promoteSingleFile(spark: SparkSession, tmpDir: String, target: String): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val tmp = new Path(tmpDir)
    val fs = tmp.getFileSystem(conf)
    val parts = fs.globStatus(new Path(tmp, "part-*"))
    require(parts.length == 1, s"expected one part file in $tmpDir, found ${parts.length}")
    val dest = new Path(target)
    if (fs.exists(dest)) fs.delete(dest, false)
    require(fs.rename(parts(0).getPath, dest), s"rename to $target failed")
    fs.delete(tmp, true)
  }

  /** S2 — read embeddings.json (one JSON object keyed by stringified id)
    * and explode to engine-native (universeId, embedding) rows. */
  def readEmbeddingsJson(spark: SparkSession, path: String): DataFrame = {
    val mapped = spark.read
      .schema(StructType(Seq(StructField("m", MapType(StringType, ArrayType(DoubleType))))))
      .option("multiLine", true)
      // the file IS the map: wrap as a struct field via a projection trick
      .json(path)
    // When the whole document is an object of id->vector, Spark needs the
    // map under a field name; fall back to text+from_json for the raw form.
    if (mapped.schema.fieldNames.contains("m") && !mapped.isEmpty && mapped.head().get(0) != null) {
      mapped.select(explode(col("m")).as(Seq("id", "embedding")))
        .select(col("id").cast("long").as("universeId"), col("embedding"))
    } else {
      val text = spark.read.option("wholetext", true).text(path)
      text.select(from_json(col("value"), MapType(StringType, ArrayType(DoubleType))).as("m"))
        .select(explode(col("m")).as(Seq("id", "embedding")))
        .select(col("id").cast("long").as("universeId"), col("embedding"))
    }
  }

  /** S4 — write (universeId, embedding) rows back as one JSON object.
    * Collect-free: built as a single-row map then written as text. */
  def writeEmbeddingsJson(embeddings: DataFrame, path: String): Unit =
    embeddings
      .select(to_json(map(col("universeId").cast("string"), col("embedding"))).as("kv"))
      .agg(concat_ws(",", collect_list(regexp_replace(col("kv"), "^\\{|\\}$", ""))).as("body"))
      .select(concat(lit("{"), col("body"), lit("}")).as("value"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).text(path)
}
