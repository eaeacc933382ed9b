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
    * directory), with byte-identical `JSON.stringify(games, null, 4)`
    * formatting: 4-space indent, keys in Game declaration order
    * (types.d.ts:59-66), no trailing newline (fs.writeFileSync writes the
    * bare string). Null columns are omitted like JS `undefined`; when the
    * frame carries the engine's `descriptionFetched` tri-state flag, a
    * fetched-and-blank description renders the reference's explicit
    * `"description": null` (downloadDescriptions.ts:13-18) and the flag
    * itself — engine metadata, not a Game field — is not emitted.
    *
    * Spark text sinks write directories AND append a trailing row
    * newline, so the single-document bytes are written executor-side
    * through the Hadoop FileSystem API (tmp file + rename) — collect-free
    * and portable to HDFS/object stores. */
  def writeGamesJsonFile(games: DataFrame, path: String): Unit = {
    val spark = games.sparkSession
    import spark.implicits._
    val serConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val schema = games.schema
    val wrote = spark.sparkContext.longAccumulator("graft.gamesJsonWrites")
    games.orderBy(col("universeId"))
      .coalesce(1)
      .mapPartitions { rows =>
        val objs = rows.map(r => renderGamePretty(r, schema))
        Iterator.single(
          if (objs.isEmpty) "[]" else objs.mkString("[\n", ",\n", "\n]"))
      }
      .foreachPartition { (docs: Iterator[String]) =>
        docs.foreach { doc =>
          writeFileAtomic(serConf.value, path, doc)
          wrote.add(1L)
        }
      }
    // an EMPTY frame can arrive with ZERO partitions, so no executor ever
    // runs; the reference's JSON.stringify write still replaces the target
    // with "[]" — so overwrite unconditionally driver-side (not just when
    // the target is missing: a stale previous games.json must not survive
    // an empty write)
    if (wrote.value == 0L)
      writeFileAtomic(spark.sessionState.newHadoopConf(), path, "[]")
  }

  /** Single-file commit safe under task retry / speculation: the tmp name
    * is unique per task attempt (two attempts never race on one file) and
    * promotion is rename-with-overwrite (`FileContext` exposes the
    * OVERWRITE flavor `FileSystem.rename` hides), so readers never observe
    * the target missing between a delete and a rename. */
  private def writeFileAtomic(conf: org.apache.hadoop.conf.Configuration,
                              path: String, doc: String): Unit = {
    import org.apache.hadoop.fs.{FileContext, Options, Path}
    val fs = new Path(path).getFileSystem(conf)
    val target = fs.makeQualified(new Path(path))
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(_.taskAttemptId).getOrElse(-1L)
    val tmp = fs.makeQualified(new Path(s"$path.inprogress-$attempt"))
    val os = fs.create(tmp, true)
    try os.write(doc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    FileContext.getFileContext(target.toUri, conf)
      .rename(tmp, target, Options.Rename.OVERWRITE)
  }

  /** One Game as `JSON.stringify(game, null, 4)` renders it at array depth
    * 1: keys in [[Schemas.game]] order, 8-space field indent, string
    * escaping per the JSON spec exactly as V8 emits it (`"`, `\`, and the
    * named control escapes; other control chars as `\u00xx`; non-ASCII
    * verbatim — the file is UTF-8). */
  private def renderGamePretty(row: org.apache.spark.sql.Row, schema: StructType): String = {
    val fetchedIdx = schema.fieldNames.indexOf("descriptionFetched")
    def esc(s: String): String = {
      val b = new StringBuilder
      s.foreach {
        case '"' => b.append("\\\"")
        case '\\' => b.append("\\\\")
        case '\b' => b.append("\\b")
        case '\f' => b.append("\\f")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case '\t' => b.append("\\t")
        case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
        case c => b.append(c)
      }
      b.toString
    }
    val fields = Schemas.game.fieldNames.iterator.flatMap { name =>
      val i = schema.fieldNames.indexOf(name)
      if (i < 0) None
      else if (row.isNullAt(i)) {
        // tri-state: fetched-and-blank keeps the explicit null byte
        if (name == "description" && fetchedIdx >= 0 &&
            !row.isNullAt(fetchedIdx) && row.getBoolean(fetchedIdx))
          Some(s""""$name": null""")
        else None // JS undefined — key omitted
      } else schema(i).dataType match {
        case LongType => Some(s""""$name": ${row.getLong(i)}""")
        case StringType => Some(s""""$name": "${esc(row.getString(i))}"""")
        case other => throw new IllegalArgumentException(
          s"unexpected games.json column type $other for $name")
      }
    }.toSeq
    fields.map("        " + _).mkString("    {\n", ",\n", "\n    }")
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
