package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.io.CompatIO
import graft.pipeline.Commands

class CompatIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val gamesJson =
    """[
      |  {"universeId": 1, "rootPlaceId": 10, "name": "alpha", "description": "a game", "playerCount": 5},
      |  {"universeId": 2, "rootPlaceId": 20, "name": "beta", "description": null},
      |  {"universeId": 3, "rootPlaceId": 30, "name": "gamma", "gameplayDescription": "gp"}
      |]""".stripMargin

  test("games.json multiLine array reads with declared schema and tri-state nulls") {
    val dir = Files.createTempDirectory("graft-compat").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/games.json"), gamesJson)
    val df = CompatIO.readGamesJson(spark, s"$dir/games.json")
    val rows = df.orderBy("universeId").collect()
    assert(rows.length === 3)
    assert(rows(0).getAs[String]("description") === "a game")
    assert(rows(1).isNullAt(rows(1).fieldIndex("description"))) // explicit null
    assert(rows(2).isNullAt(rows(2).fieldIndex("description"))) // absent key
    assert(rows(2).getAs[String]("gameplayDescription") === "gp")
  }

  test("embeddings.json object map explodes to (universeId, embedding) rows") {
    val dir = Files.createTempDirectory("graft-compat").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/embeddings.json"),
      """{"1": [0.1, 0.2], "2": [0.3, 0.4]}""")
    val df = CompatIO.readEmbeddingsJson(spark, s"$dir/embeddings.json")
    val rows = df.orderBy("universeId").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(rows(0).getSeq[Double](1) === Seq(0.1, 0.2))
  }

  test("embeddings round-trip: write one JSON object, read it back") {
    val dir = Files.createTempDirectory("graft-compat").toString
    val src = Seq((7L, Seq(1.0, 2.0)), (8L, Seq(3.0, 4.0))).toDF("universeId", "embedding")
    CompatIO.writeEmbeddingsJson(src, s"$dir/emb_out")
    val file = new java.io.File(s"$dir/emb_out").listFiles()
      .filter(_.getName.endsWith(".txt")).head
    val back = CompatIO.readEmbeddingsJson(spark, file.getAbsolutePath)
    assert(back.orderBy("universeId").collect().map(_.getLong(0)).toSeq === Seq(7L, 8L))
  }

  test("writeGamesJsonFile emits a file literally named games.json; byte-stable round-trip") {
    val dir = Files.createTempDirectory("graft-compat").toString
    // the reference's own pretty-printed array format (indent 4) parses
    Files.writeString(java.nio.file.Paths.get(s"$dir/ref_games.json"),
      """[
        |    {
        |        "universeId": 2,
        |        "rootPlaceId": 20,
        |        "name": "beta",
        |        "description": null
        |    },
        |    {
        |        "universeId": 1,
        |        "rootPlaceId": 10,
        |        "name": "alpha",
        |        "description": "a game",
        |        "playerCount": 5
        |    }
        |]""".stripMargin)
    val parsed = CompatIO.readGamesJson(spark, s"$dir/ref_games.json")
    assert(parsed.count() === 2)

    val out1 = s"$dir/games.json"
    CompatIO.writeGamesJsonFile(parsed, out1)
    val f = new java.io.File(out1)
    assert(f.isFile, "games.json must be a FILE, not a directory")
    // readable again, canonical universeId-ascending order applied
    val back = CompatIO.readGamesJson(spark, out1)
    assert(back.orderBy("universeId").collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    // byte-diff round-trip: write the re-read table → identical bytes
    val out2 = s"$dir/games2.json"
    CompatIO.writeGamesJsonFile(back, out2)
    assert(java.util.Arrays.equals(
      Files.readAllBytes(java.nio.file.Paths.get(out1)),
      Files.readAllBytes(java.nio.file.Paths.get(out2))))
  }

  test("writeGamesJsonFile bytes are identical to JSON.stringify(x, null, 4)") {
    val dir = Files.createTempDirectory("graft-compat").toString
    val df = Seq(
      (1L, 10L, "alpha \"quoted\" → ünïcode", Some("line1\nline2"),
        None: Option[String], Some(5L)),
      (2L, 20L, "beta", None: Option[String], None: Option[String], None: Option[Long])
    ).toDF("universeId", "rootPlaceId", "name", "description",
      "gameplayDescription", "playerCount")
    val out = s"$dir/games.json"
    CompatIO.writeGamesJsonFile(df, out)
    // exactly what fs.writeFileSync(path, JSON.stringify(games, null, 4))
    // produces (gatherGames.ts:93): indent 4, declaration key order, JSON
    // escapes, non-ASCII verbatim, NO trailing newline
    val expected =
      "[\n" +
        "    {\n" +
        "        \"universeId\": 1,\n" +
        "        \"rootPlaceId\": 10,\n" +
        "        \"name\": \"alpha \\\"quoted\\\" → ünïcode\",\n" +
        "        \"description\": \"line1\\nline2\",\n" +
        "        \"playerCount\": 5\n" +
        "    },\n" +
        "    {\n" +
        "        \"universeId\": 2,\n" +
        "        \"rootPlaceId\": 20,\n" +
        "        \"name\": \"beta\"\n" +
        "    }\n" +
        "]"
    assert(new String(Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8") === expected)
  }

  test("writeGamesJsonFile writes [] for an empty frame like JSON.stringify([])") {
    val dir = Files.createTempDirectory("graft-compat").toString
    val empty = Seq.empty[(Long, Long, String)].toDF("universeId", "rootPlaceId", "name")
    val out = s"$dir/games.json"
    CompatIO.writeGamesJsonFile(empty, out)
    assert(new String(Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8") === "[]")
  }

  test("writeGamesJsonFile keeps the explicit-null byte for fetched-and-blank descriptions") {
    val dir = Files.createTempDirectory("graft-compat").toString
    val df = Seq(
      (1L, 10L, "a", None: Option[String], true),   // fetched, known-blank
      (2L, 20L, "b", None: Option[String], false)   // never fetched
    ).toDF("universeId", "rootPlaceId", "name", "description", "descriptionFetched")
    val out = s"$dir/games.json"
    CompatIO.writeGamesJsonFile(df, out)
    val text = new String(Files.readAllBytes(java.nio.file.Paths.get(out)), "UTF-8")
    // tri-state survives: JS null is written, JS undefined is omitted, and
    // the engine-side flag itself is not a Game field
    assert(text.contains("\"description\": null"))
    assert("\"description\"".r.findAllIn(text).length === 1)
    assert(!text.contains("descriptionFetched"))
  }

  test("writeEmbeddingsJsonFile single file round-trips") {
    val dir = Files.createTempDirectory("graft-compat").toString
    val src = Seq((7L, Seq(1.0, 2.0)), (8L, Seq(3.0, 4.0))).toDF("universeId", "embedding")
    CompatIO.writeEmbeddingsJsonFile(src, s"$dir/embeddings.json")
    assert(new java.io.File(s"$dir/embeddings.json").isFile)
    val back = CompatIO.readEmbeddingsJson(spark, s"$dir/embeddings.json")
    assert(back.orderBy("universeId").collect().map(_.getLong(0)).toSeq === Seq(7L, 8L))
  }

  test("clearGameplayDescriptions nulls the column (P15)") {
    val g = Seq((1L, 10L, "a", Some("d"), Some("gp"), Some(1L)))
      .toDF("universeId", "rootPlaceId", "name", "description", "gameplayDescription", "playerCount")
    val out = Commands.clearGameplayDescriptions(g).head()
    assert(out.isNullAt(out.fieldIndex("gameplayDescription")))
    assert(out.getAs[String]("description") === "d")
  }
}
