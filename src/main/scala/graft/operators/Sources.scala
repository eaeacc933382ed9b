package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Tables

/** Source-shaping operators: the reference's HTML-scrape parse (S7 —
  * gatherGamesRolimons.ts:18-36 slices the JS blob between
  * `var games = ` and `document.addEventListener`, drops the trailing
  * semicolon, and JSON-parses a placeId → {name, icon_url} map).
  *
  * The fetch itself is driver-side (sequential HTTP, SURVEY §7.4); the
  * PARSE is the distributable part and is expressed here as pure column
  * operations — `substring_index` slicing + `from_json` map explode — over
  * a column of fetched pages. The fixture builds one page per document so
  * the whole path is table-driven and oracle-checked.
  */
object Sources {

  private val pageSchema = MapType(StringType,
    StructType(Seq(
      StructField("name", StringType),
      StructField("icon_url", StringType))))

  /** S7 — scrape-parse: slice the JS assignment out of each HTML page and
    * explode the parsed map. */
  def scrapeParse(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val firstTok = element_at(split(col("text"), " "), 1)
    val html = concat(
      lit("<html><script>var games = {\""), col("doc_id").cast("string"),
      lit("\": {\"name\": \""), firstTok,
      lit("\", \"icon_url\": \"https://img/"), col("doc_id").cast("string"),
      lit(".png\"}};document.addEventListener(\"x\")</script></html>"))
    val payload = regexp_replace(
      trim(substring_index(substring_index(html, "var games = ", -1),
        "document.addEventListener", 1)),
      ";$", "")
    d.select(col("doc_id"), from_json(payload, pageSchema).as("m"))
      .select(col("doc_id"), explode(col("m")).as(Seq("place_id", "g")))
      .select(col("place_id").cast("long").as("place_id"),
        col("g.name").as("name"), col("g.icon_url").as("icon_url"))
      .orderBy(col("place_id"))
  }

  val scrapeParseSql: String =
    """WITH pages AS (
      |  SELECT doc_id,
      |         '<html><script>var games = {"' || CAST(doc_id AS VARCHAR)
      |         || '": {"name": "' || string_split(text, ' ')[1]
      |         || '", "icon_url": "https://img/' || CAST(doc_id AS VARCHAR)
      |         || '.png"}};document.addEventListener("x")</script></html>' AS html
      |  FROM documents),
      |sliced AS (
      |  SELECT doc_id,
      |         regexp_replace(trim(split_part(split_part(html, 'var games = ', 2),
      |                                        'document.addEventListener', 1)),
      |                        ';$', '') AS payload
      |  FROM pages)
      |SELECT doc_id AS place_id,
      |       json_extract_string(payload, '$."' || doc_id || '".name') AS name,
      |       json_extract_string(payload, '$."' || doc_id || '".icon_url') AS icon_url
      |FROM sliced
      |ORDER BY place_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s7_scrape_parse" -> scrapeParse
  )

  val oracles: Map[String, String] = Map(
    "s7_scrape_parse" -> scrapeParseSql
  )
}
