package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Continuous data-quality monitoring — the streaming face of
  * `q_profile_games`. A production ingest wants the profile LIVE: a
  * null-rate spike or a distinct-count collapse in an upstream feed is
  * exactly the failure you want to catch while the batch is still
  * arriving, not at the next nightly profile. The batch query's exact
  * `countDistinct` cannot stream (distinct aggregation over an unbounded
  * stream is unbounded state — the reason the KMV column exists at all),
  * so the streaming profile keeps the SKETCH path plus the counters that
  * aggregate with O(1) state: per column, row/null/empty/length counters
  * and the bounded [[graft.functions.KmvSketch]] buffer. State =
  * |columns| rows forever.
  *
  * Runs in COMPLETE output mode over the same stacked
  * (column, value-as-string) projection as the batch query (shared
  * expression tree — the StreamingCms convention), so every column of
  * the streamed report that the batch report also carries is IDENTICAL
  * over the same prefix: hash-selected sketches and plain counters are
  * both arrival-order-blind.
  */
object StreamingProfile {

  /** Games-shaped stream: the profiled columns plus arrival time. */
  val schema: StructType = StructType(Seq(
    StructField("universeId", LongType),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("descriptionFetched", BooleanType),
    StructField("gameplayDescription", StringType),
    StructField("playerCount", LongType)))

  def readGames(spark: SparkSession, path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  private val ProfiledCols = Seq("universeId", "name", "description",
    "descriptionFetched", "gameplayDescription", "playerCount")

  /** The live per-column profile (state = one bounded row per column):
    * n, n_null, n_empty, total value length, and the KMV distinct
    * estimate — everything from the batch report that admits O(1)
    * streaming state. */
  def profileStream(games: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val kmv = udaf(graft.functions.KmvSketchNullable,
      ExpressionEncoder[java.lang.Long]())
    games
      .select(explode(array(ProfiledCols.map(c =>
        struct(lit(c).as("c"), col(c).cast("string").as("v"))): _*)).as("s"))
      .select(col("s.c").as("col"), col("s.v").as("v"))
      .groupBy(col("col"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(col("v") === "", 1L).otherwise(0L)).as("n_empty"),
        sum(coalesce(length(col("v")).cast("long"), lit(0L))).as("len_sum"),
        kmv(conv(substring(md5(col("v")), 1, 8), 16, 10).cast("long"))
          .as("distinct_kmv"))
  }

  def startComplete(out: DataFrame, name: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("500 milliseconds")): StreamingQuery =
    out.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
