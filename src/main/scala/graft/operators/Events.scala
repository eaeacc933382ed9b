package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.io.Tables
import graft.functions.OracleParity._

/** Event-stream operators over the `events` table. The reference has no
  * streaming surface (SURVEY §2.9), so these are the forward-looking
  * pipeline ops: tumbling-window aggregation, gap-based sessionization, and
  * JSON property extraction (F16). Each is written so the SAME dataframe
  * code runs under Structured Streaming (see graft.streaming.EventsStream:
  * the windowed aggregation is reused verbatim with `readStream` +
  * watermark); here they run in batch mode and are oracle-checked.
  *
  * Scale: window aggregation shuffles once on (window, event_type) with
  * map-side partials; sessionization shuffles once on user_id then does a
  * linear per-partition pass — both hold at 1000 executors.
  */
object Events {

  /** Tumbling 1-hour window × event_type counts + exact sums — the
    * streaming-native aggregation shape, batch-executed. */
  def windowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  val windowAggSql: String =
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
      |  count(*) AS n,
      |  CAST(round(sum(CAST(value AS DECIMAL(30,6))), 2) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** Gap-based sessionization: a new session starts when a user is idle
    * > 30 minutes. Lag + running sum inside one user-partitioned window —
    * the batch equivalent of flatMapGroupsWithState session tracking. */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    ev.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val sessionizeSql: String =
    """WITH lagged AS (
      |  SELECT user_id, event_id, ts,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN prev_ts IS NULL
      |                   OR date_diff('second', prev_ts, ts) > 1800 THEN 1
      |              ELSE 0 END AS new_session
      |  FROM lagged),
      |sessions AS (
      |  SELECT user_id, ts,
      |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, count(*) AS n_events,
      |       min(ts) AS session_start, max(ts) AS session_end
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** F16 — JSON extraction (`from_json`) over the props column, aggregated:
    * total of props.k per event type (the reference parses LLM JSON output
    * the same way — generateGameplayDescriptions.ts:152-158). */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", from_json(col("props"), StructType(Seq(StructField("k", LongType))))
        .getField("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type"))

  val jsonExtractSql: String =
    """SELECT event_type,
      |  count(CAST(props->>'$.k' AS BIGINT)) AS n_with_k,
      |  CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Rolling-frame window aggregate: 4-event moving average per user.
    * The frame sum routes through DECIMAL because engines disagree on
    * sliding-window float summation internals (DuckDB uses segment trees);
    * decimal makes the frame sum exact and association-free. */
  def rollingAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("sum_d", sum(col("value").cast("decimal(30,6)")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"),
        graft.functions.OracleParity.pround(
          col("sum_d").cast("double") / col("cnt"), 4).as("moving_avg"))
      .orderBy(col("event_id"))
  }

  val rollingAvgSql: String =
    """SELECT event_id, user_id,
      |  floor(CAST(sum(CAST(value AS DECIMAL(30,6))) OVER w AS DOUBLE)
      |        / (count(*) OVER w) * 10000 + 0.5) / 10000.0 AS moving_avg
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** A3 — job-stats aggregation (reference: src/lib/jobManager.ts:218-243,
    * `GROUP BY status, COUNT(*)` plus a total row). The jobs fixture is
    * derived from events by mapping event types onto job statuses —
    * the reference's SQLite job table is a tiny single-node concern
    * (SURVEY §1.4), so only its QUERY shape is rebuilt. */
  def jobStats(spark: SparkSession, dir: String): DataFrame = {
    val status = when(col("event_type") === "click", "completed")
      .when(col("event_type") === "error", "failed")
      .when(col("event_type") === "view", "running")
      .otherwise("pending")
    val jobs = Tables.events(spark, dir).withColumn("status", status)
    jobs.groupBy(col("status")).agg(count(lit(1)).as("n"))
      .unionByName(jobs.agg(count(lit(1)).as("n")).select(lit("total").as("status"), col("n")))
      .orderBy(col("status"))
  }

  val jobStatsSql: String =
    """WITH jobs AS (
      |  SELECT CASE WHEN event_type = 'click' THEN 'completed'
      |              WHEN event_type = 'error' THEN 'failed'
      |              WHEN event_type = 'view' THEN 'running'
      |              ELSE 'pending' END AS status
      |  FROM events)
      |SELECT status, count(*) AS n FROM jobs GROUP BY status
      |UNION ALL
      |SELECT 'total' AS status, count(*) AS n FROM jobs
      |ORDER BY status""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st_window_agg" -> windowAgg,
    "st_sessionize" -> sessionize,
    "f16_json_extract" -> jsonExtract,
    "t_rolling_avg" -> rollingAvg,
    "a3_job_stats" -> jobStats
  )

  val oracles: Map[String, String] = Map(
    "st_window_agg" -> windowAggSql,
    "st_sessionize" -> sessionizeSql,
    "f16_json_extract" -> jsonExtractSql,
    "t_rolling_avg" -> rollingAvgSql,
    "a3_job_stats" -> jobStatsSql
  )
}
