package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Stream-stream time-bounded join — the continuous form of the batch
  * attribution join ([[graft.operators.Events.attribution]]): purchases
  * and views arrive as two unbounded streams, and every purchase must be
  * matched with the same user's views from the preceding attribution
  * window WITHOUT holding either stream forever.
  *
  * This is the Structured Streaming feature the rest of §2.9 had not yet
  * exercised: a watermarked STREAM × STREAM inner join with a time-range
  * condition. Spark derives the state-retention bound from the join
  * condition itself — a view row can only ever match purchases up to
  * [[graft.operators.Events]]'s window later, so view state is evicted
  * once the purchase watermark passes `v_ts + window`, and purchase state
  * once the view watermark passes `p_ts` — state is O(window × rate),
  * independent of stream length, the same boundedness argument as the
  * windowed aggregates.
  *
  * The parity test (StreamingJoinSpec) replays the fixture events through
  * both streams with AvailableNow and asserts the emitted pair set equals
  * the batch join's pair set — the streaming ≡ batch discipline every
  * other streaming module here follows.
  */
object StreamingJoin {

  /** Matched (purchase, view) pairs: same user, view within `windowHours`
    * before the purchase (inclusive both ends, mirroring the batch twin).
    * Both inputs must be event streams with the [[EventsStream.schema]]
    * columns; watermarks bound state on both sides. */
  def attributionPairs(views: DataFrame, purchases: DataFrame,
      windowHours: Long = 48L): DataFrame = {
    val v = views
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
      .withWatermark("v_ts", "1 minute")
    val p = purchases
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "1 minute")
    p.join(v,
        col("p_user") === col("v_user") &&
          col("v_ts") <= col("p_ts") &&
          col("v_ts") >= col("p_ts") - expr(s"INTERVAL $windowHours HOURS"))
      .select(col("p_id"), col("v_id"), col("p_user").as("user_id"),
        col("p_ts"), col("v_ts"))
  }

  def startMemorySink(out: DataFrame, name: String,
      checkpointDir: String): StreamingQuery =
    out.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
