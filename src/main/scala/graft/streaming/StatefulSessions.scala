package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.io.Tables

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * Structured Streaming stateful-operator shape. The SAME function runs:
  *
  *   - in BATCH (each key's full history arrives in one call, state starts
  *     empty) — which is how the test verifies it against the SQL-window
  *     sessionization in `operators.Events.sessionize`;
  *   - in STREAMING (state carries the open session across micro-batches;
  *     an event-time timeout would flush idle sessions).
  *
  * State per key is O(1) — just the open session — so at 1000 executors
  * the state store holds one small record per active user, not history.
  */
object StatefulSessions {

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp)
  final case class OpenSession(sessionId: Long, start: Timestamp, last: Timestamp, n: Long)
  final case class SessionOut(
      user_id: Long, session_id: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp)

  private val GapSec = 30L * 60
  private val GapMs = GapSec * 1000L

  /** Gap rule matches the SQL twin exactly: unix_timestamp() truncates to
    * whole seconds BEFORE differencing, so the comparison is on
    * second-truncated epochs (not sub-second-exact). */
  private def newSession(prev: Timestamp, cur: Timestamp): Boolean =
    cur.toInstant.getEpochSecond - prev.toInstant.getEpochSecond > GapSec

  /** Fold a key's (time-ordered) events through the open-session state,
    * emitting every CLOSED session; in batch mode the final open session is
    * emitted too (there is no next micro-batch to close it). */
  def sessionFunc(uid: Long, events: Iterator[Ev], state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
    val out = Seq.newBuilder[SessionOut]
    var open = state.getOption.orNull
    for (e <- sorted) {
      if (open == null) {
        open = OpenSession(1L, e.ts, e.ts, 1L)
      } else if (newSession(open.last, e.ts)) {
        out += SessionOut(uid, open.sessionId, open.n, open.start, open.last)
        open = OpenSession(open.sessionId + 1, e.ts, e.ts, 1L)
      } else {
        open = open.copy(last = e.ts, n = open.n + 1)
      }
    }
    if (open != null) {
      state.update(open)
      // batch semantics: flush the trailing session too (no next micro-batch)
      out += SessionOut(uid, open.sessionId, open.n, open.start, open.last)
    }
    out.result().iterator
  }

  /** Batch entry: run the stateful function over the events table. */
  def sessionize(spark: SparkSession, dir: String): Dataset[SessionOut] = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select("user_id", "event_id", "ts")
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(sessionFunc)
  }

  /** STREAMING variant of the state function: closed sessions are emitted
    * as soon as a later event closes them; the OPEN session is flushed by
    * an event-time timeout once the watermark passes last + gap — the
    * standard streaming-sessionization contract (a session still open when
    * the watermark hasn't caught up is withheld, not guessed at). */
  def sessionFuncStreaming(uid: Long, events: Iterator[Ev], state: GroupState[OpenSession]): Iterator[SessionOut] = {
    if (state.hasTimedOut) {
      val open = state.get
      state.remove()
      Iterator.single(SessionOut(uid, open.sessionId, open.n, open.start, open.last))
    } else {
      val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
      val out = Seq.newBuilder[SessionOut]
      var open = state.getOption.orNull
      for (e <- sorted) {
        if (open == null) {
          open = OpenSession(1L, e.ts, e.ts, 1L)
        } else if (newSession(open.last, e.ts)) {
          out += SessionOut(uid, open.sessionId, open.n, open.start, open.last)
          open = OpenSession(open.sessionId + 1, e.ts, e.ts, 1L)
        } else {
          open = open.copy(last = e.ts, n = open.n + 1)
        }
      }
      if (open != null) {
        state.update(open)
        state.setTimeoutTimestamp(open.last.getTime + GapMs)
      }
      out.result().iterator
    }
  }

  /** Streaming entry over a file-source of event drops. */
  def sessionizeStream(spark: SparkSession, eventsStream: Dataset[Ev]): Dataset[SessionOut] = {
    import spark.implicits._
    eventsStream
      .withWatermark("ts", "1 minute")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(sessionFuncStreaming)
  }
}
