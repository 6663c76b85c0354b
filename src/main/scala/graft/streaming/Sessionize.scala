package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming sessionization over the `events` schema — the
  * streaming counterpart of the batch `e2_sessionize` query
  * (graft.queries.Relational). Two implementations:
  *
  *   - [[sessionWindow]]: the idiomatic Spark path — watermark + built-in
  *     `session_window` gap windows. State management, late-data handling,
  *     and spill are Spark's; this is what scales to a real cluster.
  *   - [[customSessions]]: `flatMapGroupsWithState` with explicit per-user
  *     state — the extension point for session logic the built-in window
  *     can't express (e.g. cross-field close conditions).
  */
object Sessionize {

  final case class Event(
      event_id: Long,
      ts: Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  final case class SessionOut(
      user_id: Long,
      session_start: Timestamp,
      session_end: Timestamp,
      n_events: Long,
      total_value: Double)

  private final case class SessionState(
      start: Long,
      last: Long,
      n: Long,
      total: Double)

  /** Watermarked gap-session aggregation. `events` may be a streaming or a
    * batch DataFrame with the events schema. */
  def sessionWindow(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("total_value"))
  }

  /** Custom per-user session state: closes a session when event time jumps
    * past the gap or the state times out at the watermark. Demonstrates the
    * `KeyValueGroupedDataset.flatMapGroupsWithState` extension point. */
  def customSessions(events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    // Resolved on the driver — the Dataset must not be captured in the
    // executor-side state function.
    val streaming = events.isStreaming

    def finish(userId: Long, s: SessionState): SessionOut =
      SessionOut(userId, new Timestamp(s.start), new Timestamp(s.last),
        s.n, math.rint(s.total * 100) / 100)

    val fn: (Long, Iterator[Event], GroupState[SessionState]) =>
        Iterator[SessionOut] = { (userId, rows, state) =>
      if (state.hasTimedOut) {
        val out = state.getOption.map(finish(userId, _)).iterator
        state.remove()
        out
      } else {
        var closed = List.empty[SessionOut]
        var cur = state.getOption
        rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.last <= gapMs =>
              cur = Some(s.copy(last = t, n = s.n + 1, total = s.total + e.value))
            case Some(s) =>
              closed ::= finish(userId, s)
              cur = Some(SessionState(t, t, 1, e.value))
            case None =>
              cur = Some(SessionState(t, t, 1, e.value))
          }
        }
        cur match {
          case Some(s) =>
            state.update(s)
            if (streaming) state.setTimeoutTimestamp(s.last + gapMs)
          case None => state.remove()
        }
        closed.reverseIterator
      }
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (streaming) GroupStateTimeout.EventTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)
  }
}
