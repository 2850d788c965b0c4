package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming gap-based sessionization with custom state
 * (flatMapGroupsWithState + event-time timeout) — the stateful-operator
 * tier Structured Streaming reserves for semantics its built-in windows
 * can't express.
 *
 * State per key is ONE open session (constant size — the 100 TB constraint:
 * state must not grow with event count). Sessions close and emit either
 * when a new event arrives more than `gapMinutes` after the session end, or
 * when the event-time watermark passes end + gap (timeout path), whichever
 * comes first. Late events behind the watermark were already dropped by
 * withWatermark upstream.
 */
object SessionizeStream {

  final case class Event(key: String, ts: Timestamp, value: Double)
  final case class OpenSession(startMs: Long, endMs: Long, n: Long, sum: Double)
  final case class Session(key: String, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, value_sum: Double)

  def byGap(events: Dataset[Event], gapMinutes: Int,
            watermark: String = "10 minutes"): Dataset[Session] = {
    val gapMs = gapMinutes * 60L * 1000L
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]

    def close(key: String, s: OpenSession): Session =
      Session(key, new Timestamp(s.startMs), new Timestamp(s.endMs), s.n, s.sum)

    def update(key: String, rows: Iterator[Event],
               state: GroupState[OpenSession]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(key, _)).iterator
        state.remove()
        return out
      }
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t - s.endMs <= gapMs =>
            open = Some(OpenSession(s.startMs, math.max(s.endMs, t),
              s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed += close(key, s)
            open = Some(OpenSession(t, t, 1, e.value))
          case None =>
            open = Some(OpenSession(t, t, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.endMs + gapMs)
      }
      closed.result().iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.key)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
