package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state beyond the reference's surface: gap-based
  * sessionization of the events stream with
  * `flatMapGroupsWithState` — the Structured Streaming primitive for
  * arbitrary per-key state (the reference's only state was the leader's
  * running aggregate map, O8; this is the general form).
  *
  * A session closes when its user is silent for `gapMinutes`. State per
  * key is one open session (start, last, count) — O(users) state, not
  * O(events); with event-time timeout + watermark this runs unbounded.
  *
  * Ordering contract: within a micro-batch events are sorted here, but
  * ACROSS batches a key's events must arrive event-time-monotonically
  * (a later batch never carries an event older than an earlier batch's
  * for the same key) — the property a watermarked, time-ordered source
  * provides and the x33 feed pins with its ts-range split. One open
  * session per key cannot be correct under arbitrary cross-batch
  * disorder: an event older than the open session may belong to a
  * session already CLOSED and emitted. Mild disorder inside the open
  * session's span is still handled exactly (both `start` and `last`
  * move to cover the event).
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  /** start/last are event-time MICROseconds — `Timestamp.getTime` is
    * millis and silently truncates the source's microsecond component
    * (caught by x33's DuckDB oracle, which keeps full precision). */
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long)

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000L * 1000000L + ts.getNanos / 1000L

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  def sessions(spark: SparkSession, events: Dataset[Event],
               gapMinutes: Int = 30): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed (last + gap): close and emit the session
            val s = state.get
            state.remove()
            Iterator.single(Session(user, toTs(s.start), toTs(s.last), s.n))
          } else {
            // micro-batch arrivals for this user, in event-time order
            val sorted = rows.toSeq.sortBy(e => micros(e.ts))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = micros(e.ts)
              cur match {
                case Some(s) if t - s.last <= gapUs =>
                  cur = Some(s.copy(start = math.min(s.start, t),
                    last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed ::= Session(user, toTs(s.start), toTs(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout API is millisecond-granular; round UP so the
              // session cannot close before last + gap has fully passed
              state.setTimeoutTimestamp((s.last + gapUs + 999L) / 1000L)
            }
            closed.reverseIterator
          }
      }
  }
}
