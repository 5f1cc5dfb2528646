package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization over an event stream — the "arbitrary
  * stateful operator" class the reference never uses (SURVEY.md §2.9:
  * mapGroupsWithState absent), provided as an engine extension.
  *
  * Batch path: the native `session_window` operator (see
  * Queries.sessionize, oracle-checked). Streaming path: per-user state via
  * flatMapGroupsWithState with an event-time timeout — state per key is one
  * open session (bounded), sessions emit when the watermark passes their
  * gap, giving exactly-once session rows under checkpointing.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, lastTs: Long, n: Long, sum: Double)
  final case class Session(
      user_id: Long, session_start: Timestamp, n_events: Long, sum_value: Double)

  /** Streaming sessionizer: emits a Session row once `gapMs` of event time
    * passes with no activity for the user (or on state timeout).
    */
  /** @param watermarkDelay lateness tolerance; defaults to the session gap
    *                        so any event the watermark admits can still
    *                        legally extend an open session.
    */
  def sessions(
      events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = null): Dataset[Session] = {
    import events.sparkSession.implicits._
    val delay = Option(watermarkDelay)
      .getOrElse(s"${math.max(1L, gapMs / 1000)} seconds")
    events
      .withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // inclusive boundary: the native session_window merges an
                // event at EXACTLY lastTs+gap (adjacent windows touch), so
                // the streaming path must too — caught by the parity spec
                case Some(s) if t - s.lastTs <= gapMs =>
                  // max: an out-of-order (but non-late) event must not
                  // regress lastTs and shorten the event-time timeout;
                  // min on start keeps session_start = earliest event
                  cur = Some(s.copy(start = math.min(s.start, t),
                    lastTs = math.max(s.lastTs, t),
                    n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start), s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the open session once event time passes lastTs + gap
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
