package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input contract for sessionization. */
case class SessionEvent(user_id: Long, event_time: Timestamp, amount: Double)

/** A closed session (emitted only when the gap timeout passes). */
case class UserSession(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long,
    total_amount: Double)

/** Mutable per-user state carried across micro-batches. */
case class SessionBuf(start: Long, last: Long, n: Long, total: Double)

/**
 * Custom stateful operator: event-time sessionization with a gap timeout,
 * via `flatMapGroupsWithState` — the surface for semantics Spark's built-in
 * windows can't express (a session ends `gap` after its LAST event, not at
 * a fixed boundary).
 *
 * Scale design: state is one tiny fixed-size buffer per ACTIVE user, keyed
 * by user_id (high cardinality ⇒ shards across executors); event-time
 * timeout + watermark guarantee every session eventually closes and its
 * state is freed — no unbounded growth. Emission is append-only: a session
 * is output exactly once, when the watermark passes its gap deadline.
 */
object Sessionize {

  /** @param gapSeconds session closes after this much event-time silence */
  def apply(events: Dataset[SessionEvent], gapSeconds: Long,
            watermark: String = "30 seconds"): Dataset[UserSession] = {
    implicit val outEnc = Encoders.product[UserSession]
    implicit val stateEnc = Encoders.product[SessionBuf]
    implicit val keyEnc = Encoders.scalaLong
    val gapMs = gapSeconds * 1000L

    events
      .withWatermark("event_time", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuf, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionBuf]) =>

        def close(b: SessionBuf): UserSession =
          UserSession(userId, new Timestamp(b.start), new Timestamp(b.last), b.n, b.total)

        if (state.hasTimedOut) {
          // watermark passed last+gap: session is final, free the state
          val out = state.getOption.map(close).toList
          state.remove()
          out.iterator
        } else {
          // fold this micro-batch's events (sorted — arrival order within a
          // batch is not time order) into sessions, emitting any session
          // whose gap elapsed INSIDE the batch
          val sorted = batch.toSeq.sortBy(e => (e.event_time.getTime, e.amount))
          var buf = state.getOption
          val closed = List.newBuilder[UserSession]
          sorted.foreach { e =>
            val t = e.event_time.getTime
            buf match {
              case Some(b) if t - b.last <= gapMs =>
                buf = Some(SessionBuf(b.start, math.max(b.last, t), b.n + 1, b.total + e.amount))
              case Some(b) =>
                closed += close(b)
                buf = Some(SessionBuf(t, t, 1, e.amount))
              case None =>
                buf = Some(SessionBuf(t, t, 1, e.amount))
            }
          }
          buf.foreach { b =>
            state.update(b)
            state.setTimeoutTimestamp(b.last + gapMs)
          }
          closed.result().iterator
        }
      }
  }
}
