package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for the transition stream (the events-table shape). */
case class TypedEvent(user_id: Long, ts: Timestamp, event_id: Long, event_type: String)

/** One emitted step: the user moved prev_type → next_type after gap_us. */
case class TransitionStep(user_id: Long, prev_type: String, next_type: String,
                          ts: Timestamp, gap_us: Long)

/** Per-user carry state: the last event already linked into the chain. */
case class LastSeen(ts_us: Long, event_id: Long, event_type: String)

/**
 * The batch `q_transitions` step extraction as a STREAM: one
 * `flatMapGroupsWithState` keyed on user whose state is the single last
 * event seen — O(1) state per user, emitted steps append-only.
 *
 * Ordering contract (the part a stream must make explicit where batch
 * lag() gets it free from the sort):
 *
 *  - WITHIN a micro-batch, each group's rows sort by (ts, event_id) —
 *    the identical total order the batch operator rides, so intra-batch
 *    out-of-order arrival is invisible.
 *  - ACROSS micro-batches, an event at-or-behind the carried state's
 *    (ts, event_id) would splice into already-emitted history; emitted
 *    steps are immutable, so such late rows DROP rather than reorder —
 *    the same drop-don't-rewrite trade Spark's own
 *    `dropDuplicates`-within-watermark makes (reference
 *    kafka_spark_etl.py:108-115 inherits the unbounded variant of this
 *    problem; graft bounds it). On an in-order feed the emitted steps
 *    equal the batch operator exactly — spec-pinned cumulatively across
 *    batch boundaries.
 *
 * Scale: state is one (long, long, string) per user — millions of users
 * = megabytes per executor, RocksDB-backable like the dedup state; the
 * downstream matrix aggregation is the same |types|²-bounded groupBy as
 * the batch plan and can run in update mode on this append stream.
 */
object StreamTransitions {

  // floorDiv, not /: getTime truncates toward zero, so a pre-epoch
  // timestamp (negative millis) would land one second late and break
  // stream/batch parity with unix_micros() (ADVICE r9)
  private[stream] def micros(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000

  def steps(events: Dataset[TypedEvent]): Dataset[TransitionStep] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[LastSeen, TransitionStep](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[TypedEvent], state: GroupState[LastSeen]) =>
          val sorted = it.toIndexedSeq.sortBy(e => (micros(e.ts), e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[TransitionStep]
          sorted.foreach { e =>
            val eUs = micros(e.ts)
            last match {
              case Some(l) if eUs < l.ts_us ||
                  (eUs == l.ts_us && e.event_id <= l.event_id) =>
                () // late behind emitted history: drop, never reorder
              case Some(l) =>
                out += TransitionStep(user, l.event_type, e.event_type, e.ts, eUs - l.ts_us)
                last = Some(LastSeen(eUs, e.event_id, e.event_type))
              case None =>
                last = Some(LastSeen(eUs, e.event_id, e.event_type))
            }
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }
}
