package graft.stream

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Input/output row for the transformWithState dedup stage. */
case class DedupEvent(event_id: String, event_time: Timestamp, amount: Double)

/**
 * First-seen streaming dedup on the MODERN arbitrary-state API
 * (`transformWithState`, Spark 4.x) — the operator the reference's
 * unbounded `dropDuplicates("event_id")` (reference spark/app.py:79,
 * SURVEY §2.6 D1 ⚠) should have been.
 *
 * Why this API and not `flatMapGroupsWithState` (which [[Sessionize]]
 * uses): state lifetime here is a pure retention policy, and
 * `transformWithState` expresses that DECLARATIVELY via [[TTLConfig]] —
 * the state store evicts expired entries itself (RocksDB provider
 * required), with no hand-written timeout bookkeeping. Sessionize keeps
 * the older API deliberately: its expiry is semantic (watermark vs
 * session-gap deadlines), not a retention policy, and the two operators
 * together cover both state-management surfaces.
 *
 * Semantics: the FIRST event per event_id inside the TTL horizon is
 * emitted; duplicates within the horizon are dropped — including
 * duplicates arriving in the same micro-batch (first-in-iterator wins,
 * matching the reference's dropDuplicates). An event recurring after its
 * id's state expired re-emits: TTL IS the dedup horizon, stated instead
 * of hidden — the reference's version simply never frees the id set and
 * dies by memory on any long-running stream.
 *
 * Spark 4.1.2 caveat (pinned in TwsDedupSpec's scaladoc): ProcessingTime
 * time-mode (which TTL requires) schedules perpetual no-data batches for
 * expiry evaluation, so `Trigger.AvailableNow` never terminates and
 * `processAllAvailable` never stabilizes in a local test harness — and a
 * no-data batch can die on a planner NPE (PythonSQLMetrics touched with a
 * null session). Pass `ttl = None` to run in TimeMode.None — identical
 * dedup semantics, state retained indefinitely (the reference's original
 * behavior, explicit) — which is the mode the spec executes end-to-end;
 * the TTL variant is production config on a long-running cluster query.
 *
 * Scale: state is one boolean-sized entry per distinct id within the
 * horizon, hash-sharded by key across executors; RocksDB spills it off
 * heap. 100 TB/day of events at a 1 h horizon is bounded by ids/hour,
 * not stream lifetime.
 */
class FirstSeenDedup(ttl: Option[Duration])
    extends StatefulProcessor[String, DedupEvent, DedupEvent] {

  @transient private var seen: ValueState[Boolean] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean,
      ttl.map(TTLConfig(_)).getOrElse(TTLConfig.NONE))

  override def handleInputRows(key: String, rows: Iterator[DedupEvent],
                               timers: TimerValues): Iterator[DedupEvent] = {
    if (seen.exists()) Iterator.empty
    else {
      seen.update(true)
      // first occurrence in arrival order — within-batch duplicates drop too
      rows.take(1)
    }
  }
}

object TwsDedup {

  /** Streaming first-seen dedup; `ttl = Some(horizon)` bounds the id set
    * (ProcessingTime time-mode), `None` retains ids for the stream's
    * lifetime (TimeMode.None — see the 4.1.2 caveat above). Requires the
    * RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`). */
  def apply(events: Dataset[DedupEvent], ttl: Option[Duration]): Dataset[DedupEvent] = {
    implicit val enc = Encoders.product[DedupEvent]
    val timeMode = if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    events
      .groupByKey(_.event_id)(Encoders.STRING)
      .transformWithState(new FirstSeenDedup(ttl), timeMode, OutputMode.Append())
  }
}
