package graft.batch

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.Tables
import graft.stream.StreamPipeline

/** Event shape for the MV fold fixtures — nullable value like the real
  * column (producer injects null amounts by design). */
case class MvEvent(ts: Timestamp, event_type: String, value: Option[Double])

/** Incremental MV maintenance: merged partials ≡ one-shot recompute, under
  * any fold tree (associativity) and through the foreachBatch lifecycle —
  * the properties that let a deployment refresh a 100 TB summary without
  * rescanning history. */
class MvSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def canon(df: DataFrame): Set[org.apache.spark.sql.Row] =
    df.select("event_date", "event_type", "n_events", "n_null_value",
        "sum_cents", "max_ts", "avg_cents")
      .collect().toSet

  test("q_mv_merge (base ⊕ delta) equals the one-shot recompute") {
    val e = Tables.events(spark, sf)
    val got = canon(MvQueries.qMvMerge(spark, sf))
    val want = canon(MvQueries.finish(MvQueries.partials(e)))
    assert(want.nonEmpty && got == want)
    // the cutoff split is genuine: both sides non-empty, no row counted twice
    val cut = lit(MvQueries.Cutoff).cast("timestamp")
    assert(e.filter(col("ts") < cut).count() > 0 &&
      e.filter(col("ts") >= cut).count() > 0)
  }

  test("fold lifecycle: per-day deltas folded one at a time, any order, same view") {
    val e = Tables.events(spark, sf).localCheckpoint()
    val days = e.select(to_date(col("ts"))).distinct().as[java.sql.Date]
      .collect().sortBy(_.getTime).toSeq
    assert(days.size >= 3)
    val deltas = days.map(d =>
      MvQueries.partials(e.filter(to_date(col("ts")) === lit(d))))
    val want = canon(MvQueries.finish(MvQueries.partials(e)))
    val folded = deltas.reduceLeft((a, b) => MvQueries.merge(a, b).localCheckpoint())
    assert(canon(MvQueries.finish(folded)) == want)
    val foldedRev = deltas.reverse
      .reduceLeft((a, b) => MvQueries.merge(a, b).localCheckpoint())
    assert(canon(MvQueries.finish(foldedRev)) == want)
  }

  test("partials algebra: all-null group publishes NULL avg; nulls counted not summed") {
    val batch1 = Seq(
      MvEvent(ts("2024-02-01 10:00:00"), "view", Some(1.25)),
      MvEvent(ts("2024-02-01 11:00:00"), "view", None),
      MvEvent(ts("2024-02-01 12:00:00"), "error", None)).toDS().toDF()
    val batch2 = Seq(
      MvEvent(ts("2024-02-01 13:00:00"), "view", Some(2.77)),
      MvEvent(ts("2024-02-01 09:00:00"), "error", None)).toDS().toDF()
    val mv = MvQueries.finish(MvQueries.merge(
      MvQueries.partials(batch1), MvQueries.partials(batch2)))
    val byType = mv.collect().map(r => r.getString(1) -> r).toMap
    val v = byType("view")
    assert(v.getLong(2) == 3L && v.getLong(3) == 1L && v.getLong(4) == 402L)
    assert(v.getTimestamp(5) == ts("2024-02-01 13:00:00"))
    assert(v.getLong(6) == 201L) // 402 cents over 2 non-null rows
    val err = byType("error")
    assert(err.getLong(2) == 2L && err.getLong(3) == 2L && err.getLong(4) == 0L)
    assert(err.isNullAt(6)) // all-null group: no average, not 0
  }

  test("stream: foreachBatch fold over micro-batches equals the batch recompute") {
    implicit val sqlCtx = spark.sqlContext
    val all = Seq(
      MvEvent(ts("2024-03-01 00:00:01"), "view", Some(10.0)),
      MvEvent(ts("2024-03-01 00:00:02"), "click", None),
      MvEvent(ts("2024-03-02 00:00:03"), "view", Some(0.07)),
      MvEvent(ts("2024-03-02 00:00:04"), "view", Some(99.99)),
      MvEvent(ts("2024-03-02 00:00:05"), "click", Some(5.55)))
    var state = MvQueries.partials(Seq.empty[MvEvent].toDS().toDF())
      .localCheckpoint()
    val ms = MemoryStream[MvEvent]
    val q = StreamPipeline.start(ms.toDS().toDF(),
      StreamPipeline.ForeachBatch((batch, _) => {
        state = MvQueries.merge(state, MvQueries.partials(batch)).localCheckpoint()
      }, trigger = Trigger.ProcessingTime(0L)))
    ms.addData(all.take(2)); q.processAllAvailable()
    ms.addData(all.slice(2, 4)); q.processAllAvailable()
    ms.addData(all.drop(4)); q.processAllAvailable()
    q.stop()
    val got = canon(MvQueries.finish(state))
    val want = canon(MvQueries.finish(MvQueries.partials(all.toDS().toDF())))
    assert(want.nonEmpty && got == want)
  }
}
