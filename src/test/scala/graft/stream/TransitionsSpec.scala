package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.Tables

/** Streaming twin of q_transitions: per-user last-event state, ordered
  * emission, late-row drop — cumulative parity with the batch lag() on
  * in-order feeds. */
class TransitionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** The batch reference: lag() steps over a static frame. */
  private def batchSteps(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    df.withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .select(col("user_id"), col("prev_type"), col("event_type").as("next_type"),
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("gap_us"))
      .as[(Long, String, String, Long)].collect().toSet
  }

  test("batch-mode run over the events table equals the lag() formulation") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val got = StreamTransitions.steps(ev.as[TypedEvent])
      .select(col("user_id"), col("prev_type"), col("next_type"), col("gap_us"))
      .as[(Long, String, String, Long)].collect().toSet
    val want = batchSteps(ev)
    assert(want.nonEmpty && got == want)
  }

  test("stream: transitions link across micro-batches; late rows drop, state stays last-event") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[TypedEvent]
    val q = StreamPipeline.start(StreamTransitions.steps(ms.toDS()).toDF(),
      StreamPipeline.Memory("transitions_out", trigger = Trigger.ProcessingTime(0L)))
    // batch 1: user 1 view→click (out of order within the batch — must sort)
    ms.addData(
      TypedEvent(1L, ts("2024-01-01 00:00:10"), 2L, "click"),
      TypedEvent(1L, ts("2024-01-01 00:00:00"), 1L, "view"))
    q.processAllAvailable()
    // batch 2: the cross-batch link click→purchase, plus a LATE view that
    // predates the carried state and must vanish
    ms.addData(
      TypedEvent(1L, ts("2024-01-01 00:00:30"), 3L, "purchase"),
      TypedEvent(1L, ts("2024-01-01 00:00:05"), 9L, "view"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("transitions_out")
      .select("prev_type", "next_type", "gap_us")
      .as[(String, String, Long)].collect().sortBy(_._3)
    assert(rows.toSeq == Seq(
      ("view", "click", 10000000L),
      ("click", "purchase", 20000000L)),
      s"got ${rows.toSeq}")
  }

  test("stream: cumulative multi-batch feed in order equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[TypedEvent]
      .collect().sortBy(e => (StreamTransitions.micros(e.ts), e.event_id)).toSeq
    val (h1, h2) = ev.splitAt(ev.length / 2)
    val ms = MemoryStream[TypedEvent]
    val q = StreamPipeline.start(StreamTransitions.steps(ms.toDS()).toDF(),
      StreamPipeline.Memory("transitions_cum", trigger = Trigger.ProcessingTime(0L)))
    ms.addData(h1: _*)
    q.processAllAvailable()
    ms.addData(h2: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("transitions_cum")
      .select(col("user_id"), col("prev_type"), col("next_type"), col("gap_us"))
      .as[(Long, String, String, Long)].collect().toSet
    val want = batchSteps(Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))
    assert(got == want, s"stream=${got.size} batch=${want.size}")
  }
}
