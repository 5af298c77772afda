package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.batch.SketchQueries
import graft.functions.{Exact, VectorFunctions}

/**
 * Streaming twin of the KMV distinct sketch: the native BottomKPairs
 * aggregate runs UNCHANGED inside a streaming groupBy — its buffer
 * serializes into the state store (O(k) state per group, the property
 * that makes a distinct-count sketch streamable at all, where exact
 * countDistinct state grows with cardinality). The final sketch over the
 * stream must equal the batch sketch over the union of all micro-batches:
 * bottom-k is a semilattice fold, so arrival order and batch boundaries
 * cannot change it.
 */
class KmvStreamSpec extends SparkSpec {

  import spark.implicits._

  test("streaming KMV sketch over micro-batches equals the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val h = Exact.md5Long48(concat(lit("kmv|"), col("user_id")))
    val agg = ms.toDF().toDF("event_type", "user_id")
      .select(col("event_type"), h.as("h"))
      .groupBy(col("event_type"))
      .agg(VectorFunctions.bottomKPairs(col("h"), col("h"), SketchQueries.KmvK)
        .as("sk"))
      .select(col("event_type"), size(col("sk")).as("n_sketch"),
        expr("sk[0].key").as("h_min"))
    val q = agg.writeStream
      .format("memory").queryName("kmv_stream")
      .outputMode(OutputMode.Complete())
      .start()

    // three micro-batches with overlapping users — dedup must be
    // cross-batch (state), not per-batch
    val b1 = (1L to 40L).map(u => ("click", u))
    val b2 = (21L to 80L).map(u => ("click", u))   // 20 repeats, 40 new
    val b3 = (1L to 100L).map(u => ("view", u))    // second group
    ms.addData(b1: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable()
    ms.addData(b3: _*); q.processAllAvailable()

    val streamed = spark.table("kmv_stream")
      .as[(String, Int, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

    // batch truth over the union of the three batches
    val batch = (b1 ++ b2 ++ b3).toDF("event_type", "user_id")
      .select(col("event_type"), h.as("h"))
      .groupBy(col("event_type"))
      .agg(VectorFunctions.bottomKPairs(col("h"), col("h"), SketchQueries.KmvK)
        .as("sk"))
      .select(col("event_type"), size(col("sk")).as("n_sketch"),
        expr("sk[0].key").as("h_min"))
      .as[(String, Int, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

    assert(streamed == batch, s"stream $streamed != batch $batch")
    // click saw 80 distinct users (> k=64) ⇒ sketch saturated at k;
    // the three repeats were deduped by the buffer's set semantics
    assert(streamed("click")._1 == SketchQueries.KmvK)
    q.stop()
  }

  test("streaming latest-k history equals the batch history over all micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, Long, Long)] // (user_id, ts_micros, event_id)
    def hist(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("user_id"))
      .agg(VectorFunctions.bottomKPairs(col("negts"), col("event_id"), 4).as("h"))
      .select(col("user_id"), expr("transform(h, p -> p.value)").as("ids"))
    val q = hist(ms.toDF().toDF("user_id", "tsm", "event_id")
      .select(col("user_id"), (-col("tsm")).as("negts"), col("event_id")))
      .writeStream.format("memory").queryName("hist_stream")
      .outputMode(OutputMode.Complete()).start()
    // out-of-order arrival across batches: newest events in the FIRST
    // batch — the latest-k fold is order-independent, so it must not matter
    val b1 = Seq((1L, 900L, 9L), (1L, 800L, 8L), (2L, 100L, 1L))
    val b2 = Seq((1L, 100L, 1L), (1L, 200L, 2L), (1L, 300L, 3L), (1L, 850L, 85L))
    ms.addData(b1: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable()
    val streamed = spark.table("hist_stream")
      .as[(Long, Seq[Long])].collect().toMap
    q.stop()
    val batch = hist((b1 ++ b2).toDF("user_id", "tsm", "event_id")
      .select(col("user_id"), (-col("tsm")).as("negts"), col("event_id")))
      .as[(Long, Seq[Long])].collect().toMap
    assert(streamed == batch)
    // user 1: latest 4 of 6 events by time desc = ids 9, 85, 8, 3
    assert(streamed(1L) == Seq(9L, 85L, 8L, 3L))
  }
}
