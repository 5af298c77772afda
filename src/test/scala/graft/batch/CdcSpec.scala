package graft.batch

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** MERGE semantics of the CDC kernel: every branch exercised on an
  * in-memory example, plus the cardinality equation on the corpus. */
class CdcSpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("merge kernel: kept / updated / inserted / deleted / unmatched-delete no-op") {
    import spark.implicits._
    val base = Seq(
      (1L, 10.0, "A"),   // untouched → kept
      (2L, 20.0, "B"),   // upserted → updated
      (3L, 30.0, "C"),   // deleted → dropped
      (6L, 60.0, "F"))   // last-wins target
      .toDF("k", "c_acctbal", "c_mktsegment")
    val changes = Seq(
      (2L, ts(100), 1L, false, 9900L),  // update key 2 → 99.00
      (3L, ts(100), 2L, true, 0L),      // delete key 3
      (4L, ts(100), 3L, false, 4400L),  // insert key 4 → 44.00
      (5L, ts(100), 4L, true, 0L),      // delete of absent key → no-op
      (6L, ts(100), 5L, false, 1L),     // superseded by…
      (6L, ts(200), 6L, false, 6600L))  // …the later write → 66.00
      .toDF("k", "ts", "event_id", "is_del", "cents")

    val out = CdcQueries.merge(base, changes)
      .collect().map(r => (r.getLong(0), (r.getString(1), r.getDouble(2)))).toMap
    assert(out == Map(
      1L -> ("kept", 10.0),
      2L -> ("updated", 99.0),
      4L -> ("inserted", 44.0),
      6L -> ("updated", 66.0)))
  }

  test("merge kernel: same-timestamp ties resolve by event_id") {
    import spark.implicits._
    val base = Seq((1L, 1.0, "A")).toDF("k", "c_acctbal", "c_mktsegment")
    val changes = Seq(
      (1L, ts(100), 7L, false, 700L),
      (1L, ts(100), 9L, false, 900L),   // higher event_id wins the tie
      (1L, ts(100), 8L, false, 800L))
      .toDF("k", "ts", "event_id", "is_del", "cents")
    val out = CdcQueries.merge(base, changes).collect()
    assert(out.length == 1 && out.head.getDouble(2) == 9.0)
  }

  test("merge kernel folds a change stream batch-by-batch to the one-shot result") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Seq((1L, 10.0, "A"), (2L, 20.0, "B"), (3L, 30.0, "C"))
      .toDF("k", "c_acctbal", "c_mktsegment")
    // event-time-ordered feed split into two micro-batches; covers
    // cross-batch re-update, delete→re-insert, and insert→delete
    val feed = Seq(
      (2L, 100L, 1L, false, 9900L),
      (3L, 110L, 2L, true, 0L),
      (4L, 120L, 3L, false, 4400L),
      (2L, 200L, 4L, false, 2222L),
      (3L, 210L, 5L, false, 3300L),
      (4L, 220L, 6L, true, 0L))
    def toDf(s: Seq[(Long, Long, Long, Boolean, Long)]) =
      s.map { case (k, t, e, d, c) => (k, ts(t), e, d, c) }
        .toDF("k", "ts", "event_id", "is_del", "cents")
    val (b1, b2) = feed.splitAt(3)

    // the streaming deployment: foreachBatch folds each micro-batch into
    // the snapshot with the SAME kernel the batch query uses
    var snapshot = base
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (Long, Timestamp, Long, Boolean, Long)]
    val q = graft.stream.StreamPipeline.start(
      ms.toDF().toDF("k", "ts", "event_id", "is_del", "cents"),
      graft.stream.StreamPipeline.ForeachBatch((batch, _) => {
        snapshot = CdcQueries.merge(snapshot, batch)
          .select(col("cust_id").as("k"), col("balance").as("c_acctbal"),
            col("segment").as("c_mktsegment"))
          .localCheckpoint()
      }))
    ms.addData(b1.map { case (k, t, e, d, c) => (k, ts(t), e, d, c) }: _*)
    q.processAllAvailable()
    ms.addData(b2.map { case (k, t, e, d, c) => (k, ts(t), e, d, c) }: _*)
    q.processAllAvailable()
    q.stop()

    // one-shot LWW merge sees only each key's final op, so presence and
    // balance must agree with the fold (segment can differ for a
    // delete→re-insert key: the fold forgets the deleted row's segment)
    val folded = snapshot.select("k", "c_acctbal")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val oneShot = CdcQueries.merge(base, toDf(feed))
      .select("cust_id", "balance")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(folded == oneShot)
    assert(folded == Set(1L -> 10.0, 2L -> 22.22, 3L -> 33.0))
  }

  test("q_cdc_merge: cardinality equation holds on the corpus") {
    val out = CdcQueries.qCdcMerge(spark, sf)
    val base = Tables.customer(spark, sf).select("c_custkey")
    val lastType = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("c"))
      .select(col("user_id"), (col("c.event_type") === CdcQueries.DeleteType).as("del"))
    val nBase = base.count()
    val dels = lastType.filter(col("del"))
    val delMatched = dels.join(base, col("user_id") === col("c_custkey")).count()
    val inserts = lastType.filter(!col("del"))
      .join(base, col("user_id") === col("c_custkey"), "left_anti").count()
    assert(out.count() == nBase - delMatched + inserts)
    // deleted keys are gone; statuses partition the output
    assert(out.join(dels, out("cust_id") === dels("user_id")).count() == 0)
    val byStatus = out.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus.keySet.subsetOf(Set("kept", "updated", "inserted")))
    assert(byStatus.values.sum == out.count())
  }
}
