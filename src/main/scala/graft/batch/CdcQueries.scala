package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/**
 * CDC merge / upsert — `MERGE INTO` semantics expressed as one full-outer
 * join, the lakehouse table-maintenance operator the reference's
 * append-only pipeline (spark/app.py K1 sink) never needs but every
 * mutable-snapshot consumer of such a pipeline does: apply a change feed
 * (last-writer-wins upserts + deletes) to a base snapshot.
 *
 * The kernel is [[merge]] — pure DataFrame-in/DataFrame-out so the spec
 * drives it over in-memory frames covering every MERGE branch (kept /
 * updated / inserted / deleted / unmatched-delete no-op), and a
 * foreachBatch sink could drive the identical kernel one micro-batch at a
 * time. [[qCdcMerge]] wires it to the corpus: `customer` as the base
 * snapshot, `events` as the change feed.
 */
object CdcQueries {

  /** Change feed op encoding: this event type is a DELETE, everything else
    * an UPSERT carrying the event's value as the new balance. */
  val DeleteType = "error"

  /** Apply a change feed to a base snapshot, MERGE-style.
    *
    * Inputs: `base(k, c_acctbal, c_mktsegment)`,
    * `changes(k, ts, event_id, is_del, cents)`. Last-writer order is the
    * FULL struct key (ts, event_id, is_del, cents): ties in `ts` resolve
    * on event_id (unique in the corpus — q_dq_audit measures it), and the
    * payload fields complete the total order so the winner stays
    * deterministic — and identical to the oracle's row_number over the
    * same four-column ORDER BY — even on inputs that violate that
    * uniqueness assumption.
    *
    * Shape: the feed FIRST collapses to one row per key via
    * `max(struct(ts, event_id, …))` — an ordinary hash aggregate with
    * map-side partial combine, so the shuffle carries one row per distinct
    * key per partition, never the raw feed (the window-function
    * formulation `row_number() = 1` would sort the whole feed instead).
    * Then ONE full-outer join on the key decides every branch:
    * matched+upsert → updated, matched+delete → dropped, unmatched change
    * → inserted, unmatched delete → no-op, untouched base → kept. Both
    * sides arrive key-partitioned from their own upstream, so at 100 TB
    * this is the minimal two-exchange plan; AQE handles the skewed-key
    * case. */
  def merge(base: DataFrame, changes: DataFrame): DataFrame = {
    val last = changes
      .groupBy(col("k"))
      .agg(max(struct(col("ts"), col("event_id"), col("is_del"), col("cents"))).as("c"))
      .select(col("k"), col("c.is_del").as("is_del"), col("c.cents").as("cents"),
        lit(true).as("in_chg"))
    base.withColumn("in_base", lit(true))
      .join(last, Seq("k"), "full_outer")
      .withColumn("in_base", coalesce(col("in_base"), lit(false)))
      .withColumn("in_chg", coalesce(col("in_chg"), lit(false)))
      .filter(!coalesce(col("is_del"), lit(false)))
      .select(col("k").as("cust_id"),
        when(!col("in_chg"), lit("kept"))
          .when(!col("in_base"), lit("inserted"))
          .otherwise(lit("updated")).as("status"),
        when(!col("in_chg"), col("c_acctbal"))
          .otherwise(col("cents") / lit(100.0)).as("balance"),
        col("c_mktsegment").as("segment"))
  }

  /** The corpus wiring: per user the LAST event (by ts, event_id) is the
    * surviving change; `error` events are deletes, the rest upsert the
    * event value (exact cents) as the new account balance. */
  def qCdcMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey").as("k"), col("c_acctbal"), col("c_mktsegment"))
    val changes = Tables.events(spark, dir).select(
      col("user_id").as("k"), col("ts"), col("event_id"),
      (col("event_type") === lit(DeleteType)).as("is_del"),
      Exact.cents(coalesce(col("value"), lit(0.0))).as("cents"))
    merge(base, changes)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_merge" -> (qCdcMerge _))

  val oracles: Map[String, String] = Map(
    "q_cdc_merge" ->
      s"""WITH chg AS (
         |  SELECT user_id AS k, ts, event_id,
         |    event_type = '$DeleteType' AS is_del,
         |    ${Exact.centsSql("coalesce(value, 0.0)")} AS cents
         |  FROM events),
         |last AS (
         |  SELECT k, is_del, cents FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY k
         |      ORDER BY ts DESC, event_id DESC, is_del DESC, cents DESC) AS rn
         |    FROM chg)
         |  WHERE rn = 1),
         |m AS (
         |  SELECT coalesce(b.c_custkey, l.k) AS k,
         |    b.c_custkey IS NOT NULL AS in_base,
         |    l.k IS NOT NULL AS in_chg,
         |    b.c_acctbal, b.c_mktsegment,
         |    coalesce(l.is_del, FALSE) AS is_del, l.cents
         |  FROM customer b FULL OUTER JOIN last l ON b.c_custkey = l.k)
         |SELECT k AS cust_id,
         |  CASE WHEN NOT in_chg THEN 'kept'
         |       WHEN NOT in_base THEN 'inserted'
         |       ELSE 'updated' END AS status,
         |  CASE WHEN NOT in_chg THEN c_acctbal
         |       ELSE CAST(cents AS DOUBLE) / 100.0 END AS balance,
         |  c_mktsegment AS segment
         |FROM m WHERE NOT is_del""".stripMargin)
}
