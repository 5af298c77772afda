package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/**
 * Batch-oracleable twins of the reference pipeline's operators (SURVEY §2),
 * phrased over the test-corpus `events` table (FIXTURES.md §B maps
 * `ts`↔event_time, `value`↔amount, `event_type`↔device-style string).
 *
 * Every query here has a DuckDB oracle in [[oracles]]; genuinely streaming
 * semantics (watermarks, state, triggers) are tested in ScalaTest instead
 * (SURVEY §5.2).
 */
object EventsQueries {

  /** P1/P2/P4–P8, P12 (reference app.py:61–76): JSON field extraction,
    * normalize, uppercase, null-fill, date derivation — one projection, no
    * shuffle; must compile to a single WholeStageCodegen over the scan. */
  def qClean(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"), col("ts"), col("user_id"),
      coalesce(lower(trim(col("event_type"))), lit("unknown")).as("event_norm"),
      upper(coalesce(col("event_type"), lit("unknown"))).as("event_type_uc"),
      coalesce(col("value"), lit(0.0)).as("amount"),
      get_json_object(col("props"), "$.k").cast("int").as("prop_k"),
      to_date(col("ts")).as("event_date"))

  /** D1 (reference app.py:77–79) with deterministic keep-first semantics:
    * row_number over a total order instead of dropDuplicates' arbitrary
    * winner, so batch runs and the oracle agree. Shuffles once on the
    * high-cardinality dedup key — the correct 100 TB layout. */
  def qDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_id")
      .orderBy(col("ts"), col("value"), col("user_id"), col("event_type"), col("props"))
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** J1–J3 (reference app.py:128–137): fact LEFT-joins two dims. Both dims
    * are small ⇒ broadcast, so the 100 TB fact side never shuffles. The
    * reference dropped users.country pre-join to avoid collision (J3); here
    * the projection serves the same purpose. */
  def qEnrich(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_id"), col("ts"), col("user_id"),
      coalesce(col("value"), lit(0.0)).as("amount"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
    val nat = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    ev.join(broadcast(cust), ev("user_id") === cust("c_custkey"), "left")
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"), "left")
      .select(col("event_id"), col("ts"), col("user_id"), col("amount"),
        col("c_mktsegment").as("segment"), col("n_name").as("nation"))
  }

  /** T2 + A1/A2/A4 (reference app.py:163–174) batch twin: sliding window
    * (60 s window, 30 s slide — every event lands in exactly 2 windows),
    * exact distinct instead of HLL so DuckDB can oracle it
    * (approx_count_distinct is covered by [[qApproxDistinct]] + ScalaTest).
    * Window bounds emitted as epoch seconds: DuckDB's to_timestamp returns
    * timestamptz, which would break schema comparison. */
  def qWindowAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "60 seconds", "30 seconds"), col("event_type"))
      .agg(
        (sum(Exact.cents(coalesce(col("value"), lit(0.0)))) / lit(100.0)).as("total_amount"),
        countDistinct(col("event_id")).as("unique_events"),
        max(col("ts")).as("max_ts"))
      .select(
        col("window.start").cast("long").as("win_start"),
        col("window.end").cast("long").as("win_end"),
        col("event_type"), col("total_amount"), col("unique_events"), col("max_ts"))

  /** Daily aggregate + rank — A5 + O1 + W1 (reference
    * kafka_spark_etl.py:63–78): revenue/events per (day, type), then
    * ROW_NUMBER within each day by revenue desc. Rank input is exact-cents
    * derived ⇒ deterministic ordering; event_type breaks ties. */
  private def daily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(
        sum(Exact.cents(coalesce(col("value"), lit(0.0)))).as("revenue_cents"),
        countDistinct(col("event_id")).as("daily_events"))

  def qDailyRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_date")
      .orderBy(col("revenue_cents").desc, col("event_type"))
    daily(spark, dir)
      .withColumn("revenue_rank_in_date", row_number().over(w).cast("long"))
      .select(col("event_date"), col("event_type"),
        (col("revenue_cents") / lit(100.0)).as("daily_revenue"),
        col("daily_events"), col("revenue_rank_in_date"))
  }

  /** D2 + J4 + A6 (reference kafka_spark_etl.py:92–100): build a
    * deterministic dim (is_major functionally depends on event_type, so
    * dropDuplicates' arbitrary winner is harmless — same trick the reference
    * relies on), LEFT-join onto the daily aggregate, roll up by flag. */
  def qPremiumRollup(spark: SparkSession, dir: String): DataFrame = {
    val dim = Tables.events(spark, dir)
      .select(col("event_type"),
        col("event_type").isin("purchase", "signup").as("is_major"))
      .dropDuplicates("event_type")
    daily(spark, dir)
      .join(broadcast(dim), Seq("event_type"), "left")
      .groupBy(col("event_date"), col("is_major"))
      .agg((sum(col("revenue_cents")) / lit(100.0)).as("total_revenue"))
  }

  /** A3 (reference app.py:171): HLL++ distinct — streaming-safe cardinality.
    * Spec-only (SparkEntry.specOnly): HLL implementations differ across
    * engines, so no DuckDB hash gate is possible by design; QueriesSpec
    * asserts 5% tolerance against [[qExactDistinct]] on identical data.
    * The oracled gate for this grain is [[qExactDistinct]]. */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n_events"))

  /** Exact twin of [[qApproxDistinct]] at the identical grain — the green
    * oracle row the sketch stands next to: same scan, same grouping,
    * `count(DISTINCT user_id)` instead of the HLL estimate. At 100 TB the
    * expand-shuffle exact distinct is the expensive path and the sketch is
    * the scale path; registering BOTH keeps the sketch's reference answer
    * under the driver's hash gate every round. */
  def qExactDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_clean"           -> (qClean _),
    "q_dedup"           -> (qDedup _),
    "q_enrich"          -> (qEnrich _),
    "q_window_agg"      -> (qWindowAgg _),
    "q_daily_rank"      -> (qDailyRank _),
    "q_premium_rollup"  -> (qPremiumRollup _),
    "q_exact_distinct"  -> (qExactDistinct _))

  /** Driver-invisible registrations: sketch queries whose outputs cannot
    * hash-match a foreign engine by design (SURVEY §5.2) live here so
    * COVERAGE.md rows point at a real registration while the correctness
    * file carries only oracle-gated rows. Tolerance specs pin each one
    * against its exact twin. */
  val specOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_approx_distinct" -> (qApproxDistinct _))

  private val centsValue = Exact.centsSql("coalesce(value, 0.0)")

  val oracles: Map[String, String] = Map(
    "q_clean" ->
      """SELECT event_id, ts, user_id,
        |  coalesce(lower(trim(event_type)), 'unknown') AS event_norm,
        |  upper(coalesce(event_type, 'unknown')) AS event_type_uc,
        |  coalesce(value, 0.0) AS amount,
        |  TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
        |  CAST(ts AS DATE) AS event_date
        |FROM events""".stripMargin,
    "q_dedup" ->
      """SELECT * FROM events
        |QUALIFY row_number() OVER (
        |  PARTITION BY event_id
        |  ORDER BY ts, value, user_id, event_type, props) = 1""".stripMargin,
    "q_enrich" ->
      """SELECT e.event_id, e.ts, e.user_id,
        |  coalesce(e.value, 0.0) AS amount,
        |  c.c_mktsegment AS segment, n.n_name AS nation
        |FROM events e
        |LEFT JOIN customer c ON e.user_id = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey""".stripMargin,
    "q_window_agg" ->
      s"""SELECT
         |  CAST(floor(epoch(ts)/30)*30 - 30*o AS BIGINT) AS win_start,
         |  CAST(floor(epoch(ts)/30)*30 - 30*o + 60 AS BIGINT) AS win_end,
         |  event_type,
         |  (CAST(sum($centsValue) AS DOUBLE) / 100.0) AS total_amount,
         |  count(DISTINCT event_id) AS unique_events,
         |  max(ts) AS max_ts
         |FROM events CROSS JOIN (SELECT unnest(generate_series(0, 1)) AS o) offs
         |GROUP BY 1, 2, 3""".stripMargin,
    "q_daily_rank" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS event_date, event_type,
         |    CAST(sum($centsValue) AS BIGINT) AS revenue_cents,
         |    count(DISTINCT event_id) AS daily_events
         |  FROM events GROUP BY 1, 2)
         |SELECT event_date, event_type,
         |  (CAST(revenue_cents AS DOUBLE) / 100.0) AS daily_revenue,
         |  daily_events,
         |  row_number() OVER (
         |    PARTITION BY event_date
         |    ORDER BY revenue_cents DESC, event_type) AS revenue_rank_in_date
         |FROM daily""".stripMargin,
    "q_premium_rollup" ->
      s"""WITH daily AS (
         |  SELECT CAST(ts AS DATE) AS event_date, event_type,
         |    CAST(sum($centsValue) AS BIGINT) AS revenue_cents
         |  FROM events GROUP BY 1, 2),
         |dim AS (
         |  SELECT DISTINCT event_type,
         |    event_type IN ('purchase', 'signup') AS is_major
         |  FROM events)
         |SELECT d.event_date, m.is_major,
         |  (CAST(sum(d.revenue_cents) AS DOUBLE) / 100.0) AS total_revenue
         |FROM daily d LEFT JOIN dim m USING (event_type)
         |GROUP BY 1, 2""".stripMargin,
    "q_exact_distinct" ->
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin)
}
