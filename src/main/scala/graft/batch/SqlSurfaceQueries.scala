package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/**
 * SQL-surface breadth beyond the reference: sessionization as a batch
 * gaps-and-islands query (the oracle-checkable twin of the streaming
 * [[graft.stream.Sessionize]] operator), ROLLUP subtotals, exact
 * percentiles, and set operations. The reference uses none of these; a
 * complete engine needs them, and each one here is DuckDB-oracled.
 */
object SqlSurfaceQueries {

  val SessionGapSeconds = 3600L

  /** Gaps-and-islands sessionization: a session breaks where the epoch gap
    * to the previous event exceeds the threshold; the running sum of break
    * flags numbers the sessions. Semantics identical to the streaming
    * operator (strict `> gap` starts a new session) — SessionizeSpec
    * cross-checks the two. Two window passes over one shuffle on user_id. */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        Exact.cents(coalesce(col("value"), lit(0.0))).as("cents"))
      .withColumn("prev_s", lag(col("ts").cast("long"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_s").isNull ||
          col("ts").cast("long") - col("prev_s") > SessionGapSeconds, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("brk")).over(running))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        (sum(col("cents")) / lit(100.0)).as("total_value"))
  }

  /** ROLLUP pricing subtotals: per (flag, status), per flag, grand total —
    * one pass, partial-aggregated like any hash agg. */
  def qRollupPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(Exact.cents(col("l_extendedprice"))) / lit(100.0)).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Exact interpolated percentiles over integer cents — the interpolation
    * arithmetic `(1-g)·v_i + g·v_{i+1}` runs on identical exact inputs in
    * both engines, so even these doubles hash-match. */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), Exact.cents(coalesce(col("value"), lit(0.0))).as("cents"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (expr("percentile(cents, 0.5)") / lit(100.0)).as("p50"),
        (expr("percentile(cents, 0.95)") / lit(100.0)).as("p95"))

  /** Set operations: purchase cohorts by activity window — INTERSECT for
    * retained buyers, EXCEPT for churned (purchase-specific so both
    * branches carry rows at test density). */
  def qUserCohorts(spark: SparkSession, dir: String): DataFrame = {
    val buys = Tables.events(spark, dir).filter(col("event_type") === "purchase")
    val firstWeek = buys.filter(col("ts") < lit("2024-01-08").cast("timestamp"))
      .select(col("user_id")).distinct()
    val lastWeek = buys.filter(col("ts") >= lit("2024-01-24").cast("timestamp"))
      .select(col("user_id")).distinct()
    firstWeek.intersect(lastWeek).withColumn("cohort", lit("retained"))
      .unionByName(firstWeek.except(lastWeek).withColumn("cohort", lit("churned")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sessionize"     -> (qSessionize _),
    "q_rollup_pricing" -> (qRollupPricing _),
    "q_percentiles"    -> (qPercentiles _),
    "q_user_cohorts"   -> (qUserCohorts _))

  private val centsValue = Exact.centsSql("coalesce(value, 0.0)")

  val oracles: Map[String, String] = Map(
    "q_sessionize" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, event_id, $centsValue AS cents,
         |    CASE WHEN lag(CAST(epoch(ts) AS BIGINT)) OVER w IS NULL
         |           OR CAST(epoch(ts) AS BIGINT)
         |              - lag(CAST(epoch(ts) AS BIGINT)) OVER w > $SessionGapSeconds
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |numbered AS (
         |  SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
         |  FROM marked)
         |SELECT user_id, session_id,
         |  min(ts) AS session_start, max(ts) AS session_end,
         |  count(*) AS n_events,
         |  (CAST(sum(cents) AS DOUBLE) / 100.0) AS total_value
         |FROM numbered GROUP BY 1, 2""".stripMargin,
    "q_rollup_pricing" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  (CAST(sum(${Exact.centsSql("l_extendedprice")}) AS DOUBLE) / 100.0) AS revenue,
         |  count(*) AS n_lines
         |FROM lineitem
         |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q_percentiles" ->
      s"""SELECT event_type, count(*) AS n,
         |  (quantile_cont($centsValue, 0.5) / 100.0) AS p50,
         |  (quantile_cont($centsValue, 0.95) / 100.0) AS p95
         |FROM events GROUP BY 1""".stripMargin,
    "q_user_cohorts" ->
      """SELECT user_id, 'retained' AS cohort FROM (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08 00:00:00'
        |  INTERSECT
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-24 00:00:00')
        |UNION ALL
        |SELECT user_id, 'churned' AS cohort FROM (
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase' AND ts < TIMESTAMP '2024-01-08 00:00:00'
        |  EXCEPT
        |  SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-24 00:00:00')""".stripMargin)
}
