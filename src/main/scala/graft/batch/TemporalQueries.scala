package graft.batch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/**
 * Temporal / behavioral analytics surface: ordered-event funnels, cohort
 * retention, type-2 slowly-changing-dimension history, and calendar gap
 * fill with last-observation-carried-forward. The reference pipeline
 * (spark/app.py) stops at windowed aggregation; these are the four shapes
 * every events warehouse asks next, and each one here is DuckDB-oracled.
 *
 * Scale notes (the common thread): every operator shuffles ONCE on its
 * entity key (user_id / n_name) and does all sequential logic with window
 * functions inside that partition — no self-joins that re-shuffle the fact,
 * no driver-side iteration. Chained windows over the same (key, order)
 * spec stack on one sort with no extra exchange.
 */
object TemporalQueries {

  /** Funnel stage ordering: a qualifying click strictly follows the first
    * view; a qualifying purchase strictly follows the first qualifying
    * click. Strict (`>`) so a same-timestamp pair never counts in both
    * directions — ties are resolved by time alone, not event_id, keeping
    * the semantics "later in real time". */
  val FunnelStages: Seq[String] = Seq("view", "click", "purchase")

  /** Ordered three-step funnel (view → click → purchase) over the events
    * stream, one row per stage with the user count that reached it.
    *
    * Shape: ONE shuffle on user_id; the three "first qualifying time"
    * columns are running conditional minima over the same prefix window —
    * each references the previous stage's running value at the current
    * row, which is exactly "the stage-k time known so far", so the chain
    * computes the classic sequential funnel without a per-stage self-join
    * (the textbook formulation joins events to itself once per stage —
    * k−1 extra fact shuffles this plan does not pay). The final per-user
    * collapse rides the same partitioning; the stage counts are a
    * broadcast-sized single row exploded to (step, stage, n_users). */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val prefix = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("v_ts",
        min(when(col("event_type") === FunnelStages(0), col("ts"))).over(prefix))
      .withColumn("c_ts",
        min(when(col("event_type") === FunnelStages(1) &&
          col("v_ts").isNotNull && col("ts") > col("v_ts"), col("ts"))).over(prefix))
      .withColumn("p_ts",
        min(when(col("event_type") === FunnelStages(2) &&
          col("c_ts").isNotNull && col("ts") > col("c_ts"), col("ts"))).over(prefix))
    // running minima are monotone within the partition, so the per-user min
    // IS the value at the user's last row — the completed-funnel times
    val counts = staged.groupBy(col("user_id"))
      .agg(min(col("v_ts")).as("fv"), min(col("c_ts")).as("fc"), min(col("p_ts")).as("fp"))
      .agg(count(col("fv")).as("nv"), count(col("fc")).as("nc"), count(col("fp")).as("np"))
    counts.select(explode(array(
        struct(lit(1L).as("step"), lit(FunnelStages(0)).as("stage"), col("nv").as("n_users")),
        struct(lit(2L).as("step"), lit(FunnelStages(1)).as("stage"), col("nc").as("n_users")),
        struct(lit(3L).as("step"), lit(FunnelStages(2)).as("stage"), col("np").as("n_users"))))
      .as("r"))
      .select(col("r.step").as("step"), col("r.stage").as("stage"), col("r.n_users").as("n_users"))
  }

  /** Calendar epoch for week arithmetic — the corpus starts 2024-01-01, so
    * week numbers are small non-negative ints and floor division is
    * engine-identical. */
  val WeekEpoch = "2024-01-01"

  private def weekOf(ts: Column): Column =
    floor(datediff(ts.cast("date"), lit(WeekEpoch).cast("date")) / lit(7.0)).cast("long")

  /** Cohort retention triangle: users grouped by the week of their first
    * event, counted in each later week they were active. Output grain
    * (cohort_week, week_offset); offset 0 carries the cohort size.
    *
    * Shape: distinct (user, week) first — ONE fact shuffle that also
    * serves the cohort min — then a user-keyed join of two already-small
    * frames and a final bounded aggregate (weeks × weeks rows). The
    * distinct-first order matters at 100 TB: raw events collapse to
    * |users|×|weeks| before anything else touches them. */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(spark, dir)
      .select(col("user_id"), weekOf(col("ts")).as("wk"))
      .distinct()
    val cohorts = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_week"))
    uw.join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Type-2 slowly-changing-dimension build: each user's `props.k`
    * attribute as a validity-interval history — one row per value RUN
    * (consecutive duplicates collapsed, null-safe), `valid_from` the first
    * event of the run, `valid_to` the start of the next run (NULL = still
    * current). The CDC-feed → versioned-dimension operator; its output is
    * exactly what [[SqlSurfaceQueries.qAsofOrder]]-style as-of enrichment
    * consumes as a build side.
    *
    * Shape: one shuffle on user_id, three stacked window passes on the
    * same sort (lag for change detection, running count for run numbering
    * is not even needed — the filter keeps only run heads, and lead over
    * the surviving heads yields the interval end). */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val vals = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .withColumn("rn", row_number().over(byUser))
      .withColumn("pk", lag(col("k"), 1).over(byUser))
    val heads = vals.filter(col("rn") === 1 || !(col("k") <=> col("pk")))
    heads
      .withColumn("valid_to", lead(col("ts"), 1).over(byUser))
      .select(col("user_id"), col("k"), col("ts").as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"))
  }

  /** Calendar gap fill + LOCF: per-nation daily order revenue with every
    * missing calendar day materialized (zero-filled counts, carried-forward
    * revenue, a gap flag). The time-series regularization operator —
    * downstream forecasting needs a dense, aligned grid, not the sparse
    * transactional days.
    *
    * Shape: the fact aggregates FIRST (orders → one row per (nation, day)
    * with both dims broadcast), then the calendar is generated from the
    * per-nation [min, max] bounds — `sequence` + `explode` over an
    * aggregate that has one row per nation, so the dense grid costs
    * |nations| × |days| rows no matter how many orders fed it. The LOCF
    * window rides the (nation, day) sort of the left join's grid. */
  def qGapFill(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val nation = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val daily = Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderdate").cast("date").as("day"))
      .agg(sum(Exact.cents(col("o_totalprice"))).as("rev_cents"),
        count(lit(1)).as("n_orders"))
    val calendar = daily.groupBy(col("n_name"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("n_name"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val locf = Window.partitionBy("n_name").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar.join(daily, Seq("n_name", "day"), "left")
      .withColumn("locf_cents", last(col("rev_cents"), ignoreNulls = true).over(locf))
      .select(col("n_name"), col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        (coalesce(col("rev_cents"), lit(0L)) / lit(100.0)).as("revenue"),
        (col("locf_cents") / lit(100.0)).as("locf_revenue"),
        col("rev_cents").isNull.as("is_gap"))
  }

  /** First-order transition matrix over each user's time-ordered event
    * sequence: for every (prev_type → next_type) step, the step count,
    * its row-normalized probability (integer milli — exact under the hash
    * gate), and dwell time between the two events (total + mean, integer
    * microseconds). The Markov-chain census behind "what do users do
    * after a click" product analytics and next-event prediction features.
    *
    * Shape: ONE shuffle on user_id; lag() over the same (ts, event_id)
    * sort every sequential operator here rides, then a bounded aggregate
    * (|types|² rows) and a window over that bounded frame for the row
    * totals — nothing after the fact shuffle is data-sized. */
  def qTransitions(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .filter(col("prev_type").isNotNull)
    val byPrev = Window.partitionBy("prev_type")
    steps.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"),
        sum(unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("gap_total_us"))
      .withColumn("out_total", sum(col("n")).over(byPrev))
      .select(col("prev_type"), col("next_type"), col("n"),
        expr("1000 * n DIV out_total").as("prob_milli"),
        col("gap_total_us"),
        expr("gap_total_us DIV n").as("mean_gap_us"))
  }

  /** Point-in-time feature join — the feature-store correctness kernel:
    * each purchase event is joined to the SCD2 dimension version
    * ([[qScd2]]) that was valid AT the event's timestamp, never a later
    * one (training-serving skew is exactly the bug of joining "current"
    * attributes onto historical labels). Interval containment with the
    * half-open upper bound (`valid_from ≤ ts < valid_to`, open-ended
    * current row) picks exactly one version per event because the SCD2
    * intervals tile each user's history (TemporalSpec pins the tiling).
    *
    * Shape: an equi-join on the user key carrying the interval predicate
    * as its join condition, so candidates per row are that user's
    * versions (bounded by the change count). NO hint is forced: Catalyst
    * broadcasts the SCD2 side while it fits and the SAME plan
    * shuffle-joins co-partitioned on the user key once the history
    * outgrows the threshold — history-sized dims are exactly where a
    * hard-coded broadcast hint goes wrong, so the size decision stays
    * the optimizer's. */
  def qPitFeatures(spark: SparkSession, dir: String): DataFrame = {
    val dim = qScd2(spark, dir)
      .select(col("user_id").as("d_user"), col("k"), col("valid_from"),
        col("valid_to"), col("is_current"))
    Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
      .join(dim,
        col("user_id") === col("d_user") &&
          col("valid_from") <= col("ts") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")),
        "left")
      .select(col("event_id"), col("user_id"), col("k").as("k_at_event"),
        col("valid_from").as("version_from"), col("is_current"))
  }

  /** Sequential-pattern mining one order up from [[qTransitions]]: the
    * per-user ordered event-type TRIGRAM census — which 3-step behavior
    * paths actually occur, with the conditional probability of the third
    * step given the first two (milli, cleared-denominator). The 2-step
    * transition matrix cannot distinguish view→click→purchase from
    * error→click→purchase; the trigram frame can, and it is the frame a
    * next-step model or a funnel designer reads. Grain is bounded by
    * |types|³ (125 here) regardless of corpus size.
    *
    * Shape: TWO stacked lags on the SAME (user, ts, event_id) window
    * sort — one shuffle on the user key, no self-joins — then a
    * map-side-combinable aggregate to the |types|³ frame; the
    * conditional total is a window over that bounded frame. */
  def qEventTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lag(col("event_type"), 1).over(byUser))
      .withColumn("t1", lag(col("event_type"), 2).over(byUser))
      .filter(col("t1").isNotNull)
    val byPrefix = Window.partitionBy("t1", "t2")
    steps.groupBy(col("t1"), col("t2"), col("event_type").as("t3"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prefix_total", sum(col("n")).over(byPrefix))
      .select(col("t1"), col("t2"), col("t3"), col("n"), col("prefix_total"),
        expr("1000 * n DIV prefix_total").as("prob_milli"))
  }

  /** Activity-interval width in days for [[qIntervalCoverage]]. */
  val IntervalDays = 30

  /** Interval union (merge-overlaps) coverage — the classic
    * gaps-and-islands kernel at the INTERVAL grain: each order opens a
    * [o_orderdate, o_orderdate + [[IntervalDays]]) activity window; per
    * customer, overlapping-or-abutting windows merge into maximal islands
    * (half-open, so a window starting exactly where the previous ends is
    * CONTIGUOUS coverage and merges), and the report is the per-customer
    * coverage summary: order count, merged-island count, total covered
    * days, longest island. The relational form of "total time under
    * contract / on treatment / in session" — a union of intervals, which
    * naive SUM(width) double-counts.
    *
    * Mechanics: one window pass per customer ordered by start — the
    * running max of PRIOR interval ends detects island starts
    * (start > prior running max ⇒ gap ⇒ new island), a running sum of
    * the island flags numbers islands, then two bounded aggregates
    * (per-island, per-customer). Equal starts are benign: width is fixed,
    * so tied rows carry identical ends and the flags are order-insensitive.
    *
    * Scale: one shuffle on the customer key; windows run inside
    * per-customer partitions (tens of orders); output is |customers|.
    * The same plan at 100 TB — no self-join, no driver loop. */
  def qIntervalCoverage(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy("o_custkey").orderBy(col("start"))
    val prior = byCust.rowsBetween(Window.unboundedPreceding, -1)
    val islands = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("start"))
      .withColumn("end", date_add(col("start"), IntervalDays))
      .withColumn("prior_max", max(col("end")).over(prior))
      .withColumn("new_island",
        (col("prior_max").isNull || col("start") > col("prior_max")).cast("long"))
      .withColumn("island", sum(col("new_island"))
        .over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("o_custkey"), col("island"))
      .agg(min(col("start")).as("i_start"), max(col("end")).as("i_end"),
        count(lit(1)).as("n_orders"))
    islands
      .groupBy(col("o_custkey"))
      .agg(sum(col("n_orders")).as("n_orders"),
        count(lit(1)).as("n_islands"),
        sum(datediff(col("i_end"), col("i_start")).cast("long")).as("covered_days"),
        max(datediff(col("i_end"), col("i_start")).cast("long")).as("max_island_days"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel"      -> (qFunnel _),
    "q_retention"   -> (qRetention _),
    "q_scd2"        -> (qScd2 _),
    "q_gap_fill"    -> (qGapFill _),
    "q_interval_coverage" -> (qIntervalCoverage _),
    "q_event_trigrams" -> (qEventTrigrams _),
    "q_pit_features" -> (qPitFeatures _),
    "q_transitions" -> (qTransitions _))

  /** The SCD2 statement — shared verbatim by its own oracle and the
    * point-in-time join built on it. */
  private val scd2Sql: String =
    """WITH vals AS (
      |  SELECT user_id, ts, event_id,
      |    TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
      |    row_number() OVER w AS rn, lag(k) OVER w AS pk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |heads AS (
      |  SELECT user_id, ts, event_id, k FROM vals
      |  WHERE rn = 1 OR k IS DISTINCT FROM pk)
      |SELECT user_id, k, ts AS valid_from,
      |  lead(ts) OVER w AS valid_to,
      |  lead(ts) OVER w IS NULL AS is_current
      |FROM heads
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  /** Shared prefix-window clause for the funnel oracle's three chained
    * conditional minima. */
  private val prefixW =
    "PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      s"""WITH s1 AS (
         |  SELECT user_id, ts, event_id, event_type,
         |    min(CASE WHEN event_type = '${FunnelStages(0)}' THEN ts END) OVER ($prefixW) AS v_ts
         |  FROM events),
         |s2 AS (
         |  SELECT *, min(CASE WHEN event_type = '${FunnelStages(1)}'
         |      AND v_ts IS NOT NULL AND ts > v_ts THEN ts END) OVER ($prefixW) AS c_ts
         |  FROM s1),
         |s3 AS (
         |  SELECT *, min(CASE WHEN event_type = '${FunnelStages(2)}'
         |      AND c_ts IS NOT NULL AND ts > c_ts THEN ts END) OVER ($prefixW) AS p_ts
         |  FROM s2),
         |per_user AS (
         |  SELECT user_id, min(v_ts) AS fv, min(c_ts) AS fc, min(p_ts) AS fp
         |  FROM s3 GROUP BY 1)
         |SELECT CAST(1 AS BIGINT) AS step, '${FunnelStages(0)}' AS stage, count(fv) AS n_users FROM per_user
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), '${FunnelStages(1)}', count(fc) FROM per_user
         |UNION ALL
         |SELECT CAST(3 AS BIGINT), '${FunnelStages(2)}', count(fp) FROM per_user""".stripMargin,
    "q_retention" ->
      s"""WITH uw AS (
         |  SELECT DISTINCT user_id,
         |    CAST(date_diff('day', DATE '$WeekEpoch', CAST(ts AS DATE)) // 7 AS BIGINT) AS wk
         |  FROM events),
         |coh AS (SELECT user_id, min(wk) AS cohort_week FROM uw GROUP BY 1)
         |SELECT cohort_week, wk - cohort_week AS week_offset, count(*) AS n_users
         |FROM uw JOIN coh USING (user_id)
         |GROUP BY 1, 2""".stripMargin,
    "q_scd2" -> scd2Sql,
    // the SCD2 statement verbatim as the dimension; interval containment
    // with the half-open upper bound picks exactly one version per event
    "q_pit_features" ->
      s"""WITH scd2 AS (
         |$scd2Sql
         |),
         |p AS (SELECT event_id, user_id, ts FROM events
         |      WHERE event_type = 'purchase')
         |SELECT p.event_id, p.user_id, s.k AS k_at_event,
         |  s.valid_from AS version_from, s.is_current
         |FROM p LEFT JOIN scd2 s
         |  ON s.user_id = p.user_id
         | AND s.valid_from <= p.ts
         | AND (s.valid_to IS NULL OR p.ts < s.valid_to)""".stripMargin,
    "q_gap_fill" ->
      s"""WITH daily AS (
         |  SELECT n_name, CAST(o_orderdate AS DATE) AS day,
         |    CAST(sum(${Exact.centsSql("o_totalprice")}) AS BIGINT) AS rev_cents,
         |    count(*) AS n_orders
         |  FROM orders
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  GROUP BY 1, 2),
         |b AS (SELECT n_name, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
         |cal AS (
         |  SELECT n_name, CAST(unnest(generate_series(
         |    CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
         |  FROM b),
         |j AS (
         |  SELECT c.n_name, c.day, d.rev_cents, d.n_orders
         |  FROM cal c LEFT JOIN daily d ON d.n_name = c.n_name AND d.day = c.day)
         |SELECT n_name, day,
         |  coalesce(n_orders, 0) AS n_orders,
         |  CAST(coalesce(rev_cents, 0) AS DOUBLE) / 100.0 AS revenue,
         |  CAST(last_value(rev_cents IGNORE NULLS) OVER (
         |    PARTITION BY n_name ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS locf_revenue,
         |  rev_cents IS NULL AS is_gap
         |FROM j""".stripMargin,
    // same island detection: running max of PRIOR ends, gap ⇒ new island,
    // running flag sum numbers islands; day arithmetic is exact DATE math
    "q_interval_coverage" ->
      s"""WITH iv AS (
         |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS s,
         |    CAST(o_orderdate AS DATE) + $IntervalDays AS e
         |  FROM orders),
         |m AS (
         |  SELECT o_custkey, s, e,
         |    max(e) OVER (PARTITION BY o_custkey ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
         |  FROM iv),
         |f AS (
         |  SELECT o_custkey, s, e,
         |    CASE WHEN prior_max IS NULL OR s > prior_max THEN 1 ELSE 0 END AS ni
         |  FROM m),
         |isl AS (
         |  SELECT o_custkey, s, e,
         |    sum(ni) OVER (PARTITION BY o_custkey ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
         |  FROM f),
         |g AS (
         |  SELECT o_custkey, island, min(s) AS i_start, max(e) AS i_end,
         |    count(*) AS n_orders
         |  FROM isl GROUP BY 1, 2)
         |SELECT o_custkey,
         |  CAST(sum(n_orders) AS BIGINT) AS n_orders,
         |  count(*) AS n_islands,
         |  CAST(sum(date_diff('day', i_start, i_end)) AS BIGINT) AS covered_days,
         |  CAST(max(date_diff('day', i_start, i_end)) AS BIGINT) AS max_island_days
         |FROM g GROUP BY 1""".stripMargin,
    // the q_transitions window sort with TWO stacked lags; the
    // conditional total runs over the bounded |types|^3 frame
    "q_event_trigrams" ->
      """WITH steps AS (
        |  SELECT event_type AS t3,
        |    lag(event_type, 1) OVER w AS t2,
        |    lag(event_type, 2) OVER w AS t1
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT t1, t2, t3, count(*) AS n
        |  FROM steps WHERE t1 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT t1, t2, t3, n,
        |  CAST(sum(n) OVER (PARTITION BY t1, t2) AS BIGINT) AS prefix_total,
        |  (1000 * n) // CAST(sum(n) OVER (PARTITION BY t1, t2) AS BIGINT) AS prob_milli
        |FROM c""".stripMargin,
    // sum(BIGINT) in DuckDB widens to HUGEINT — cast the window total and
    // gap sum back so integer division matches Spark's LONG DIV exactly
    "q_transitions" ->
      """WITH steps AS (
        |  SELECT event_type AS next_type,
        |    lag(event_type) OVER w AS prev_type,
        |    epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (
        |  SELECT prev_type, next_type, count(*) AS n,
        |    CAST(sum(gap_us) AS BIGINT) AS gap_total_us
        |  FROM steps WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        |  (1000 * n) // CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS prob_milli,
        |  gap_total_us,
        |  gap_total_us // n AS mean_gap_us
        |FROM c""".stripMargin)
}
