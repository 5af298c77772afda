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

  /** The same sessionization through Spark's NATIVE `session_window`
    * operator — one `groupBy(session_window(ts, gap))` instead of the
    * lag/running-sum island construction of [[qSessionize]], and the form
    * that runs UNCHANGED on a stream (state-store-backed session merge).
    * Semantics differ from the island form only at the exact-gap boundary
    * (native: a new session starts when delta ≥ gap, window end is
    * last event + gap; islands: delta > gap breaks) — the oracle replays
    * the native rule at micro precision. Batch plan: sort-based session
    * aggregation after one exchange on user_id. */
  def qSessionNative(spark: SparkSession, dir: String): DataFrame =
    sessionAgg(Tables.events(spark, dir)
      .select(col("user_id"), col("ts"),
        Exact.cents(coalesce(col("value"), lit(0.0))).as("cents")))

  /** The session aggregation stage itself, DataFrame-in/DataFrame-out over
    * (user_id, ts, cents) — the SAME code runs on the batch table here and
    * on a watermarked stream (state-store session merge, append emission
    * once the watermark passes a session's end); StreamPipelineSpec pins
    * the streaming behavior. */
  def sessionAgg(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$SessionGapSeconds seconds").as("w"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("cents")) / lit(100.0)).as("total_value"))
      .select(col("user_id"),
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** ROLLUP pricing subtotals: per (flag, status), per flag, grand total —
    * one pass, partial-aggregated like any hash agg. */
  def qRollupPricing(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(Exact.cents(col("l_extendedprice"))) / lit(100.0)).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** Shared scaffold for the exact/approx percentile twins: both MUST
    * aggregate the identical cents population per event_type, or the
    * approx-vs-exact tolerance spec compares different data. */
  private def percentilesOver(spark: SparkSession, dir: String,
                              p50Expr: String, p95Expr: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"), Exact.cents(coalesce(col("value"), lit(0.0))).as("cents"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (expr(p50Expr) / lit(100.0)).as("p50"),
        (expr(p95Expr) / lit(100.0)).as("p95"))

  /** Exact interpolated percentiles over integer cents — the interpolation
    * arithmetic `(1-g)·v_i + g·v_{i+1}` runs on identical exact inputs in
    * both engines, so even these doubles hash-match. */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame =
    percentilesOver(spark, dir,
      "percentile(cents, 0.5)", "percentile(cents, 0.95)")

  /** Sketch percentiles (`approx_percentile`, an interpolated-histogram
    * sketch): the percentile path that actually scales — exact percentile
    * needs a per-group sort of ALL values, the sketch is a bounded-size
    * mergeable summary, so partial aggregation works like any sum. No
    * DuckDB oracle (sketch internals differ across engines, same policy as
    * q_approx_distinct); SqlSurfaceSpec bounds its error against the exact
    * q_percentiles on identical data (same scaffold, only the aggregate
    * expressions differ).
    *
    * Determinism caveat: below `accuracy` (10000) values per group the
    * summaries stay exact; beyond it the sketch compresses and its MERGE
    * becomes partition-order dependent — inherent to GK-style sketches,
    * so this query is exempted from DeterminismSpec's invariant. */
  def qApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    percentilesOver(spark, dir,
      "approx_percentile(cents, 0.5, 10000)", "approx_percentile(cents, 0.95, 10000)")

  /** Mergeable-sketch rollup: per-DAY DataSketches HLL sketches of the
    * user set, UNION-merged up to weekly distinct-user estimates — the
    * materialize-once / re-aggregate-anywhere pattern that makes distinct
    * counts cheap at 100 TB: the daily layer persists kilobyte sketch
    * BLOBs next to its counts, and every coarser rollup (week, month,
    * arbitrary day ranges, after late-data restatement of single days)
    * is a sketch union over the summary table — the raw fact is never
    * re-scanned. `approx_count_distinct` (q_approx_distinct) answers one
    * query; a persisted sketch column answers every future containing
    * rollup. No DuckDB oracle (sketch internals are engine-specific,
    * same policy as the other sketch queries); SqlSurfaceSpec bounds the
    * weekly estimates against exact distincts and pins
    * merged-daily ≡ direct-weekly sketching. */
  def qSketchRollup(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        count(lit(1)).as("n_events"))
    daily
      .groupBy(floor(datediff(col("day"), lit("2024-01-01").cast("date")) / lit(7.0))
        .cast("long").as("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"),
        sum(col("n_events")).as("n_events"),
        count(lit(1)).as("n_days"))
  }

  /** Exact twin of [[qSketchRollup]] at the identical weekly grain — the
    * oracled reference answer the sketch rollup is tolerance-bounded
    * against: exact `count(DISTINCT user_id)` per week straight off the
    * fact (what the sketch union avoids re-scanning at 100 TB), plus the
    * same n_events / n_days frame. */
  def qSketchRollupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        floor(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")) / lit(7.0))
          .cast("long").as("week"),
        col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("week"))
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"),
        countDistinct(col("day")).as("n_days"))

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

  /** Orders-per-customer histogram (TPC-H Q13 shape): LEFT OUTER join so
    * zero-order customers land in bucket 0, then a histogram of counts —
    * two keyed aggregations, no wide state. */
  def qOrdersHistogram(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).select(col("c_custkey"))
    val ord = Tables.orders(spark, dir).select(col("o_custkey"))
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_custkey")).as("n_orders"))   // count skips nulls
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** Suppliers with above-average account balance (scalar-subquery shape);
    * the average is exact cents so the cut is engine-identical. */
  def qTopSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    val avgCents = s.agg(
      (sum(Exact.cents(col("s_acctbal"))).cast("double") / count(lit(1))).as("a"))
    s.join(broadcast(avgCents))
      .filter(Exact.cents(col("s_acctbal")).cast("double") > col("a"))
      .select(col("s_suppkey"), col("s_name"),
        (Exact.cents(col("s_acctbal")) / lit(100.0)).as("acctbal"))
  }

  /** Customers with no orders in a window (NOT EXISTS / anti-join shape). */
  def qInactiveCustomers(spark: SparkSession, dir: String): DataFrame = {
    val active = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    Tables.customer(spark, dir)
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
  }

  /** AS-OF (backward) join: each event picks up the customer's most recent
    * order at-or-before the event time — the classic enrich-against-a-
    * versioned-dimension operator Spark has no native join type for.
    *
    * Implementation: union probe and build rows on (key, time) and carry
    * the last non-null build payload forward with one window pass — ONE
    * shuffle on the join key, versus the O(probe × build-versions)
    * blow-up of the naive range-join formulation. At 100 TB this is the
    * shape that survives: both sides hash-partition by key, the per-key
    * sort is the only extra cost, and skewed keys AQE-split like any
    * other exchange. The build side is first collapsed to one row per
    * (key, timestamp) — `max(struct(...))` picks the highest orderkey,
    * exactly like the oracle's max/arg_max pair — so as-of ties are
    * deterministic in both engines. */
  def qAsofOrder(spark: SparkSession, dir: String): DataFrame = {
    val oType = "struct<o_orderkey:bigint,o_totalprice:double>"
    val ev = Tables.events(spark, dir)
      .select(col("user_id").as("k"), col("ts").as("t"),
        col("event_id"), lit(1).as("is_probe"),
        lit(null).cast(oType).as("o"))
    val ord = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("k"), col("o_orderdate").as("t"))
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("o"))
      .select(col("k"), col("t"), lit(null).cast("long").as("event_id"),
        lit(0).as("is_probe"), col("o"))
    // order rows (is_probe=0) sort before events at the same timestamp, so
    // an event at exactly the order date sees it (>= semantics, like ASOF)
    val w = Window.partitionBy("k").orderBy(col("t"), col("is_probe"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .withColumn("asof", last(col("o"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
        col("asof.o_orderkey").as("o_orderkey"),
        col("asof.o_totalprice").as("o_totalprice"))
  }

  val RangeWindowSec = 30L * 86400   // ±30-day window

  /** Interval (range) join, banded: for each order, how many OTHER orders
    * the same customer placed within ±30 days. A naive theta-join on the
    * time range is per-key nested-loop work; bucketing both sides to
    * 30-day bands turns it into an EQUI-join on (key, band) — any order
    * within ±30 days sits in the probe's band or an adjacent one, so each
    * probe row expands to exactly 3 candidate bands and the residual range
    * predicate filters the small candidate set. At 100 TB this is the
    * canonical shape: shuffle on (key, band), candidates bounded by band
    * occupancy, no cross product. Band width trades candidate volume
    * against probe duplication (3× probe rows, nothing on the build
    * side). */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    // o_orderdate is TIMESTAMP_NTZ, which won't cast straight to long —
    // route through TIMESTAMP (UTC session ⇒ same instant) to epoch secs
    val band = (t: org.apache.spark.sql.Column) =>
      floor(t.cast("timestamp").cast("long").cast("double") / lit(RangeWindowSec.toDouble)).cast("long")
    val probe = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .withColumn("ob", explode(array(
        band(col("o_orderdate")) - 1, band(col("o_orderdate")), band(col("o_orderdate")) + 1)))
    val build = Tables.orders(spark, dir)
      .select(col("o_custkey").as("b_custkey"), col("o_orderdate").as("b_date"),
        col("o_orderkey").as("b_orderkey"))
      .withColumn("ob", band(col("b_date")))
    probe.join(build,
        probe("o_custkey") === build("b_custkey") && probe("ob") === build("ob"), "left")
      .withColumn("hit",
        col("b_orderkey") =!= col("o_orderkey") &&
          col("b_date") >= col("o_orderdate") - expr("INTERVAL 30 DAYS") &&
          col("b_date") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .agg(count(when(col("hit"), lit(1))).as("n_nearby_orders"))
  }

  /** CUBE over (event_type, event_date): all four grouping combinations in
    * one pass — completes the grouping-sets surface next to ROLLUP. */
  def qCubeEvents(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("event_date", col("ts").cast("date"))
      .cube(col("event_type"), col("event_date"))
      .agg(
        (sum(Exact.cents(coalesce(col("value"), lit(0.0)))) / lit(100.0)).as("revenue"),
        count(lit(1)).as("n_events"))

  /** UNPIVOT (melt): wide per-flag metrics → long (flag, metric, value)
    * rows — the inverse surface of q_pivot_pricing. All three metrics are
    * exact BIGINTs so the single value column is type-stable. */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(Exact.cents(col("l_extendedprice"))).as("price_cents"),
        sum(Exact.cents(col("l_discount"))).as("disc_cents"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("n_lines"), col("price_cents"), col("disc_cents")),
        "metric", "value")

  /** Statistical profiling from exact integer moments: per-group count,
    * mean, sample stddev and correlation assembled from (n, Σx, Σx², Σxy)
    * — the data-profiling pass that decides units/outliers/feature pairs
    * before a corpus ships. Spark's built-in `stddev`/`corr` aggregate
    * FLOATS (partial-order-dependent, un-oracleable); here every moment
    * is an exact BIGINT sum over small integer units (quantity, discount
    * micro-units), and each statistic is ONE final float expression over
    * identical ints — bit-identical across engines, so even `corr` sits
    * under the hash gate. Plan shape: one scan, one bounded-key hash
    * aggregate; moments are algebraic, so map-side partial combine does
    * the work. The n·Σx² − (Σx)² variance products are computed in
    * DECIMAL(38,0) (exact, mergeable, 38 digits of headroom) — in BIGINT
    * they would wrap silently on large groups, producing wrong statistics
    * instead of failing; the DuckDB twin computes the same products in
    * HUGEINT, so both engines carry the identical exact integer into the
    * one final double conversion. Degenerate groups (n ≤ 1, or zero
    * variance) yield NULL stddev/corr explicitly rather than engine-shaped
    * NaN/divide-by-zero artifacts. */
  def qProfileStats(spark: SparkSession, dir: String): DataFrame = {
    val qi = floor(col("l_quantity") + lit(0.5)).cast("long")
    val di = Exact.fixed(col("l_discount"), 1000)
    val n = col("n"); val sq = col("sq"); val sd = col("sd")
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val varQ = dec(n) * dec(col("sqq")) - dec(sq) * dec(sq)
    val varD = dec(n) * dec(col("sdd")) - dec(sd) * dec(sd)
    val covQD = dec(n) * dec(col("sqd")) - dec(sq) * dec(sd)
    val nullD = lit(null).cast("double")
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), qi.as("q"), di.as("d"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("sq"), sum(col("d")).as("sd"),
        sum(col("q") * col("q")).as("sqq"), sum(col("d") * col("d")).as("sdd"),
        sum(col("q") * col("d")).as("sqd"))
      .select(col("l_returnflag"), n,
        (sq.cast("double") / n.cast("double")).as("mean_qty"),
        when(n <= lit(1L), nullD)
          .otherwise(sqrt(varQ.cast("double")
            / (dec(n) * dec(n - lit(1L))).cast("double"))).as("stddev_qty"),
        when(n <= lit(1L) || varQ === lit(0) || varD === lit(0), nullD)
          .otherwise(covQD.cast("double")
            / (sqrt(varQ.cast("double")) * sqrt(varD.cast("double"))))
          .as("corr_qty_disc"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_profile_stats"    -> (qProfileStats _),
    "q_unpivot"          -> (qUnpivot _),
    "q_asof_order"       -> (qAsofOrder _),
    "q_range_join"       -> (qRangeJoin _),
    "q_cube_events"      -> (qCubeEvents _),
    "q_sessionize"       -> (qSessionize _),
    "q_session_native"   -> (qSessionNative _),
    "q_rollup_pricing"   -> (qRollupPricing _),
    "q_percentiles"      -> (qPercentiles _),
    "q_sketch_exact"     -> (qSketchRollupExact _),
    "q_user_cohorts"     -> (qUserCohorts _),
    "q_orders_histogram" -> (qOrdersHistogram _),
    "q_top_suppliers"    -> (qTopSuppliers _),
    "q_inactive_custs"   -> (qInactiveCustomers _))

  /** Driver-invisible registrations (SURVEY §5.2): sketch outputs cannot
    * hash-match a foreign engine by design — GK percentile summaries and
    * DataSketches HLL internals are engine-specific. Each is
    * tolerance-bounded by SqlSurfaceSpec against its oracled exact twin on
    * identical data ([[qPercentiles]] / [[qSketchRollupExact]]). */
  val specOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_approx_pctl"   -> (qApproxPercentiles _),
    "q_sketch_rollup" -> (qSketchRollup _))

  private val centsValue = Exact.centsSql("coalesce(value, 0.0)")

  val oracles: Map[String, String] = Map(
    "q_profile_stats" ->
      s"""WITH m AS (
         |  SELECT l_returnflag,
         |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         |    CAST(floor(l_discount * 1000.0 + 0.5) AS BIGINT) AS d
         |  FROM lineitem),
         |a AS (
         |  SELECT l_returnflag, count(*) AS n,
         |    CAST(sum(q) AS BIGINT) AS sq, CAST(sum(d) AS BIGINT) AS sd,
         |    CAST(sum(q*q) AS BIGINT) AS sqq, CAST(sum(d*d) AS BIGINT) AS sdd,
         |    CAST(sum(q*d) AS BIGINT) AS sqd
         |  FROM m GROUP BY 1),
         |v AS (
         |  SELECT l_returnflag, n, sq, sd,
         |    CAST(n AS HUGEINT)*sqq - CAST(sq AS HUGEINT)*sq AS vq,
         |    CAST(n AS HUGEINT)*sdd - CAST(sd AS HUGEINT)*sd AS vd,
         |    CAST(n AS HUGEINT)*sqd - CAST(sq AS HUGEINT)*sd AS cqd
         |  FROM a)
         |SELECT l_returnflag, n,
         |  CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
         |  CASE WHEN n <= 1 THEN NULL
         |       ELSE sqrt(CAST(vq AS DOUBLE)
         |                 / CAST(CAST(n AS HUGEINT)*(n-1) AS DOUBLE)) END AS stddev_qty,
         |  CASE WHEN n <= 1 OR vq = 0 OR vd = 0 THEN NULL
         |       ELSE CAST(cqd AS DOUBLE)
         |         / (sqrt(CAST(vq AS DOUBLE)) * sqrt(CAST(vd AS DOUBLE))) END AS corr_qty_disc
         |FROM v""".stripMargin,
    "q_unpivot" ->
      s"""WITH w AS (
         |  SELECT l_returnflag, count(*) AS n_lines,
         |    CAST(sum(${Exact.centsSql("l_extendedprice")}) AS BIGINT) AS price_cents,
         |    CAST(sum(${Exact.centsSql("l_discount")}) AS BIGINT) AS disc_cents
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, 'n_lines' AS metric, n_lines AS value FROM w
         |UNION ALL
         |SELECT l_returnflag, 'price_cents' AS metric, price_cents AS value FROM w
         |UNION ALL
         |SELECT l_returnflag, 'disc_cents' AS metric, disc_cents AS value FROM w""".stripMargin,
    "q_asof_order" ->
      """WITH ord AS (
        |  SELECT o_custkey, o_orderdate,
        |    max(o_orderkey) AS o_orderkey,
        |    arg_max(o_totalprice, o_orderkey) AS o_totalprice
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice
        |FROM events e
        |ASOF LEFT JOIN ord o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate""".stripMargin,
    "q_range_join" ->
      """SELECT a.o_orderkey, a.o_custkey, a.o_orderdate,
        |  count(CASE WHEN b.o_orderkey <> a.o_orderkey
        |              AND b.o_orderdate >= a.o_orderdate - INTERVAL 30 DAY
        |              AND b.o_orderdate <= a.o_orderdate + INTERVAL 30 DAY
        |             THEN 1 END) AS n_nearby_orders
        |FROM orders a
        |LEFT JOIN orders b ON b.o_custkey = a.o_custkey
        |GROUP BY 1, 2, 3""".stripMargin,
    "q_cube_events" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(ts AS DATE) AS event_date,
         |    $centsValue AS cents
         |  FROM events)
         |SELECT event_type, event_date,
         |  (CAST(sum(cents) AS DOUBLE) / 100.0) AS revenue,
         |  count(*) AS n_events
         |FROM e GROUP BY CUBE (event_type, event_date)""".stripMargin,
    "q_sessionize" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, event_id, $centsValue AS cents,
         |    CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
         |           OR CAST(floor(epoch(ts)) AS BIGINT)
         |              - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > $SessionGapSeconds
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
    "q_session_native" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, $centsValue AS cents,
         |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
         |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
         |              >= ${SessionGapSeconds * 1000000L}
         |         THEN 1 ELSE 0 END AS brk
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |numbered AS (
         |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM marked)
         |SELECT user_id,
         |  min(ts) AS session_start,
         |  max(ts) + INTERVAL '$SessionGapSeconds seconds' AS session_end,
         |  count(*) AS n_events,
         |  (CAST(sum(cents) AS DOUBLE) / 100.0) AS total_value
         |FROM numbered GROUP BY user_id, sid""".stripMargin,
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
    "q_sketch_exact" ->
      """SELECT
        |  CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS week,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  count(*) AS n_events,
        |  CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days
        |FROM events GROUP BY 1""".stripMargin,
    "q_orders_histogram" ->
      """WITH per_cust AS (
        |  SELECT c.c_custkey, count(o.o_custkey) AS n_orders
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY 1)
        |SELECT n_orders, count(*) AS n_customers
        |FROM per_cust GROUP BY 1""".stripMargin,
    "q_top_suppliers" ->
      s"""SELECT s_suppkey, s_name,
         |  (CAST(${Exact.centsSql("s_acctbal")} AS DOUBLE) / 100.0) AS acctbal
         |FROM supplier
         |WHERE CAST(${Exact.centsSql("s_acctbal")} AS DOUBLE) >
         |  (SELECT CAST(sum(${Exact.centsSql("s_acctbal")}) AS DOUBLE) / count(*) FROM supplier)""".stripMargin,
    "q_inactive_custs" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')""".stripMargin,
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
