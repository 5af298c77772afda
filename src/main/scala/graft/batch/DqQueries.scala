package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Data-quality constraint audit (the Deequ-style validation gate): one
 * pass over the fact computes every constraint's violation count, and the
 * output is one row per constraint with its metric and verdict — the
 * machine-readable report a pipeline checks before publishing a snapshot
 * or feeding a training run. The reference's `quality_check` task
 * (airflow/dags/kafka_spark_etl.py:127–142) soft-checks ONE row count;
 * this is that operator grown to a constraint suite.
 *
 * Shape: a single scan feeds one global aggregate (every violation count
 * is a conditional sum, the uniqueness check a count distinct), and the
 * constraint rows explode from that single aggregate row — output is
 * |constraints| rows at any input size. At 100 TB this is one
 * scan-bandwidth pass; per-partition-parallel like any count.
 */
object DqQueries {

  /** Inclusive data window the corpus must land in ([[qDqAudit]]'s range
    * constraint). */
  val TsMin = "2024-01-01"
  val TsMaxExcl = "2025-01-01"

  /** Completeness budget for nullable `value`: up to [[ValueNullPerMille]]
    * nulls per 1000 rows pass — the REFERENCE's producer injects null
    * amounts by design (producer.py:34–36), so a zero-null constraint
    * would be the wrong contract for the column even though this
    * synthetic corpus happens to carry none. */
  val ValueNullPerMille = 200L

  /** The audit: violation counts + verdicts for completeness, uniqueness,
    * domain, non-negativity, and time-range constraints over `events`. */
  def qDqAudit(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val m = e.agg(
      count(lit(1)).as("n_rows"),
      sum(col("event_id").isNull.cast("long")).as("v_null_id"),
      sum(col("value").isNull.cast("long")).as("v_null_value"),
      (count(lit(1)) - countDistinct(col("event_id"))).as("v_dup_id"),
      sum(coalesce((col("value") < 0).cast("long"), lit(0L))).as("v_neg_value"),
      sum(coalesce((!col("event_type").isin(
        "view", "click", "purchase", "signup", "error")).cast("long"), lit(1L)))
        .as("v_bad_type"),
      sum(coalesce((col("ts") < lit(TsMin).cast("timestamp") ||
        col("ts") >= lit(TsMaxExcl).cast("timestamp")).cast("long"), lit(1L)))
        .as("v_ts_range"))
    m.select(explode(array(
        struct(lit("completeness_event_id").as("check_name"),
          col("v_null_id").as("violations"),
          (col("v_null_id") === 0).as("passed")),
        struct(lit("completeness_value").as("check_name"),
          col("v_null_value").as("violations"),
          (col("v_null_value") * lit(1000L) <= col("n_rows") * lit(ValueNullPerMille))
            .as("passed")),
        struct(lit("uniqueness_event_id").as("check_name"),
          col("v_dup_id").as("violations"),
          (col("v_dup_id") === 0).as("passed")),
        struct(lit("non_negative_value").as("check_name"),
          col("v_neg_value").as("violations"),
          (col("v_neg_value") === 0).as("passed")),
        struct(lit("domain_event_type").as("check_name"),
          col("v_bad_type").as("violations"),
          (col("v_bad_type") === 0).as("passed")),
        struct(lit("ts_in_window").as("check_name"),
          col("v_ts_range").as("violations"),
          (col("v_ts_range") === 0).as("passed")))).as("c"))
      .select(col("c.check_name").as("check_name"),
        col("c.violations").as("violations"), col("c.passed").as("passed"))
  }

  /** Sigma multiple for [[qOutliers]] (flag |z| > 3). */
  val OutlierSigma = 3L

  /** Per-type outlier gate: what fraction of each event type's `value`s
    * sit more than [[OutlierSigma]]σ from that type's mean — the
    * Deequ-style anomaly metric a pipeline watches per partition/day, as
    * a bounded per-type report.
    *
    * The z-score never becomes a float: |x − μ| > 3σ squares to
    * `(n·x − S)² > 9·(n·Q − S²)` over the exact integer moments
    * (S = Σ cents, Q = Σ cents², both from [[graft.functions.Exact]]'s
    * fixed-point cents), evaluated in decimal(38,0) so the comparison is
    * overflow-proof and engine-identical — a float σ would make the flag
    * of every near-threshold row rounding-dependent. Zero-variance groups
    * flag nothing: all x equal ⇒ n·x − S = 0.
    *
    * Shape (r17 rewrite, guide §1.2/§2.3 — one pass, flag the census not
    * the rows): ONE scan collapses the fact to the (event_type, x, cnt)
    * census — the only input-sized pass, map-side combinable. The
    * per-type moments are census sums weighted by cnt (Σ x·cnt, Σ x²·cnt
    * — the identical decimal values the raw-row sums produced), they
    * broadcast back onto the CENSUS for the flag pass, and the output
    * aggregate weights each distinct value's flag by its count. The
    * previous form scanned the fact twice and ran the flag expression
    * per raw row; flags are per distinct value, so the census form is
    * value-identical with domain-bounded (Zipf-bounded distinct cents)
    * downstream frames. The same census shape handles any "flag rows vs
    * their group statistic" rule whose flag depends only on the value. */
  def qOutliers(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val e = Tables.events(spark, dir).filter(col("value").isNotNull)
      .select(col("event_type"), Exact.cents(col("value")).as("x"))
      .groupBy(col("event_type"), col("x")).agg(count(lit(1)).as("cnt"))
    // moments accumulate in decimal(38,0) from the first multiply — a
    // LongType x·x would overflow at a single ~$30M value and a LongType
    // Σx² at ~10¹⁰ ordinary rows per type, both plausible at 100 TB.
    // Headroom bound (ADVICE r9): decimal(38,0) caps at ~1e38, where
    // Spark's non-ANSI overflow silently NULLs while DuckDB's HUGEINT
    // computes exactly to ~1.7e38 — the flags are engine-identical only
    // below that magnitude (n·q and s², i.e. ~1e38 ⇒ Σx² per type ≲
    // 1e38/n — comfortably beyond any cents-scale corpus, but a rule
    // over raw 1e15-scale values would need decimal rescaling first)
    val stats = e.groupBy(col("event_type")).agg(
      sum(col("cnt")).as("n"), sum(d(col("x")) * d(col("cnt"))).as("s"),
      sum(d(col("x")) * d(col("x")) * d(col("cnt"))).as("q"))
    val lhs = d(col("n")) * d(col("x")) - d(col("s"))
    val rhs = lit(OutlierSigma * OutlierSigma).cast("decimal(38,0)") *
      (d(col("n")) * d(col("q")) - d(col("s")) * d(col("s")))
    e.join(broadcast(stats), "event_type")
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n_events"),
        sum(when(lhs * lhs > rhs, col("cnt")).otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_milli", expr("(1000 * n_outliers) DIV n_events"))
  }

  /** MAD multiple for [[qMadOutliers]] (flag dev > 3·MAD). */
  val MadK = 3L

  /** Robust per-type outlier gate — the median/MAD twin of [[qOutliers]]:
    * flag rows whose |x − median| exceeds [[MadK]]·MAD, where MAD is the
    * median absolute deviation. The 3σ rule breaks exactly when it is
    * needed most — a fat tail inflates σ until the tail passes its own
    * gate (masking); the median and MAD have 50% breakdown points, so a
    * contaminated type still gets a sane threshold. Everything stays in
    * integer cents: the lower median is the element at rank ⌊(n+1)/2⌋ of
    * the per-type sort (the [[graft.ext.pipeline.CurateQueries]]
    * q_len_quantiles rank rule), deviations are |x − med| on BIGINT, and
    * the flag compares longs — no float ever forms, so every
    * near-threshold verdict is engine-identical. MAD = 0 (over half the
    * type at one value) flags every deviating row — the strictest
    * consistent reading, pinned in DqSpec.
    *
    * Shape: two count-of-counts medians (see [[lowerMedian]] — the fact
    * collapses to the (type, value)-grain count frame before any window
    * forms, so the exact-median sort runs over distinct cents, not rows)
    * + one broadcast-stats flag pass. The medians are exact at any row
    * count for the price of a domain-bounded frame; if the VALUE domain
    * itself ever grew unbounded, swap both for `approx_percentile(0.5)`
    * (mergeable KLL) and keep this exact form as its oracle anchor.
    * Output is |types| rows at any scale. */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact
    madOutliers(Tables.events(spark, dir).filter(col("value").isNotNull)
      .select(col("event_type"), Exact.cents(col("value")).as("x")))
  }

  /** Per-group lower median: the element at rank ⌊(n+1)/2⌋ (1-based) of
    * each event_type partition's sort on `c` — ties are benign because
    * only the VALUE at the rank survives. Shared by the MAD gate and the
    * daily-volume anomaly gate.
    *
    * Shape: the count-of-counts contraction (the q_weighted_median
    * discipline, [[graft.batch.StatsQueries]]): the input collapses to
    * the (event_type, value)-grain count frame FIRST — one map-side
    * combinable aggregate, the only input-sized pass — and the
    * cumulative window runs over that value-distinct frame, where the
    * lower median is the smallest value whose cumulative count reaches
    * rank ⌊(n+1)/2⌋. The previous form windowed RAW rows partitioned by
    * ~10 event_types, funneling n/|types| rows through each WindowExec
    * task — a single-task-class sort at 100× scale; here the window's
    * input is domain-bounded (distinct cents / distinct daily counts),
    * not data-bounded. DqSpec pins the plan shape (every Window sits
    * above an Aggregate). */
  private def lowerMedian(df: DataFrame, c: String): DataFrame =
    lowerMedianOfCounts(
      df.groupBy(col("event_type"), col(c)).agg(count(lit(1)).as("cnt")), c)

  /** [[lowerMedian]]'s window half over an ALREADY-CONTRACTED
    * (event_type, c, cnt) count frame — factored out (r17) so
    * [[madOutliers]] can derive its deviation median from the value-grain
    * count frame directly instead of re-scanning raw rows (the dev
    * distribution is a pure function of the (value, cnt) census: dev
    * counts = Σ cnt grouped by |x − med|). */
  private def lowerMedianOfCounts(counts: DataFrame, c: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the group total rides the SAME WindowExec as the running sum (same
    // partition key, whole-partition frame) — a groupBy+join twin would
    // recompute the count frame from the scan a second time
    val byType = Window.partitionBy("event_type")
    counts
      .withColumn("cum", sum(col("cnt")).over(byType.orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", sum(col("cnt")).over(byType))
      .filter(col("cum") >= expr("(n + 1) DIV 2"))
      .groupBy(col("event_type"))
      .agg(min(col(c)).as(s"med_$c"))
  }

  /** Sketch accuracy for [[lowerMedianApprox]] — the q_approx_pctl
    * setting: rank error ≤ n/accuracy, summaries exact below it. */
  val ApproxAcc = 10000

  /** Sketch twin of [[lowerMedian]] (VERDICT r13 #4): `approx_percentile`
    * — a mergeable GK-style summary, so the median becomes ONE map-side-
    * combinable aggregate with bounded state, with no cumulative window
    * at all. This is the documented swap for the day the VALUE domain
    * itself grows unbounded (the q_weighted_median scale13 axis, where
    * the exact count-of-counts frame — and therefore the window input —
    * grows with the domain): rank error is ≤ n/[[ApproxAcc]], the state
    * is O(accuracy·log n) per group regardless of distinct values. Kept
    * spec-only (DqSpec bounds it against the exact oracled
    * q_mad_outliers at the identical grain); the exact form stays the
    * oracle anchor, the same split as q_percentiles vs q_approx_pctl. */
  private def lowerMedianApprox(df: DataFrame, c: String): DataFrame =
    df.groupBy(col("event_type"))
      .agg(expr(s"approx_percentile($c, 0.5, $ApproxAcc)").as(s"med_$c"))

  /** The kernel over an (event_type, x: long) frame — DqSpec drives it
    * over crafted fixtures (MAD = 0, masking) the corpus can't express.
    *
    * r17 rewrite (guide §1.2/§2.3 — one pass, shuffle the census not the
    * rows): the previous form scanned the input FOUR times (x-median's
    * count frame, the dev frame, the dev-median's count frame through it,
    * and the final flag pass — each a full raw-grain subtree Catalyst
    * plans independently). But every number this query emits is a pure
    * function of the (event_type, x, cnt) census: the dev distribution is
    * Σ cnt grouped by |x − med_x|, n_events = Σ cnt, and the flag pass
    * weights each distinct value by its count. So the input collapses to
    * the census in ONE map-side-combinable aggregate — the only
    * input-sized pass — and medians, deviations, and flags all contract
    * over domain-bounded frames (distinct cents per type, Zipf-bounded).
    * Values are bit-identical: the census is the same multiset the raw
    * passes consumed, and the per-value expressions are unchanged. */
  def madOutliers(e: DataFrame): DataFrame = {
    val counts = e.groupBy(col("event_type"), col("x"))
      .agg(count(lit(1)).as("cnt"))
    val med = lowerMedianOfCounts(counts, "x")
    val devCounts = counts.join(broadcast(med), "event_type")
      .groupBy(col("event_type"), abs(col("x") - col("med_x")).as("dev"))
      .agg(sum(col("cnt")).as("cnt"))
    val mad = lowerMedianOfCounts(devCounts, "dev")
    counts.join(broadcast(med), "event_type")
      .join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n_events"),
        max(col("med_x")).as("median_cents"),
        max(col("med_dev")).as("mad_cents"),
        sum(when(abs(col("x") - col("med_x")) > lit(MadK) * col("med_dev"),
          col("cnt")).otherwise(0L)).as("n_outliers"))
      .withColumn("outlier_milli", expr("(1000 * n_outliers) DIV n_events"))
  }

  /** [[madOutliers]] on the sketch median — identical flag pass, the two
    * exact count-of-counts medians swapped for [[lowerMedianApprox]]. */
  def madOutliersApprox(e: DataFrame): DataFrame =
    madOutliersWith(e, lowerMedianApprox)

  def qMadOutliersApprox(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact
    madOutliersApprox(Tables.events(spark, dir).filter(col("value").isNotNull)
      .select(col("event_type"), Exact.cents(col("value")).as("x")))
  }

  private def madOutliersWith(e: DataFrame,
      median: (DataFrame, String) => DataFrame): DataFrame = {
    val med = median(e, "x")
    val dev = e.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("x") - col("med_x")))
    val mad = median(dev.select(col("event_type"), col("dev")), "dev")
    dev.join(broadcast(mad), "event_type")
      .withColumn("f", when(col("dev") > lit(MadK) * col("med_dev"), 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        max(col("med_x")).as("median_cents"),
        max(col("med_dev")).as("mad_cents"),
        sum(col("f")).as("n_outliers"))
      .withColumn("outlier_milli", expr("(1000 * n_outliers) DIV n_events"))
  }

  /** Reference/current boundary for [[qDriftTv]] — the corpus spans
    * January 2024, so each window holds roughly half of it. */
  val DriftCutoff = "2024-01-16 00:00:00"

  /** Equi-width buckets the two windows' value distributions are compared
    * over (the stats_histogram bucket rule, shared bounds). */
  val DriftBuckets = 10L

  /** Distribution-drift monitor: per event type, the total-variation
    * distance (in milli) between the value distribution of a REFERENCE
    * window and the CURRENT window — the "did yesterday's feed change
    * shape" gate a pipeline checks before republishing a model or a
    * summary, with TV chosen over PSI/KL because it needs no logarithm:
    *
    *   TV = ½ Σ_b |o_cur/N_cur − o_ref/N_ref|
    *      ⇒ tv_milli = (1000 · Σ_b |o_cur·N_ref − o_ref·N_cur|)
    *                   DIV (2 · N_ref · N_cur)
    *
    * — denominators cleared, so the statistic is exact integer end to end
    * (products in decimal(38,0) / HUGEINT like q_outliers' moments) and
    * every near-threshold drift score is engine-identical. Both windows
    * bucket against the SAME global [lo, hi] envelope ([[DriftBuckets]]
    * equi-width, the stats_histogram rule), because per-window bounds
    * would hide exactly the shift being measured.
    *
    * Shape: one scan with the side flag as a conditional-sum pivot — no
    * per-side self-join; bounds are a 1-row broadcast; the
    * (type × bucket) frame and the per-type totals are
    * bounded-cardinality. At 100 TB this is one scan-bandwidth pass +
    * kilobyte aggregates, run per partition/day as a standing monitor. */
  def qDriftTv(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact
    val cut = lit(DriftCutoff).cast("timestamp")
    driftTv(Tables.events(spark, dir).filter(col("value").isNotNull)
      .select(col("event_type"), Exact.cents(col("value")).as("x"),
        (col("ts") < cut).cast("long").as("is_ref")))
  }

  /** The kernel over an (event_type, x: long, is_ref: 0|1) frame — DqSpec
    * drives the identical-window (TV = 0) and disjoint-support
    * (TV = 1000) boundary cases over crafted fixtures. */
  def driftTv(e: DataFrame): DataFrame =
    tvFromCounts(driftCounts(e,
      e.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))))

  /** Bucket-count state of a (event_type, x, is_ref) frame against a
    * FIXED (lo, hi) envelope — (type, bucket, o_ref, o_cur) rows. These
    * counts are MERGEABLE partials (sum ⊕ sum), which is what makes the
    * monitor a standing streaming view: a foreachBatch sink folds each
    * micro-batch's counts into bounded state (types × buckets rows) and
    * rescores with [[tvFromCounts]] — batch ≡ stream pinned in DqSpec.
    * The envelope comes from the REFERENCE artifact in that regime
    * (per-batch bounds would shift the buckets and hide the drift). */
  private[graft] def driftCounts(e: DataFrame, bounds: DataFrame): DataFrame =
    e.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr(s"((x - lo) * $DriftBuckets) DIV (hi - lo + 1)"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("is_ref")).as("o_ref"),
        sum(lit(1L) - col("is_ref")).as("o_cur"))

  /** The TV score over a (type, bucket, o_ref, o_cur) count frame. The
    * per-type totals ride a whole-partition window over the (bounded)
    * count frame — a groupBy+join twin would recompute the counts (a
    * full scan in the batch monitors) a second time (r13). */
  private[graft] def tvFromCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val byType = Window.partitionBy("event_type")
    counts
      .withColumn("n_ref", sum(col("o_ref")).over(byType))
      .withColumn("n_cur", sum(col("o_cur")).over(byType))
      .withColumn("term",
        abs(d(col("o_cur")) * d(col("n_ref")) - d(col("o_ref")) * d(col("n_cur"))))
      .groupBy(col("event_type"))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        sum(col("term")).as("num"))
      .withColumn("tv_milli",
        when(col("n_ref") > 0 && col("n_cur") > 0,
          expr("CAST((1000 * num) DIV (2 * n_ref * n_cur) AS BIGINT)")))
      .select(col("event_type"), col("n_ref"), col("n_cur"), col("tv_milli"))
  }

  /** Free-ride DQ counters via Spark's Observation API: attach the audit
    * metrics to the frame so they come out of the SAME job that produces
    * the data — zero extra scan. At 100 TB this is the difference between
    * auditing for free and paying a second full pass: a pipeline wraps
    * its output frame here, writes it, and reads row/null/negative
    * counters off the finished job (the streaming twin is
    * `observedMetrics` in each QueryProgress — same expressions).
    * The counters mirror the q_dq_audit rules so the two surfaces cannot
    * disagree about what "violation" means; DqSpec pins the observed
    * values against direct filter counts from a separate pass. */
  def observed(df: DataFrame,
               name: String = "dq"): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    (df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(col("value").isNull.cast("long")).as("n_null_value"),
      sum((col("value") < 0).cast("long")).as("n_neg_value"),
      sum(col("event_id").isNull.cast("long")).as("n_null_id")), obs)
  }

  /** Kolmogorov–Smirnov drift monitor — the SECOND scoring rule over the
    * SAME mergeable bucket-count state as [[qDriftTv]]:
    *
    *   KS = max_b |C_cur(b)/N_cur − C_ref(b)/N_ref|
    *      ⇒ ks_milli = (1000 · max_b |c_cur·N_ref − c_ref·N_cur|)
    *                   DIV (N_ref · N_cur)
    *
    * over CUMULATIVE bucket counts c = Σ_{b'≤b} o. Where TV (½·L1) reads
    * total mass displaced anywhere, KS reads the largest one-sided CDF
    * gap — a location shift that TV spreads across many buckets
    * concentrates into one KS gap, so the two catch different drift
    * shapes from one state. Denominators cleared as in TV: exact integer
    * end to end (decimal(38,0) / HUGEINT products), and KS ≤ TV always
    * (the max of partial sums of signed terms is bounded by half their
    * absolute sum) — DqSpec pins that ordering on the corpus.
    *
    * Shape: nothing new touches the fact — the cumulative window runs
    * over the (type × [[DriftBuckets]]) count frame (≤ tens of rows), so
    * a deployment keeps ONE standing count state and rescores both
    * monitors per micro-batch for kilobytes of work. */
  def qDriftKs(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact
    val cut = lit(DriftCutoff).cast("timestamp")
    driftKs(Tables.events(spark, dir).filter(col("value").isNotNull)
      .select(col("event_type"), Exact.cents(col("value")).as("x"),
        (col("ts") < cut).cast("long").as("is_ref")))
  }

  /** The KS kernel over an (event_type, x: long, is_ref: 0|1) frame —
    * same envelope rule as [[driftTv]], shared [[driftCounts]] state. */
  def driftKs(e: DataFrame): DataFrame =
    ksFromCounts(driftCounts(e,
      e.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))))

  /** The KS score over a (type, bucket, o_ref, o_cur) count frame. The
    * cumulative window partitions by type over ≤ [[DriftBuckets]] rows —
    * bounded, never data-sized. */
  private[graft] def ksFromCounts(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
    // totals ride the SAME WindowExec (whole-partition frame) instead of
    // a groupBy+join that would recompute the count frame (r13)
    val byType = Window.partitionBy(col("event_type"))
    counts
      .withColumn("c_ref", sum(col("o_ref")).over(w))
      .withColumn("c_cur", sum(col("o_cur")).over(w))
      .withColumn("n_ref", sum(col("o_ref")).over(byType))
      .withColumn("n_cur", sum(col("o_cur")).over(byType))
      .withColumn("gap",
        abs(d(col("c_cur")) * d(col("n_ref")) - d(col("c_ref")) * d(col("n_cur"))))
      .groupBy(col("event_type"))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        max(col("gap")).as("num"))
      .withColumn("ks_milli",
        when(col("n_ref") > 0 && col("n_cur") > 0,
          expr("CAST((1000 * num) DIV (n_ref * n_cur) AS BIGINT)")))
      .select(col("event_type"), col("n_ref"), col("n_cur"), col("ks_milli"))
  }

  /** Daily-volume anomaly gate: for each (event_type, day), is that day's
    * event COUNT anomalous against the type's daily history? The same
    * median/MAD rule as [[qMadOutliers]] applied at the day grain — the
    * "did yesterday's feed spike or go dark" check a standing pipeline
    * runs before trusting a partition, robust against the very outage
    * days it exists to catch (a week-long outage shifts a mean; the
    * median shrugs). All counts are integers, so the gate is exact; a
    * MAD of 0 (over half the days at one volume) flags any deviating
    * day — strictest consistent reading, like the value-grain gate.
    *
    * Shape: the fact collapses to the |types|×|days| count frame FIRST
    * (one map-side-combinable aggregate — the only full-data pass), and
    * every window/join after it runs on that bounded frame. Output is
    * the full per-day report with the per-type thresholds attached, so
    * the flag is auditable, not just asserted. */
  def qAnomalyDays(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("event_date"))
      .agg(count(lit(1)).as("x"))
    val med = lowerMedian(d.select(col("event_type"), col("x")), "x")
    val dev = d.join(broadcast(med), "event_type")
      .withColumn("dev", abs(col("x") - col("med_x")))
    val mad = lowerMedian(dev.select(col("event_type"), col("dev")), "dev")
    dev.join(broadcast(mad), "event_type")
      .select(col("event_type"), col("event_date"), col("x").as("n_events"),
        col("med_x").as("median_n"), col("med_dev").as("mad_n"),
        (col("dev") > lit(MadK) * col("med_dev")).as("is_anomaly"))
  }

  /** Frequency quantile probed by [[qSkewMetrics]] (p99 of key counts). */
  val SkewPctl = 99L

  /** Join-key skew census — the diagnostic that decides whether a key
    * needs salting/AQE-skew handling BEFORE the shuffle burns a retry:
    * for each candidate key column, the key-frequency distribution's
    * headline numbers — distinct keys, the hottest key's row share, and
    * the p99/median frequency ratio (exact rank arithmetic, integer
    * end to end). A diffuse key (user_id) and a concentrated one
    * (event_type) bracket the scale: top_share_milli ≈ 0 vs ≈ 200 here.
    *
    * Shape — the count-of-COUNTS contraction, because the frequency
    * frame itself is |keys|-sized (billions of user_ids at 100 TB) and
    * must never meet a single-partition window: per column one
    * map-side-combinable aggregate collapses the fact to key
    * frequencies, a second collapses THOSE to the frequency-of-
    * frequencies frame (distinct count VALUES — Zipf-bounded, tiny),
    * and the exact median/p99 read off its cumulative sum (value at
    * rank r ≡ min c with cum(c) ≥ r, the same rank rule as the MAD
    * family). Only the bounded cc frame ever sees a window; the two
    * fact-side aggregates are the operator's whole cost. */
  def qSkewMetrics(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir)
    def report(keyCol: String): DataFrame = {
      val freq = e.groupBy(col(keyCol).cast("string").as("k"))
        .agg(count(lit(1)).as("c"))
      val cc = freq.groupBy(col("c")).agg(count(lit(1)).as("kn"))
        .select(lit(keyCol).as("key_col"), col("c"), col("kn"))
      val wAll = Window.partitionBy("key_col")
      cc.withColumn("cum", sum(col("kn")).over(wAll.orderBy(col("c"))))
        .withColumn("nk", sum(col("kn")).over(wAll))
        .groupBy(col("key_col"))
        .agg(sum(col("c") * col("kn")).as("n_rows"),
          max(col("nk")).as("n_keys"),
          max(col("c")).as("max_count"),
          min(when(expr("cum >= (nk + 1) DIV 2"), col("c"))).as("med_count"),
          min(when(expr(s"cum >= ((nk * $SkewPctl) + 99) DIV 100"), col("c")))
            .as("p99_count"))
        .withColumn("top_share_milli", expr("(1000 * max_count) DIV n_rows"))
        .withColumn("skew_ratio_milli", expr("(1000 * p99_count) DIV med_count"))
    }
    report("user_id").unionByName(report("event_type"))
  }

  /** Referential-integrity audit across the star schema: one row per
    * FK edge with the child row count, NULL-key count, and ORPHAN count
    * (non-null keys with no parent) — the cross-TABLE complement of
    * [[qDqAudit]]'s single-table constraints, and the audit that tells a
    * pipeline whether its dimension joins will silently drop or
    * null-extend fact rows before it runs them.
    *
    * Shape: per edge one LEFT ANTI join of the child's key projection
    * against the parent's key column (broadcast for dimension parents,
    * shuffle for fact-sized ones — Catalyst's choice), collapsed to a
    * 1-row count; the edges union into a |edges|-row report. No
    * driver-side counting — the whole audit is one DataFrame. */
  /** One FK-edge report row — split out so DqSpec can drive orphan and
    * null-key fixtures the intact corpus cannot express. */
  private[graft] def refEdge(name: String, child: DataFrame, key: String,
                             parent: DataFrame, pkey: String): DataFrame = {
    val base = child.agg(count(lit(1)).as("n_child"),
      sum(col(key).isNull.cast("long")).as("n_null_keys"))
    val orphans = child.select(col(key)).filter(col(key).isNotNull)
      .join(parent.select(col(pkey)), col(key) === col(pkey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    base.crossJoin(broadcast(orphans))
      .select(lit(name).as("relation"), col("n_child"),
        col("n_null_keys"), col("n_orphans"),
        (col("n_null_keys") === 0 && col("n_orphans") === 0).as("intact"))
  }

  def qRefIntegrity(spark: SparkSession, dir: String): DataFrame = {
    // edges grouped by CHILD so each child table's WHOLE report — row
    // count, per-key null counts, AND per-key orphan counts — comes from
    // ONE scan (r17 rewrite, guide §1.2: the per-edge anti-joins each
    // re-scanned the child, so lineitem paid four full passes).
    val edges: Seq[(String, DataFrame, Seq[(String, DataFrame, String)])] = Seq(
      ("lineitem", Tables.lineitem(spark, dir), Seq(
        ("l_orderkey", Tables.orders(spark, dir), "o_orderkey"),
        ("l_suppkey", Tables.supplier(spark, dir), "s_suppkey"),
        ("l_partkey", Tables.part(spark, dir), "p_partkey"))),
      ("orders", Tables.orders(spark, dir), Seq(
        ("o_custkey", Tables.customer(spark, dir), "c_custkey"))),
      ("customer", Tables.customer(spark, dir), Seq(
        ("c_nationkey", Tables.nation(spark, dir), "n_nationkey"))),
      ("supplier", Tables.supplier(spark, dir), Seq(
        ("s_nationkey", Tables.nation(spark, dir), "n_nationkey"))),
      ("nation", Tables.nation(spark, dir), Seq(
        ("n_regionkey", Tables.region(spark, dir), "r_regionkey"))),
      ("events", Tables.events(spark, dir), Seq(
        ("user_id", Tables.customer(spark, dir), "c_custkey"))))
    edges.map { case (childName, child, fks) =>
      // One pass per child: LEFT-join the child's key projection against
      // each parent's DISTINCT key column (≤1 match per child row by
      // construction, so n_child is preserved), then fold row count, null
      // counts, and orphan counts (key present, no parent hit) into one
      // map-side-combinable aggregate. Dimension parents broadcast,
      // fact-sized ones shuffle — Catalyst/AQE's choice, exactly as the
      // former per-edge anti-joins left it. A left join against distinct
      // keys is the anti-join's superset: the anti-join's survivors are
      // precisely the null-hit rows counted here.
      val joined = fks.zipWithIndex.foldLeft(
        child.select(fks.map { case (k, _, _) => col(k) }: _*)) {
        case (df, ((k, parent, pkey), i)) =>
          val pk = parent.select(col(pkey).as(s"__pk_$i")).distinct()
            .withColumn(s"__hit_$i", lit(true))
          df.join(pk, col(k) === col(s"__pk_$i"), "left").drop(s"__pk_$i")
      }
      val aggCols = fks.zipWithIndex.flatMap { case ((k, _, _), i) => Seq(
        sum(col(k).isNull.cast("long")).as(s"__null_$i"),
        sum((col(k).isNotNull && col(s"__hit_$i").isNull).cast("long"))
          .as(s"__orph_$i"))
      }
      val reports = fks.zipWithIndex.map { case ((k, _, pkey), i) =>
        struct(lit(s"$childName.$k->${parentName(pkey)}").as("relation"),
          col(s"__null_$i").as("n_null_keys"), col(s"__orph_$i").as("n_orphans"))
      }
      joined.agg(count(lit(1)).as("n_child"), aggCols: _*)
        .select(col("n_child"), explode(array(reports: _*)).as("e"))
        .select(col("e.relation").as("relation"), col("n_child"),
          col("e.n_null_keys").as("n_null_keys"),
          col("e.n_orphans").as("n_orphans"),
          (col("e.n_null_keys") === 0 && col("e.n_orphans") === 0).as("intact"))
    }.reduce(_ unionByName _)
  }

  /** Parent-table display name from its pk column prefix. */
  private def parentName(pkey: String): String = pkey match {
    case "o_orderkey" => "orders"; case "s_suppkey" => "supplier"
    case "p_partkey" => "part"; case "c_custkey" => "customer"
    case "n_nationkey" => "nation"; case "r_regionkey" => "region"
    case other => other
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ref_integrity" -> (qRefIntegrity _),
    "q_dq_audit" -> (qDqAudit _),
    "q_outliers" -> (qOutliers _),
    "q_mad_outliers" -> (qMadOutliers _),
    "q_drift_tv" -> (qDriftTv _),
    "q_drift_ks" -> (qDriftKs _),
    "q_anomaly_days" -> (qAnomalyDays _),
    "q_skew_metrics" -> (qSkewMetrics _))

  /** Sketch queries (SURVEY §5.2): no DuckDB oracle — GK summaries are
    * engine-specific — DqSpec tolerance-bounds each against its exact
    * oracled twin above. */
  val specOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mad_outliers_approx" -> (qMadOutliersApprox _))

  private def refEdgeSql(name: String, child: String, key: String,
                         parent: String, pkey: String): String =
    s"""SELECT '$name' AS relation,
       |  (SELECT count(*) FROM $child) AS n_child,
       |  (SELECT count(*) FROM $child WHERE $key IS NULL) AS n_null_keys,
       |  (SELECT count(*) FROM $child c WHERE c.$key IS NOT NULL
       |     AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pkey = c.$key))
       |    AS n_orphans""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_ref_integrity" ->
      s"""SELECT relation, n_child, n_null_keys, n_orphans,
         |  n_null_keys = 0 AND n_orphans = 0 AS intact
         |FROM (
         |${Seq(
            refEdgeSql("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
            refEdgeSql("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
            refEdgeSql("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
            refEdgeSql("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
            refEdgeSql("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
            refEdgeSql("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
            refEdgeSql("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
            refEdgeSql("events.user_id->customer", "events", "user_id", "customer", "c_custkey"))
          .mkString("\nUNION ALL\n")}
         |) edges""".stripMargin,
    "q_dq_audit" ->
      s"""WITH m AS (
         |  SELECT count(*) AS n_rows,
         |    sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS v_null_id,
         |    sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS v_null_value,
         |    count(*) - count(DISTINCT event_id) AS v_dup_id,
         |    sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS v_neg_value,
         |    sum(CASE WHEN event_type IS NULL OR event_type NOT IN
         |      ('view','click','purchase','signup','error') THEN 1 ELSE 0 END) AS v_bad_type,
         |    sum(CASE WHEN ts IS NULL OR ts < TIMESTAMP '$TsMin'
         |      OR ts >= TIMESTAMP '$TsMaxExcl' THEN 1 ELSE 0 END) AS v_ts_range
         |  FROM events)
         |SELECT 'completeness_event_id' AS check_name,
         |  CAST(v_null_id AS BIGINT) AS violations, v_null_id = 0 AS passed FROM m
         |UNION ALL SELECT 'completeness_value',
         |  CAST(v_null_value AS BIGINT), v_null_value * 1000 <= n_rows * $ValueNullPerMille FROM m
         |UNION ALL SELECT 'uniqueness_event_id',
         |  CAST(v_dup_id AS BIGINT), v_dup_id = 0 FROM m
         |UNION ALL SELECT 'non_negative_value',
         |  CAST(v_neg_value AS BIGINT), v_neg_value = 0 FROM m
         |UNION ALL SELECT 'domain_event_type',
         |  CAST(v_bad_type AS BIGINT), v_bad_type = 0 FROM m
         |UNION ALL SELECT 'ts_in_window',
         |  CAST(v_ts_range AS BIGINT), v_ts_range = 0 FROM m""".stripMargin,
    // HUGEINT (128-bit) is DuckDB's twin of Spark's decimal(38,0) here:
    // both evaluate (n·x−S)² > 9(nQ−S²) exactly, so the flag of every
    // near-threshold row is engine-identical
    "q_outliers" ->
      s"""WITH e AS (
         |  SELECT event_type, ${graft.functions.Exact.centsSql("value")} AS x
         |  FROM events WHERE value IS NOT NULL),
         |st AS (
         |  SELECT event_type, count(*) AS n,
         |    sum(CAST(x AS HUGEINT)) AS s, sum(CAST(x AS HUGEINT) * x) AS q
         |  FROM e GROUP BY 1),
         |fl AS (
         |  SELECT e.event_type,
         |    CASE WHEN (CAST(st.n AS HUGEINT)*e.x - st.s)
         |           * (CAST(st.n AS HUGEINT)*e.x - st.s)
         |         > ${OutlierSigma * OutlierSigma}
         |           * (CAST(st.n AS HUGEINT)*st.q - CAST(st.s AS HUGEINT)*st.s)
         |      THEN 1 ELSE 0 END AS f
         |  FROM e JOIN st USING (event_type))
         |SELECT event_type, count(*) AS n_events,
         |  CAST(sum(f) AS BIGINT) AS n_outliers,
         |  (1000 * CAST(sum(f) AS BIGINT)) // count(*) AS outlier_milli
         |FROM fl GROUP BY 1""".stripMargin,
    // identical lower-median rank rule ((n+1)//2 of the per-type sort) and
    // all-integer deviations — ties are benign because only the VALUE at
    // the rank survives, never the row identity
    "q_mad_outliers" ->
      s"""WITH e AS (
         |  SELECT event_type, ${graft.functions.Exact.centsSql("value")} AS x
         |  FROM events WHERE value IS NOT NULL),
         |r AS (
         |  SELECT event_type, x,
         |    row_number() OVER (PARTITION BY event_type ORDER BY x) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM e),
         |med AS (SELECT event_type, x AS med FROM r WHERE rn = (n + 1) // 2),
         |d AS (
         |  SELECT e.event_type, abs(e.x - med.med) AS dev, med.med
         |  FROM e JOIN med USING (event_type)),
         |rd AS (
         |  SELECT event_type, dev,
         |    row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM d),
         |mad AS (SELECT event_type, dev AS mad FROM rd WHERE rn = (n + 1) // 2),
         |fl AS (
         |  SELECT d.event_type, d.med, mad.mad,
         |    CASE WHEN d.dev > $MadK * mad.mad THEN 1 ELSE 0 END AS f
         |  FROM d JOIN mad USING (event_type))
         |SELECT event_type, count(*) AS n_events,
         |  max(med) AS median_cents, max(mad) AS mad_cents,
         |  CAST(sum(f) AS BIGINT) AS n_outliers,
         |  (1000 * CAST(sum(f) AS BIGINT)) // count(*) AS outlier_milli
         |FROM fl GROUP BY 1""".stripMargin,
    // same global-envelope bucket rule, same cleared-denominator TV
    // arithmetic in HUGEINT — every operand nonnegative, so DuckDB's
    // flooring // and Spark's truncating DIV agree
    "q_drift_tv" ->
      s"""WITH e AS (
         |  SELECT event_type, ${graft.functions.Exact.centsSql("value")} AS x,
         |    CASE WHEN ts < TIMESTAMP '$DriftCutoff' THEN 1 ELSE 0 END AS is_ref
         |  FROM events WHERE value IS NOT NULL),
         |b AS (SELECT min(x) AS lo, max(x) AS hi FROM e),
         |c AS (
         |  SELECT event_type,
         |    ((x - lo) * $DriftBuckets) // (hi - lo + 1) AS bucket,
         |    CAST(sum(is_ref) AS BIGINT) AS o_ref,
         |    CAST(sum(1 - is_ref) AS BIGINT) AS o_cur
         |  FROM e, b GROUP BY 1, 2),
         |t AS (
         |  SELECT event_type, CAST(sum(o_ref) AS BIGINT) AS n_ref,
         |    CAST(sum(o_cur) AS BIGINT) AS n_cur
         |  FROM c GROUP BY 1),
         |j AS (
         |  SELECT c.event_type, t.n_ref, t.n_cur,
         |    abs(CAST(c.o_cur AS HUGEINT) * t.n_ref
         |        - CAST(c.o_ref AS HUGEINT) * t.n_cur) AS term
         |  FROM c JOIN t ON c.event_type = t.event_type)
         |SELECT event_type, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
         |  CASE WHEN max(n_ref) > 0 AND max(n_cur) > 0
         |    THEN CAST((1000 * sum(term))
         |      // (2 * CAST(max(n_ref) AS HUGEINT) * max(n_cur)) AS BIGINT)
         |  END AS tv_milli
         |FROM j GROUP BY 1""".stripMargin,
    // the q_drift_tv statement's e/b/c/t CTEs verbatim (one truth for the
    // shared count state), with the scoring tail swapped: cumulative
    // counts via a per-type ordered window, max gap instead of half-sum
    "q_drift_ks" ->
      s"""WITH e AS (
         |  SELECT event_type, ${graft.functions.Exact.centsSql("value")} AS x,
         |    CASE WHEN ts < TIMESTAMP '$DriftCutoff' THEN 1 ELSE 0 END AS is_ref
         |  FROM events WHERE value IS NOT NULL),
         |b AS (SELECT min(x) AS lo, max(x) AS hi FROM e),
         |c AS (
         |  SELECT event_type,
         |    ((x - lo) * $DriftBuckets) // (hi - lo + 1) AS bucket,
         |    CAST(sum(is_ref) AS BIGINT) AS o_ref,
         |    CAST(sum(1 - is_ref) AS BIGINT) AS o_cur
         |  FROM e, b GROUP BY 1, 2),
         |t AS (
         |  SELECT event_type, CAST(sum(o_ref) AS BIGINT) AS n_ref,
         |    CAST(sum(o_cur) AS BIGINT) AS n_cur
         |  FROM c GROUP BY 1),
         |cum AS (
         |  SELECT event_type, bucket,
         |    sum(o_ref) OVER w AS c_ref, sum(o_cur) OVER w AS c_cur
         |  FROM c
         |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
         |j AS (
         |  SELECT cum.event_type, t.n_ref, t.n_cur,
         |    abs(CAST(cum.c_cur AS HUGEINT) * t.n_ref
         |        - CAST(cum.c_ref AS HUGEINT) * t.n_cur) AS gap
         |  FROM cum JOIN t ON cum.event_type = t.event_type)
         |SELECT event_type, max(n_ref) AS n_ref, max(n_cur) AS n_cur,
         |  CASE WHEN max(n_ref) > 0 AND max(n_cur) > 0
         |    THEN CAST((1000 * max(gap))
         |      // (CAST(max(n_ref) AS HUGEINT) * max(n_cur)) AS BIGINT)
         |  END AS ks_milli
         |FROM j GROUP BY 1""".stripMargin,
    // the q_mad_outliers rank rule at the (type, day) count grain
    "q_anomaly_days" ->
      s"""WITH d AS (
         |  SELECT event_type, CAST(ts AS DATE) AS event_date, count(*) AS x
         |  FROM events GROUP BY 1, 2),
         |r AS (
         |  SELECT event_type, x,
         |    row_number() OVER (PARTITION BY event_type ORDER BY x) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM d),
         |med AS (SELECT event_type, x AS med FROM r WHERE rn = (n + 1) // 2),
         |dv AS (
         |  SELECT d.event_type, d.event_date, d.x, med.med,
         |    abs(d.x - med.med) AS dev
         |  FROM d JOIN med USING (event_type)),
         |rd AS (
         |  SELECT event_type, dev,
         |    row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM dv),
         |mad AS (SELECT event_type, dev AS mad FROM rd WHERE rn = (n + 1) // 2)
         |SELECT dv.event_type, dv.event_date, dv.x AS n_events,
         |  dv.med AS median_n, mad.mad AS mad_n,
         |  dv.dev > $MadK * mad.mad AS is_anomaly
         |FROM dv JOIN mad USING (event_type)""".stripMargin,
    // identical count-of-counts contraction; window sums cast back from
    // HUGEINT, quantiles read off the cumulative (min c with cum >= rank)
    "q_skew_metrics" ->
      s"""WITH f1 AS (
         |  SELECT CAST(user_id AS VARCHAR) AS k, count(*) AS c
         |  FROM events GROUP BY 1),
         |cc1 AS (SELECT 'user_id' AS key_col, c, count(*) AS kn FROM f1 GROUP BY 2),
         |f2 AS (
         |  SELECT CAST(event_type AS VARCHAR) AS k, count(*) AS c
         |  FROM events GROUP BY 1),
         |cc2 AS (SELECT 'event_type' AS key_col, c, count(*) AS kn FROM f2 GROUP BY 2),
         |cc AS (SELECT * FROM cc1 UNION ALL SELECT * FROM cc2),
         |x AS (
         |  SELECT key_col, c, kn,
         |    CAST(sum(kn) OVER (PARTITION BY key_col ORDER BY c) AS BIGINT) AS cum,
         |    CAST(sum(kn) OVER (PARTITION BY key_col) AS BIGINT) AS nk
         |  FROM cc),
         |g AS (
         |  SELECT key_col, CAST(sum(c * kn) AS BIGINT) AS n_rows,
         |    max(nk) AS n_keys, max(c) AS max_count,
         |    min(CASE WHEN cum >= (nk + 1) // 2 THEN c END) AS med_count,
         |    min(CASE WHEN cum >= ((nk * $SkewPctl) + 99) // 100 THEN c END)
         |      AS p99_count
         |  FROM x GROUP BY 1)
         |SELECT key_col, n_rows, n_keys, max_count, med_count, p99_count,
         |  (1000 * max_count) // n_rows AS top_share_milli,
         |  (1000 * p99_count) // med_count AS skew_ratio_milli
         |FROM g""".stripMargin)
}
