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
    * Shape: one scan builds the per-type moments (map-side combinable,
    * |types| rows), which broadcast back onto the fact for the flag pass,
    * and the output aggregate is per-type again — two scans, zero wide
    * exchanges, |types| output rows at any scale. The same two-pass
    * broadcast-stats shape handles any "flag rows vs their group
    * statistic" rule. */
  def qOutliers(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact
    def d(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val e = Tables.events(spark, dir).filter(col("value").isNotNull)
      .select(col("event_type"), Exact.cents(col("value")).as("x"))
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
      count(lit(1)).as("n"), sum(d(col("x"))).as("s"),
      sum(d(col("x")) * d(col("x"))).as("q"))
    val lhs = d(col("n")) * d(col("x")) - d(col("s"))
    val rhs = lit(OutlierSigma * OutlierSigma).cast("decimal(38,0)") *
      (d(col("n")) * d(col("q")) - d(col("s")) * d(col("s")))
    e.join(broadcast(stats), "event_type")
      .withColumn("f", when(lhs * lhs > rhs, 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("f")).as("n_outliers"))
      .withColumn("outlier_milli", expr("(1000 * n_outliers) DIV n_events"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_audit" -> (qDqAudit _),
    "q_outliers" -> (qOutliers _))

  val oracles: Map[String, String] = Map(
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
         |FROM fl GROUP BY 1""".stripMargin)
}
