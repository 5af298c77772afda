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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dq_audit" -> (qDqAudit _))

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
         |  CAST(v_ts_range AS BIGINT), v_ts_range = 0 FROM m""".stripMargin)
}
