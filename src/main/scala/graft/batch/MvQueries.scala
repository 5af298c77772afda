package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/**
 * Incremental materialized-view maintenance — the summary-table pattern
 * that makes a 100 TB fact affordable to report on: the view's grain rows
 * carry MERGEABLE partial-aggregate state (counts, integer sums, maxes),
 * so folding a new batch in costs one pass over the BATCH plus a
 * view-grain-sized merge, and history is never rescanned. The reference
 * recomputes its daily summary from the full day's parquet every run
 * (airflow/dags/kafka_spark_etl.py:84–117, a cron-shaped full recompute);
 * this operator is that summary grown an incremental refresh path.
 *
 * The algebra is the same partial/final split Spark's own hash aggregate
 * uses between map and reduce sides — lifted to the table level:
 *
 *   - `count` and integer `sum` merge by addition (cents fixed-point per
 *     [[Exact]], so the merged sum is order-independent and exact);
 *   - `max` merges by max;
 *   - ratios (the published avg) are NOT stored — they derive from the
 *     partials at read time ([[finish]]), because an average of averages
 *     is wrong under unequal batch sizes;
 *   - distinct counts are deliberately absent from the state: exact
 *     distinct is not mergeable. The engine's answer to that is the
 *     persisted-sketch rollup (`q_sketch_rollup`, HLL union), not a fake
 *     mergeable column here.
 *
 * Scale shape: [[partials]] over a batch is one map-side-combinable
 * aggregate of that batch alone; [[merge]] shuffles only view-grain rows
 * (days × event types — kilobytes at any fact size). The oracled query
 * wires base = partials(history), delta = partials(tail) from the same
 * corpus split at [[Cutoff]] and proves merged ≡ one-shot recompute under
 * the DuckDB hash gate; MvSpec additionally pins the fold lifecycle
 * (many small deltas, foreachBatch-shaped) and merge associativity.
 */
object MvQueries {

  /** History/tail boundary for the oracled wiring: the corpus spans
    * 2024-01-01..2024-01-30, so the base view holds ~2/3 of it. */
  val Cutoff = "2024-01-20 00:00:00"

  /** Mergeable partial-aggregate state of one batch at the
    * (event_date, event_type) view grain. Null `value`s are counted, not
    * summed (cents(null) is null → coalesce 0), so the derived average
    * divides by the non-null population exactly like AVG would. */
  def partials(e: DataFrame): DataFrame =
    e.groupBy(to_date(col("ts")).as("event_date"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").isNull.cast("long")).as("n_null_value"),
        sum(coalesce(Exact.cents(col("value")), lit(0L))).as("sum_cents"),
        max(col("ts")).as("max_ts"))

  /** Fold two partial states into one: addition for counts/sums, max for
    * maxes. Associative and commutative, so any batch arrival order and
    * any fold tree yield the same view (MvSpec pins it). */
  def merge(base: DataFrame, delta: DataFrame): DataFrame =
    base.unionByName(delta)
      .groupBy(col("event_date"), col("event_type"))
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("n_null_value")).as("n_null_value"),
        sum(col("sum_cents")).as("sum_cents"),
        max(col("max_ts")).as("max_ts"))

  /** Read-time finisher: the published average derives from the partials
    * (integer cents DIV non-null count — nonnegative on this corpus, where
    * Spark's truncating DIV and DuckDB's flooring // agree; all-null
    * groups publish NULL). */
  def finish(mv: DataFrame): DataFrame =
    mv.withColumn("avg_cents",
      when(col("n_events") > col("n_null_value"),
        expr("sum_cents DIV (n_events - n_null_value)")))

  /** The oracled wiring: base partials from events before [[Cutoff]],
    * delta partials from the tail, merged and finished. The oracle is the
    * ONE-SHOT recompute over all events — the hash gate is the proof that
    * the incremental path loses nothing. */
  def qMvMerge(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val cut = lit(Cutoff).cast("timestamp")
    finish(merge(
      partials(e.filter(col("ts") < cut)),
      partials(e.filter(col("ts") >= cut))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mv_merge" -> (qMvMerge _))

  private val nNull = "sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)"
  private val sumCents =
    s"sum(coalesce(${Exact.centsSql("value")}, 0))"

  val oracles: Map[String, String] = Map(
    // the one-shot recompute: if the incremental merge dropped, doubled,
    // or mis-bucketed anything, the hash gate catches it here (sums cast
    // back from HUGEINT so every published type is the Spark twin's)
    "q_mv_merge" ->
      s"""WITH m AS (
         |  SELECT CAST(ts AS DATE) AS event_date, event_type,
         |    count(*) AS n_events,
         |    CAST($nNull AS BIGINT) AS n_null_value,
         |    CAST($sumCents AS BIGINT) AS sum_cents,
         |    max(ts) AS max_ts
         |  FROM events GROUP BY 1, 2)
         |SELECT event_date, event_type, n_events, n_null_value, sum_cents,
         |  max_ts,
         |  CASE WHEN n_events > n_null_value
         |    THEN sum_cents // (n_events - n_null_value)
         |  END AS avg_cents
         |FROM m""".stripMargin)
}
