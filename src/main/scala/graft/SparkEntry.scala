package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Driver contract (see SURVEY.md §7 and Verify/Bench):
 *  - [[entry]]: flagship pipeline on sf0.001, smoke-checked rows>0;
 *  - [[queries]]: one entry per implemented operator (SURVEY §2 + extensions);
 *  - [[oracleSql]]: DuckDB twin per query (omitted ⇒ rows-only check).
 *
 * Queries live next to their implementations; this object only aggregates
 * the per-module registries.
 */
object SparkEntry {

  /** Flagship: the reference's streaming pipeline run batch-mode over the
    * sf0.001 events table — clean → enrich → sliding-window aggregate →
    * flatten (SURVEY §7.3). */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val enriched = etl.EventsQueries.qEnrich(spark, dir)
    etl.RefPipeline.flatten(
      enriched
        .withColumnRenamed("ts", "event_time")
        .withColumn("country", coalesce(col("nation"), lit("UNKNOWN")))
        .groupBy(window(col("event_time"), "1 minute", "30 seconds"),
          col("country"), col("segment"))
        .agg(
          sum(col("amount")).as("total_amount"),
          approx_count_distinct(col("event_id")).as("unique_events"),
          max(col("event_time")).as("max_event_time")))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    etl.EventsQueries.queries ++
      batch.AnalyticsQueries.queries ++
      batch.SqlSurfaceQueries.queries ++
      ext.text.TextQueries.queries ++
      ext.dedup.DedupQueries.queries ++
      ext.sim.SimQueries.queries ++
      ext.multimodal.Multimodal.queries ++
      ext.pipeline.CurateQueries.queries

  def oracleSql: Map[String, String] =
    etl.EventsQueries.oracles ++
      batch.AnalyticsQueries.oracles ++
      batch.SqlSurfaceQueries.oracles ++
      ext.text.TextQueries.oracles ++
      ext.dedup.DedupQueries.oracles ++
      ext.sim.SimQueries.oracles ++
      ext.multimodal.Multimodal.oracles ++
      ext.pipeline.CurateQueries.oracles
}
