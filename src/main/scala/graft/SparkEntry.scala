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
    val fact = etl.EventsQueries.qEnrich(spark, dir)
      .withColumnRenamed("ts", "event_time")
      .withColumn("country", coalesce(col("nation"), lit("UNKNOWN")))
    // the same aggregate/flatten stages as the pipeline (watermark is a
    // no-op on batch input) — no inline re-implementation to drift
    etl.RefPipeline.flatten(etl.RefPipeline.aggregate(fact))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    etl.EventsQueries.queries ++
      batch.AnalyticsQueries.queries ++
      batch.TpchBreadthQueries.queries ++
      batch.SqlSurfaceQueries.queries ++
      batch.TemporalQueries.queries ++
      batch.FrameQueries.queries ++
      batch.CdcQueries.queries ++
      batch.MvQueries.queries ++
      batch.PrivacyQueries.queries ++
      batch.DqQueries.queries ++
      batch.BasketQueries.queries ++
      batch.StatsQueries.queries ++
      batch.LayoutQueries.queries ++
      batch.SketchQueries.queries ++
      ext.text.TextQueries.queries ++
      ext.text.DsirQueries.queries ++
      ext.text.CmSketchQueries.queries ++
      ext.dedup.DedupQueries.queries ++
      ext.dedup.KMinHashQueries.queries ++
      ext.sim.SimQueries.queries ++
      ext.sim.PqQueries.queries ++
      ext.sim.AlignQueries.queries ++
      ext.multimodal.Multimodal.queries ++
      ext.graph.GraphQueries.queries ++
      ext.er.ErQueries.queries ++
      ext.pipeline.CurateQueries.queries

  /** Sketch queries whose outputs cannot hash-match a foreign engine by
    * design (SURVEY §5.2) — registered here instead of [[queries]] so the
    * driver's correctness file carries only oracle-gated rows. Each is
    * tolerance-bounded in ScalaTest against an oracled exact twin at the
    * identical grain (q_exact_distinct / q_percentiles / q_sketch_exact),
    * and DeterminismSpec still covers the deterministic ones. */
  def specOnly: Map[String, (SparkSession, String) => DataFrame] =
    etl.EventsQueries.specOnly ++
      batch.SqlSurfaceQueries.specOnly ++
      batch.DqQueries.specOnly ++
      ext.pipeline.CurateQueries.specOnly

  def oracleSql: Map[String, String] =
    etl.EventsQueries.oracles ++
      batch.AnalyticsQueries.oracles ++
      batch.TpchBreadthQueries.oracles ++
      batch.SqlSurfaceQueries.oracles ++
      batch.TemporalQueries.oracles ++
      batch.FrameQueries.oracles ++
      batch.CdcQueries.oracles ++
      batch.MvQueries.oracles ++
      batch.PrivacyQueries.oracles ++
      batch.DqQueries.oracles ++
      batch.BasketQueries.oracles ++
      batch.StatsQueries.oracles ++
      batch.LayoutQueries.oracles ++
      batch.SketchQueries.oracles ++
      ext.text.TextQueries.oracles ++
      ext.text.DsirQueries.oracles ++
      ext.text.CmSketchQueries.oracles ++
      ext.dedup.DedupQueries.oracles ++
      ext.dedup.KMinHashQueries.oracles ++
      ext.sim.SimQueries.oracles ++
      ext.sim.PqQueries.oracles ++
      ext.sim.AlignQueries.oracles ++
      ext.multimodal.Multimodal.oracles ++
      ext.graph.GraphQueries.oracles ++
      ext.er.ErQueries.oracles ++
      ext.pipeline.CurateQueries.oracles
}
