package graft.batch

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Entry point 3 (the pandas-replacement daily job) end-to-end over a
  * synthetic streaming-output directory. */
class DailyBatchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val factDir = {
    val dir = Files.createTempDirectory("graft_facts").toString + "/facts"
    Seq(
      // (country, segment, total_amount, unique_events, event_date)
      ("IN", "starter",    100.0, 3L, "2024-01-01"),
      ("IN", "growth",     300.0, 2L, "2024-01-01"),
      ("IN", "enterprise", 200.0, 1L, "2024-01-01"),
      ("US", "starter",     50.0, 1L, "2024-01-01"),
      ("US", "growth",      70.0, 2L, "2024-01-01"),
      ("DE", "starter",     10.0, 1L, "2024-01-02")   // other day — filtered
    ).toDF("country", "segment", "total_amount", "unique_events", "event_date")
      .withColumn("event_date", $"event_date".cast("date"))
      .withColumn("max_event_time", $"event_date".cast("timestamp"))
      .write.partitionBy("country").parquet(dir)
    dir
  }

  test("summarize: day filter, rank, dim join, premium rollup") {
    val out = DailyBatch.summarize(spark, factDir, "2024-01-01").collect()
    // 2024-01-02 row excluded; rollup by (date,country,is_premium)
    assert(out.forall(_.getAs[java.sql.Date]("event_date").toString == "2024-01-01"))
    val in = out.filter(_.getAs[String]("country") == "IN")
    val inPremium = in.find(_.getAs[Boolean]("is_premium")).get
    assert(inPremium.getAs[Double]("total_revenue") == 500.0) // growth+enterprise
    val inFree = in.find(!_.getAs[Boolean]("is_premium")).get
    assert(inFree.getAs[Double]("total_revenue") == 100.0)
  }

  test("dailyRanked exposes the per-country revenue rank (reference's intermediate table)") {
    val ranked = DailyBatch.dailyRanked(spark, factDir, "2024-01-01").collect()
    val in = ranked.filter(_.getAs[String]("country") == "IN")
      .sortBy(_.getAs[Long]("revenue_rank_in_country"))
    assert(in.map(_.getAs[String]("segment")).toSeq ==
      Seq("growth", "enterprise", "starter"))     // 300 > 200 > 100
    assert(in.map(_.getAs[Long]("revenue_rank_in_country")).toSeq == Seq(1L, 2L, 3L))
  }

  test("run writes a single-file parquet summary and returns the row count") {
    val outDir = Files.createTempDirectory("graft_daily_out").toString
    val n = DailyBatch.run(spark, factDir, "2024-01-01", outDir)
    assert(n == 4) // (IN × 2 flags) + (US × 2 flags)
    val files = new java.io.File(s"$outDir/metrics_2024-01-01.parquet")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1, "K3 contract: one data file per run")
  }

  test("empty run date is a soft gate: writes 0 rows, does not throw (X2)") {
    val outDir = Files.createTempDirectory("graft_daily_empty").toString
    val n = DailyBatch.run(spark, factDir, "2030-12-31", outDir)
    assert(n == 0)
  }

  test("partition pruning: day filter only reads matching partitions") {
    val plan = DailyBatch.summarize(spark, factDir, "2024-01-01")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") || plan.contains("PartitionFilters"), plan)
  }
}
