package graft.batch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Exact
import graft.sources.Tables

/** Window-frame semantics — the RANGE frame checked against an explicit
  * range self-join reference, the distribution functions against their
  * defining invariants. */
class FrameSpec extends SparkSpec {

  test("q_rolling_7d: RANGE frame equals the explicit range-join reference") {
    val out = FrameQueries.qRolling7d(spark, sf)
      .select(col("n_name"), col("day"),
        Exact.cents(col("revenue_7d")).as("rev7_cents"), col("orders_7d"))

    // independent reference: re-aggregate daily, then an explicit banded
    // self-join over the 7-day range (the O(n·w) formulation the frame
    // avoids paying)
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
    val nat = Tables.nation(spark, sf).select("n_nationkey", "n_name")
    val daily = Tables.orders(spark, sf)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(nat, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderdate").cast("date").as("day"))
      .agg(sum(Exact.cents(col("o_totalprice"))).as("rev_cents"),
        count(lit(1)).as("n_orders"))
    val ref = daily.alias("a")
      .join(daily.alias("b"),
        col("a.n_name") === col("b.n_name") &&
          col("b.day") >= date_sub(col("a.day"), 6) &&
          col("b.day") <= col("a.day"))
      .groupBy(col("a.n_name").as("n_name"), col("a.day").as("day"))
      .agg(sum(col("b.rev_cents")).as("rev7_cents"),
        sum(col("b.n_orders")).as("orders_7d"))

    assert(out.count() == daily.count(), "one output row per (nation, day)")
    assert(out.except(ref).isEmpty && ref.except(out).isEmpty,
      "RANGE-frame trailing sums must equal the explicit range join")
  }

  test("q_rolling_7d: ROWS frame averages at most 3 observations") {
    val out = FrameQueries.qRolling7d(spark, sf)
    // a trailing-3-row mean can never exceed 3× nor undercut 1/3 of the
    // largest/smallest single day in its nation — weak but formulation-free;
    // the strong check: first row of each nation has avg == its own revenue
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("n_name").orderBy("day")
    val first = out.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val bad = first.filter(
      abs(col("revenue_3obs_avg") - col("revenue")) > lit(1e-9))
    assert(bad.count() == 0, "a partition's first row averages only itself")
  }

  test("q_rolling_7d: both frames evaluate in ONE Window node (plan guard)") {
    val q = FrameQueries.qRolling7d(spark, sf)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val windows = "\\bWindow\\b".r.findAllIn(plan).length
    assert(windows == 1,
      s"RANGE and ROWS frames share one sort — expected 1 Window node, got $windows:\n$plan")
  }

  test("q_pareto: deciles tile customers; cumulative share monotone to 1.0") {
    val out = FrameQueries.qPareto(spark, sf).orderBy("decile").collect()
    assert(out.map(_.getLong(0)).toSeq == (1L to FrameQueries.ParetoDeciles).toSeq)
    val sizes = out.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, "ntile decile sizes differ by ≤1")
    assert(sizes.sum == Tables.orders(spark, sf).select("o_custkey").distinct().count())
    val shares = out.map(_.getDouble(4))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      "cumulative share is monotone")
    assert(math.abs(shares.last - 1.0) < 1e-12, "last decile closes at 100%")
    assert(shares.head >= 1.0 / FrameQueries.ParetoDeciles,
      "the top decile carries at least its uniform share")
    // decile revenues sum to the grand total the shares are measured against
    val sumDeciles = out.map(_.getDouble(2)).sum
    val cumLast = out.last.getDouble(3)
    assert(math.abs(sumDeciles - cumLast) < 1e-6)
  }

  test("q_pareto: two-phase rank kernel equals the naive global-window formulation") {
    // the r12 rewrite: decile/cum/total via DistributedRank + a 10-row
    // decile window, replacing the corpus-sized Window.orderBy sort. Pin
    // bit-identity against the naive window form it replaced (sf0.01 — a
    // frame large enough that a rank or prefix-sum off-by-one shows).
    val sf01 = "/root/testdata/sf0.01"
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cents").desc, col("o_custkey"))
    val run = w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val naive = Tables.orders(spark, sf01)
      .groupBy(col("o_custkey"))
      .agg(sum(Exact.cents(col("o_totalprice"))).as("cents"))
      .withColumn("decile", ntile(FrameQueries.ParetoDeciles).over(w).cast("long"))
      .withColumn("cum_cents", sum(col("cents")).over(run))
      .withColumn("total_cents", sum(col("cents")).over(all))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_custs"),
        (sum(col("cents")) / lit(100.0)).as("decile_revenue"),
        (max(col("cum_cents")) / lit(100.0)).as("cum_revenue"),
        (max(col("cum_cents")).cast("double") / max(col("total_cents"))).as("cum_share"))
    val kernel = FrameQueries.qPareto(spark, sf01)
    assert(kernel.except(naive).isEmpty && naive.except(kernel).isEmpty,
      "kernel deciles must equal the naive window formulation bit-for-bit")
  }

  test("q_ntile_custs: two-phase rank kernel equals the naive per-segment window") {
    val sf01 = "/root/testdata/sf0.01"
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("segment").orderBy(col("rev_cents").desc, col("custkey"))
    val naive = Tables.orders(spark, sf01)
      .groupBy(col("o_custkey"))
      .agg(sum(Exact.cents(col("o_totalprice"))).as("rev_cents"))
      .join(Tables.customer(spark, sf01).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey").as("custkey"), col("c_mktsegment").as("segment"),
        col("rev_cents"))
      .withColumn("quartile", ntile(FrameQueries.NtileBuckets).over(w).cast("long"))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .select(col("custkey"), col("segment"),
        (col("rev_cents") / lit(100.0)).as("revenue"),
        col("quartile"), col("pct_rank"), col("cume"))
    val kernel = FrameQueries.qNtileCusts(spark, sf01)
    assert(kernel.except(naive).isEmpty && naive.except(kernel).isEmpty,
      "kernel ntile/percent_rank/cume_dist must equal the naive window bit-for-bit")
  }

  test("q_ntile_custs: bucket sizes within 1; quartile monotone in revenue rank") {
    val out = FrameQueries.qNtileCusts(spark, sf)
    val sizes = out.groupBy("segment", "quartile").count()
      .groupBy("segment").agg((max("count") - min("count")).as("spread"),
        countDistinct("quartile").as("nq"))
      .collect()
    assert(sizes.nonEmpty)
    sizes.foreach { r =>
      assert(r.getAs[Long]("spread") <= 1, s"ntile sizes must differ by ≤1: $r")
      assert(r.getAs[Long]("nq") == FrameQueries.NtileBuckets.toLong)
    }
    // quartile, pct_rank and cume are all monotone in the window order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("segment").orderBy(col("revenue").desc, col("custkey"))
    val chk = out
      .withColumn("pq", lag(col("quartile"), 1).over(w))
      .withColumn("pp", lag(col("pct_rank"), 1).over(w))
      .withColumn("pc", lag(col("cume"), 1).over(w))
      .filter(col("pq").isNotNull &&
        (col("quartile") < col("pq") || col("pct_rank") < col("pp") ||
          col("cume") < col("pc")))
    assert(chk.count() == 0)
    // distribution bounds
    assert(out.filter(col("pct_rank") < 0 || col("pct_rank") > 1 ||
      col("cume") <= 0 || col("cume") > 1).count() == 0)
  }
}
