package graft.batch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Semantics of the newer SQL-surface operators: as-of join and cube. */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("q_asof_order attaches the latest order at-or-before each event, null when none") {
    val out = SqlSurfaceQueries.qAsofOrder(spark, sf)
    val events = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    assert(out.count() == events.count(), "left semantics: one row per event")

    // independent reference: plain range join + max_by (fine at test scale)
    val ord = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(struct(col("o_orderkey"), col("o_totalprice"))).as("o"))
      .select(col("o_custkey"), col("o_orderdate"),
        col("o.o_orderkey").as("ok"), col("o.o_totalprice").as("tp"))
    val ref = events.join(ord,
        col("user_id") === col("o_custkey") && col("o_orderdate") <= col("ts"), "left")
      .groupBy(col("event_id"))
      .agg(max(struct(col("o_orderdate"), col("ok"), col("tp"))).as("best"))
      .select(col("event_id"), col("best.ok").as("o_orderkey"),
        col("best.tp").as("o_totalprice"))
    val mismatches = out.select("event_id", "o_orderkey", "o_totalprice")
      .join(ref, "event_id")
      .filter(!(out("o_orderkey") <=> ref("o_orderkey")) ||
        !(out("o_totalprice") <=> ref("o_totalprice")))
      .count()
    assert(mismatches == 0)
    assert(out.filter(col("o_orderkey").isNull).count() ==
      ref.filter(col("o_orderkey").isNull).count())
  }

  test("q_range_join (banded equi-join) ≡ naive theta range join") {
    val out = SqlSurfaceQueries.qRangeJoin(spark, sf)
    val orders = Tables.orders(spark, sf)
    assert(out.count() == orders.count(), "every order keeps a row, zero-count included")
    val a = orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val b = orders.select(col("o_orderkey").as("bk"), col("o_custkey").as("bc"),
      col("o_orderdate").as("bd"))
    val naive = a.join(b,
        col("o_custkey") === col("bc") && col("bk") =!= col("o_orderkey") &&
          col("bd") >= col("o_orderdate") - expr("INTERVAL 30 DAYS") &&
          col("bd") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"), "left")
      .groupBy(col("o_orderkey"))
      .agg(count(col("bk")).as("n_naive"))
    val mismatch = out.join(naive, "o_orderkey")
      .filter(col("n_nearby_orders") =!= col("n_naive")).count()
    assert(mismatch == 0)
    assert(out.agg(sum("n_nearby_orders")).head().getLong(0) > 0,
      "corpus must exercise non-zero windows")
  }

  test("approx_percentile tracks exact percentiles within tolerance per group") {
    val exact = SqlSurfaceQueries.qPercentiles(spark, sf)
      .select("event_type", "p50", "p95").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = SqlSurfaceQueries.qApproxPercentiles(spark, sf)
      .select("event_type", "p50", "p95").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, (a50, a95)) =>
      val (e50, e95) = exact(k)
      // 10k-accuracy sketch on sf-scale groups should be near-exact; allow
      // 5% relative (or small absolute for near-zero percentiles)
      assert(math.abs(a50 - e50) <= math.max(0.05 * math.abs(e50), 0.5),
        s"$k p50: approx $a50 vs exact $e50")
      assert(math.abs(a95 - e95) <= math.max(0.05 * math.abs(e95), 0.5),
        s"$k p95: approx $a95 vs exact $e95")
    }
  }

  test("q_sketch_rollup: merged daily sketches track exact weekly distincts") {
    val weekCol = floor(
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date")) / lit(7.0))
      .cast("long")
    val exact = Tables.events(spark, sf)
      .groupBy(weekCol.as("week"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val out = SqlSurfaceQueries.qSketchRollup(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.keySet == exact.keySet, "one row per week")
    out.foreach { case (w, (approx, nEvents)) =>
      val (e, en) = exact(w)
      assert(nEvents == en, s"week $w: event counts are exact")
      assert(math.abs(approx - e) <= math.max(0.05 * e, 2.0),
        s"week $w: sketch estimate $approx vs exact $e")
    }
    // union of daily sketches ≡ sketching the week directly — the property
    // that makes the persisted daily layer sufficient for ANY rollup
    val direct = Tables.events(spark, sf)
      .groupBy(weekCol.as("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("direct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (w, (merged, _)) =>
      assert(math.abs(merged - direct(w)) <= math.max(0.01 * direct(w), 1.0),
        s"week $w: merged $merged vs direct ${direct(w)}")
    }
  }

  test("q_unpivot melts each wide row into one row per metric") {
    val wide = Tables.lineitem(spark, sf).select("l_returnflag").distinct().count()
    val long = SqlSurfaceQueries.qUnpivot(spark, sf)
    assert(long.count() == wide * 3, "3 metric rows per flag")
    assert(long.select("metric").distinct().count() == 3)
    // melt preserves values: n_lines rows sum to the table's row count
    val n = long.filter(col("metric") === "n_lines")
      .agg(sum("value")).head().getLong(0)
    assert(n == Tables.lineitem(spark, sf).count())
  }

  test("q_cube_events emits all four grouping combinations consistently") {
    val cube = SqlSurfaceQueries.qCubeEvents(spark, sf).cache()
    val byBoth = cube.filter(col("event_type").isNotNull && col("event_date").isNotNull)
    val byType = cube.filter(col("event_type").isNotNull && col("event_date").isNull)
    val byDate = cube.filter(col("event_type").isNull && col("event_date").isNotNull)
    val grand = cube.filter(col("event_type").isNull && col("event_date").isNull)
    assert(grand.count() == 1)
    val total = Tables.events(spark, sf).count()
    assert(grand.head().getAs[Long]("n_events") == total)
    assert(byType.agg(sum("n_events")).head().getLong(0) == total)
    assert(byDate.agg(sum("n_events")).head().getLong(0) == total)
    assert(byBoth.agg(sum("n_events")).head().getLong(0) == total)
    cube.unpersist()
  }

  test("native session_window ≡ gaps-and-islands sessionization (starts, counts, values)") {
    // identical except at the exact-gap boundary (measure-zero on
    // micro-precision timestamps): same sessions, same membership
    val native = SqlSurfaceQueries.qSessionNative(spark, sf)
      .select($"user_id", $"session_start", $"n_events", $"total_value")
      .collect().map(_.toString).sorted.toSeq
    val islands = SqlSurfaceQueries.qSessionize(spark, sf)
      .select($"user_id", $"session_start", $"n_events", $"total_value")
      .collect().map(_.toString).sorted.toSeq
    assert(native.nonEmpty && native == islands)
    // native window end = last event + gap ⇒ strictly after start
    val bad = SqlSurfaceQueries.qSessionNative(spark, sf)
      .filter($"session_end" <= $"session_start").count()
    assert(bad == 0)
  }

  test("q_profile_stats: integer-moment statistics track Spark's float built-ins") {
    val mine = SqlSurfaceQueries.qProfileStats(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    // reference: the float aggregates over the SAME integer-unit inputs
    val ref = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        floor(col("l_quantity") + lit(0.5)).cast("long").as("q"),
        graft.functions.Exact.fixed(col("l_discount"), 1000).as("d"))
      .groupBy("l_returnflag")
      .agg(avg("q").as("m"), stddev_samp(col("q").cast("double")).as("s"),
        corr(col("q").cast("double"), col("d").cast("double")).as("c"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(mine.keySet == ref.keySet && mine.nonEmpty)
    mine.foreach { case (k, r) =>
      assert(math.abs(r.getAs[Double]("mean_qty") - ref(k).getAs[Double]("m")) < 1e-9)
      assert(math.abs(r.getAs[Double]("stddev_qty") - ref(k).getAs[Double]("s")) < 1e-6)
      assert(math.abs(r.getAs[Double]("corr_qty_disc") - ref(k).getAs[Double]("c")) < 1e-6)
      // discount is independent of quantity in the generator — the corr is
      // near zero but must still be a real, finite number
      assert(!r.getAs[Double]("corr_qty_disc").isNaN)
    }
  }
}
