package graft.batch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Semantics of the temporal/behavioral operators — each checked against an
  * independent (naively-joined) reference formulation at test scale. */
class TemporalSpec extends SparkSpec {

  test("q_funnel: monotone stage counts; counts match a per-stage join reference") {
    val out = TemporalQueries.qFunnel(spark, sf)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out.keySet == Set("view", "click", "purchase"))
    assert(out("view") >= out("click") && out("click") >= out("purchase"),
      s"funnel must be monotone: $out")
    assert(out("view") > 0 && out("purchase") > 0,
      "corpus must exercise every stage at test scale")

    // independent reference: explicit per-stage self-joins (the formulation
    // the windowed plan avoids paying at scale)
    val ev = Tables.events(spark, sf).select("user_id", "ts", "event_type")
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("fv"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("fv"))
      .groupBy("user_id").agg(min("ts").as("fc"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("fc"))
      .groupBy("user_id").agg(min("ts").as("fp"))
    assert(out("view") == v.count() && out("click") == c.count() &&
      out("purchase") == p.count())
  }

  test("q_retention: offset-0 diagonal is the cohort census; no negative offsets") {
    val out = TemporalQueries.qRetention(spark, sf)
    assert(out.filter(col("week_offset") < 0).count() == 0)
    val diag = out.filter(col("week_offset") === 0)
      .agg(sum("n_users")).head().getLong(0)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(diag == users, "every user appears exactly once at offset 0")
    // retention can never exceed its cohort size
    val over = out.alias("o")
      .join(out.filter(col("week_offset") === 0)
        .select(col("cohort_week"), col("n_users").as("size")), "cohort_week")
      .filter(col("n_users") > col("size"))
    assert(over.count() == 0)
  }

  test("q_scd2: intervals tile each user's history; current value = last event's k") {
    val out = TemporalQueries.qScd2(spark, sf)
    // exactly one open (current) interval per user
    val open = out.filter(col("is_current")).groupBy("user_id").count()
    assert(open.filter(col("count") =!= 1).count() == 0)
    // intervals chain: each row's valid_to equals the next row's valid_from
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("valid_from")
    val broken = out
      .withColumn("next_from", lead(col("valid_from"), 1).over(w))
      .filter(!(col("valid_to") <=> col("next_from")))
    assert(broken.count() == 0, "validity intervals must tile with no gaps")
    // consecutive versions always differ in value (null-safe)
    val sameRun = out
      .withColumn("next_k", lead(col("k"), 1).over(w))
      .withColumn("has_next", lead(col("valid_from"), 1).over(w).isNotNull)
      .filter(col("has_next") && (col("k") <=> col("next_k")))
    assert(sameRun.count() == 0, "consecutive duplicates must be collapsed")
    // the open interval's value is the user's last event value
    val last = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("k"))).as("m"))
      .select(col("user_id"), col("m.k").as("last_k"))
    val cur = out.filter(col("is_current")).select(col("user_id"), col("k"))
    assert(cur.join(last, "user_id").filter(!(col("k") <=> col("last_k"))).count() == 0)
  }

  test("q_gap_fill: dense per-nation grid, conserved totals, LOCF correctness") {
    val out = TemporalQueries.qGapFill(spark, sf)
    // grid is dense: rows per nation == span between its min and max day
    val span = out.groupBy("n_name")
      .agg(count(lit(1)).as("rows"),
        (datediff(max("day"), min("day")) + 1).as("expect"))
    assert(span.filter(col("rows") =!= col("expect")).count() == 0)
    // non-gap revenue reproduces the raw aggregate total (exact cents)
    val outTotal = out.filter(!col("is_gap"))
      .agg(sum(round(col("revenue") * 100).cast("long"))).head().getLong(0)
    val rawTotal = Tables.orders(spark, sf)
      .agg(sum(graft.functions.Exact.cents(col("o_totalprice")))).head().getLong(0)
    assert(outTotal == rawTotal)
    // gap rows: zero orders, zero revenue, LOCF equals the previous
    // non-gap day's revenue
    assert(out.filter(col("is_gap") &&
      (col("n_orders") =!= 0 || col("revenue") =!= 0.0)).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("n_name").orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val locfRef = out
      .withColumn("prev_locf", last(when(!col("is_gap"), col("revenue")),
        ignoreNulls = true).over(w))
      .filter(col("is_gap") && !(col("locf_revenue") <=> col("prev_locf")))
    assert(locfRef.count() == 0)
  }

  test("q_transitions: step conservation, row-stochastic rows, driver-checked dwell") {
    val out = TemporalQueries.qTransitions(spark, sf).collect()
    assert(out.nonEmpty)
    // conservation: total steps = events minus one per multi-event user
    val ev = Tables.events(spark, sf)
    val users = ev.groupBy("user_id").count()
    val expectSteps = users.agg(sum(col("count") - 1)).head().getLong(0)
    assert(out.map(_.getAs[Long]("n")).sum == expectSteps)
    // each prev_type row is (nearly) stochastic: milli probs sum within
    // the floor loss of its fan-out
    out.groupBy(_.getAs[String]("prev_type")).foreach { case (_, rows) =>
      val s = rows.map(_.getAs[Long]("prob_milli")).sum
      assert(s <= 1000L && s > 1000L - rows.length, s"row sum $s")
    }
    // dwell arithmetic, recomputed driver-side for one transition cell
    // (micros from the full nanos field — getTime alone truncates to ms)
    def micros(t: java.sql.Timestamp): Long =
      t.getTime / 1000 * 1000000L + t.getNanos / 1000
    val driver = ev.select("user_id", "ts", "event_id", "event_type")
      .collect()
      .groupBy(_.getLong(0)).values.flatMap { es =>
        es.sortBy(r => (micros(r.getTimestamp(1)), r.getLong(2)))
          .sliding(2).collect { case Array(a, b) =>
            ((a.getString(3), b.getString(3)),
              micros(b.getTimestamp(1)) - micros(a.getTimestamp(1)))
          }
      }.toSeq
    val cell = out.head
    val key = (cell.getAs[String]("prev_type"), cell.getAs[String]("next_type"))
    val gaps = driver.filter(_._1 == key).map(_._2)
    assert(cell.getAs[Long]("n") == gaps.length.toLong)
    assert(cell.getAs[Long]("gap_total_us") == gaps.sum)
    assert(cell.getAs[Long]("mean_gap_us") == gaps.sum / gaps.length)
  }

  test("q_pit_features: exactly one version per purchase; never a future version") {
    val out = TemporalQueries.qPitFeatures(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        Option(r.getTimestamp(3))))
    val nPurch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    // grain preserved: the tiling guarantees exactly one match per event
    assert(out.length.toLong == nPurch && out.nonEmpty)
    assert(out.map(_._1).distinct.length == out.length, "a purchase matched two versions")
    assert(out.forall(_._3.isDefined), "every purchase has a valid version (tiling)")
    // PIT correctness: the joined version is the one a driver as-of scan picks
    val scd2 = TemporalQueries.qScd2(spark, sf).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3))))
    val byUser = scd2.groupBy(_._1)
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val expect = purchases.map { case (eid, u, ts) =>
      val v = byUser(u).filter(iv => !iv._3.after(ts) &&
        iv._4.forall(to => ts.before(to)))
      assert(v.length == 1, s"event $eid matched ${v.length} versions")
      (eid, u, v.head._2, Some(v.head._3))
    }.toSet
    assert(out.toSet == expect)
  }

  test("q_event_trigrams: step conservation against transitions; conditional rows sum to 1000-ish") {
    val tri = TemporalQueries.qEventTrigrams(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getString(2)),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(tri.nonEmpty)
    // conservation: trigram counts collapsed over t1 equal the transition
    // counts restricted to users with >= 3 events... the cheap exact form:
    // total trigram steps = total events - 2 * users with >= 3 events
    // (every user contributes max(n_u - 2, 0) trigrams)
    val perUser = Tables.events(spark, sf).groupBy("user_id").count()
      .collect().map(_.getLong(1))
    val expectedSteps = perUser.map(n => math.max(n - 2L, 0L)).sum
    assert(tri.map(_._2).sum == expectedSteps)
    // prefix totals: per (t1, t2), rows share the total and counts sum to it
    tri.groupBy(t => (t._1._1, t._1._2)).foreach { case (p, rows) =>
      val tot = rows.head._3
      assert(rows.forall(_._3 == tot), s"prefix $p totals disagree")
      assert(rows.map(_._2).sum == tot, s"prefix $p counts don't sum")
      // floored probabilities sum to within |rows| of 1000
      val probSum = rows.map(_._4).sum
      assert(probSum <= 1000 && probSum > 1000 - rows.length, s"prefix $p prob sum $probSum")
    }
  }

  test("q_interval_coverage: equals a driver-side interval merge; abutting windows fuse") {
    val w = TemporalQueries.IntervalDays.toLong
    // driver replay: sort starts, sweep with a running max end
    def merge(starts: Seq[Long]): (Long, Long, Long) = { // (islands, covered, maxIsland)
      var islands = 0L; var covered = 0L; var maxIsl = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      starts.sorted.foreach { s =>
        if (s > curE || islands == 0L) {
          if (islands > 0L) { covered += curE - curS; maxIsl = maxIsl.max(curE - curS) }
          islands += 1L; curS = s; curE = s + w
        } else curE = curE.max(s + w)
      }
      if (islands > 0L) { covered += curE - curS; maxIsl = maxIsl.max(curE - curS) }
      (islands, covered, maxIsl)
    }
    val byCust = Tables.orders(spark, sf)
      .select(col("o_custkey"), datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val expected = byCust.map { case (ck, starts) =>
      val (isl, cov, mx) = merge(starts)
      (ck, starts.length.toLong, isl, cov, mx)
    }.toSet
    val got = TemporalQueries.qIntervalCoverage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected && got.nonEmpty)
    // both behaviors occur on the corpus: some customers merge orders
    // into fewer islands, some have every order isolated
    assert(got.exists(t => t._3 < t._2) && got.exists(t => t._3 == t._2))
    // the union never exceeds the naive sum (double-counting bound) and
    // reaches it exactly when no orders merged
    got.foreach { case (ck, n, isl, cov, mx) =>
      assert(cov <= n * w, s"cust $ck covered $cov > naive ${n * w}")
      // islands == orders ⇔ nothing merged ⇔ coverage is exactly naive
      if (isl == n) assert(cov == n * w, s"cust $ck isolated islands")
      assert(mx >= w && cov >= w, s"cust $ck bounds")
    }
  }
}
