package graft.batch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Engine-side invariants of the ANALYZE family (the DuckDB hash-compare
  * is the driver's t2 gate; these pin what the oracle can't see — plan
  * shape, bucket geometry, and agreement with independent recomputation). */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("stats_profile: NDV/min/max agree with independent per-column recomputation") {
    val rows = StatsQueries.qStatsProfile(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    assert(rows.values.forall(_.getAs[Long]("n_rows") == n))
    // spot-check three columns against a direct distinct/min/max pass
    val flagNdv = li.select(countDistinct(col("l_returnflag"))).head().getLong(0)
    assert(rows("l_returnflag").getAs[Long]("n_distinct") == flagNdv)
    val okMin = li.agg(min(col("l_orderkey"))).head().getLong(0)
    assert(rows("l_orderkey").getAs[String]("min_str") == okMin.toString)
    val shipMax = li.agg(max(date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss")))
      .head().getString(0)
    assert(rows("l_shipdate").getAs[String]("max_str") == shipMax)
    assert(rows.values.forall(_.getAs[Long]("n_null") == 0L))
  }

  test("stats_profile: single-scan plan (one aggregate, no join)") {
    val plan = StatsQueries.qStatsProfile(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"ANALYZE pass must not join:\n${plan.take(1500)}")
    assert("Scan parquet".r.findAllIn(plan).size == 1,
      s"expected exactly one scan:\n${plan.take(1500)}")
  }

  test("stats_histogram: buckets partition the row count with disjoint value envelopes") {
    val h = StatsQueries.qStatsHist(spark, sf)
      .orderBy(col("bucket")).collect()
    val n = Tables.lineitem(spark, sf).count()
    assert(h.map(_.getAs[Long]("n_rows")).sum == n)
    assert(h.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b < StatsQueries.HistBuckets })
    h.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_cents") < b.getAs[Long]("lo_cents"),
          s"equi-width envelopes overlap: bucket ${a.getAs[Long]("bucket")} hi " +
            s"${a.getAs[Long]("hi_cents")} vs next lo ${b.getAs[Long]("lo_cents")}")
      case _ => ()
    }
  }

  test("stats_histogram_depth: bucket sizes within 1 and envelopes never invert") {
    val h = StatsQueries.qStatsHistDepth(spark, sf)
      .orderBy(col("bucket")).collect()
    assert(h.length == StatsQueries.HistBuckets)
    val sizes = h.map(_.getAs[Long]("n_rows"))
    assert(sizes.max - sizes.min <= 1L,
      s"equi-depth sizes spread ${sizes.min}..${sizes.max}")
    val n = Tables.lineitem(spark, sf).count()
    assert(sizes.sum == n)
    h.sliding(2).foreach {
      case Array(a, b) =>
        // ties may make adjacent envelopes TOUCH, never invert
        assert(a.getAs[Long]("hi_cents") <= b.getAs[Long]("lo_cents"))
      case _ => ()
    }
  }

  test("stats_histogram_depth: plan has no partition-less window") {
    val plan = StatsQueries.qStatsHistDepth(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"global rank must use the two-phase kernel, not a window:\n${plan.take(1500)}")
  }

  test("stats_hist_eval: estimates equal a driver interpolation replay; error bounded on uniform-ish data") {
    import org.apache.spark.sql.functions._
    val xs = Tables.lineitem(spark, sf)
      .select(graft.functions.Exact.cents(col("l_extendedprice")))
      .as[Long].collect().sorted
    val (lo, hi) = (xs.head, xs.last); val r = hi - lo + 1
    val b = StatsQueries.HistBuckets
    val counts = xs.groupBy(x => (x - lo) * b / r).view.mapValues(_.length.toLong)
    def edge(k: Long) = (k * r + b - 1) / b
    val expected = StatsQueries.EvalFracs.map { f =>
      val oc = r * f / 1000
      val est = counts.toSeq.map { case (bk, nB) =>
        val (eLo, eHi) = (edge(bk), edge(bk + 1))
        nB * math.min(math.max(oc - eLo, 0L), eHi - eLo) / (eHi - eLo)
      }.sum
      val actual = xs.count(x => x - lo < oc).toLong
      (f, est, actual, 1000 * math.abs(est - actual) / math.max(actual, 1L))
    }.toSet
    val got = StatsQueries.qStatsHistEval(spark, sf).collect()
      .map(rw => (rw.getLong(0), rw.getLong(1), rw.getLong(2), rw.getLong(3))).toSet
    assert(got == expected)
    // estimates are monotone in the cutoff, and on this near-uniform
    // column the card certifies a tight estimator (within 10%)
    val byF = got.toSeq.sortBy(_._1)
    assert(byF.map(_._2) == byF.map(_._2).sorted)
    assert(byF.forall(_._4 <= 100L), s"estimator badly off: $byF")
  }

  test("q_weighted_median: equals a driver weighted-median sweep; differs from the row median") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        graft.functions.Exact.cents(col("l_extendedprice")),
        col("l_quantity").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (f, g) =>
      val total = g.map(_._3).sum
      var cum = 0L
      val med = g.map(t => (t._2, t._3)).groupBy(_._1).toSeq
        .map { case (v, ws) => (v, ws.map(_._2).sum) }.sortBy(_._1)
        .find { case (_, w) => cum += w; cum * 2 >= total }.get._1
      (f, total, med)
    }.toSet
    val got = StatsQueries.qWeightedMedian(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.nonEmpty)
    // sanity: the weighted median is a genuine value of the column
    val vals = rows.map(t => (t._1, t._2)).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    got.foreach { case (f, _, m) => assert(vals(f).contains(m)) }
  }

  test("q_weighted_median_bucketed: hash-equal to the one-window form; windows stay bucket-bounded") {
    // the at-scale twin must be EXACT — same rows, same values, no
    // tolerance (it shares q_weighted_median's DuckDB oracle verbatim)
    val exact = StatsQueries.qWeightedMedian(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    val bucketed = StatsQueries.qWeightedMedianBucketed(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    assert(bucketed == exact && bucketed.nonEmpty)
    // plan shape: the phase-A census window rides the (flag, bucket)
    // census Aggregate (contracted); the phase-B tail window reads the
    // checkpointed grain frame filtered to ONE bucket, which the
    // mechanical walk can't see through — WindowDisciplineSpec carries
    // its BoundedKeyWindowOk argument, and the census contraction is
    // what this asserts. Since r16 phase A is checkpointed (the
    // escalation decision and the tail share one execution), so the
    // assertion targets the exposed phase-A frame, whose plan the final
    // query's RDDScan leaf no longer shows.
    val ws = StatsQueries.wmedianCrossing(StatsQueries.wmedianGrain(spark, sf))
      .queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(ws.nonEmpty)
    assert(ws.exists(w => graft.plans.PlanWalk.contracted(w.child)),
      "bucketed median: the census window must ride the census Aggregate")
  }

  test("bucketed median: the tail window's input is a vanishing fraction of the grain (measured)") {
    // the BoundedKeyWindowOk argument, measured instead of asserted: only
    // grain rows inside each flag's crossing bucket reach the phase-B
    // window. Re-derive that row count independently and bound it against
    // the full grain — expected grain/4096, asserted ≤ grain/64 to leave
    // two orders of slack for value clustering before the suite complains
    // that the equi-width escalation (re-bucket inside the crossing
    // bucket) is due.
    import org.apache.spark.sql.expressions.Window
    val b = StatsQueries.MedianBuckets
    val grain = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("flag"),
        graft.functions.Exact.cents(col("l_extendedprice")).as("v"),
        col("l_quantity").cast("long").as("wt"))
      .groupBy(col("flag"), col("v")).agg(sum(col("wt")).as("w"))
      .localCheckpoint()
    val nGrain = grain.count()
    val bounds = grain.groupBy(col("flag"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val bucketed = grain.join(broadcast(bounds), "flag")
      .withColumn("bucket", expr(s"((v - lo) * $b) DIV (hi - lo + 1)"))
    val byFlag = Window.partitionBy("flag")
    val crossing = bucketed.groupBy(col("flag"), col("bucket"))
      .agg(sum(col("w")).as("bw"))
      .withColumn("cumw", sum(col("bw")).over(byFlag.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total_w", sum(col("bw")).over(byFlag))
      .filter(col("cumw") * 2 >= col("total_w"))
      .groupBy(col("flag")).agg(min(col("bucket")).as("cb"))
    val tailRows = bucketed.join(broadcast(crossing), "flag")
      .filter(col("bucket") === col("cb")).count()
    assert(tailRows > 0 && tailRows * 64 <= nGrain,
      s"tail window input $tailRows rows vs grain $nGrain — the crossing " +
        "bucket is no longer a contraction; re-bucket inside it")
  }

  test("bucketed median: adversarial value concentration takes the escalation path and stays exact") {
    // VERDICT r15 #5: equi-width's worst case — a value domain
    // concentrated inside one bucket's width (99 distinct cents in a
    // 100-cent span, envelope stretched by a single far outlier, so the
    // census puts ~all grain rows in one bucket). The one-level
    // re-bucket must fire AND the answer must equal the exact weighted
    // lower median.
    import spark.implicits._
    val rows = (0 until 99).map(i => ("A", 1000L + i, (i % 7 + 1).toLong)) :+
      (("A", 100000000L, 5L))
    val (df, escalated) = StatsQueries.bucketedMedianOver(rows.toDF("flag", "v", "w"))
    assert(escalated, "concentrated domain must trigger the cb re-bucket")
    val total = rows.map(_._3).sum
    var cum = 0L
    val med = rows.sortBy(_._2)
      .find { case (_, _, w) => cum += w; cum * 2 >= total }.get._2
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("A", total, med)))
    // a spread domain must NOT escalate — the fixture path stays the
    // cheap single-level plan
    val spread = (0 until 4096).map(i => ("A", i * 30L, 1L))
    assert(!StatsQueries.bucketedMedianOver(spread.toDF("flag", "v", "w"))._2)
  }
}
