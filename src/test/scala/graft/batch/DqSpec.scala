package graft.batch

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Each constraint's violation count cross-checked against a direct
  * filter, and the verdict logic pinned. */
class DqSpec extends SparkSpec {

  test("q_dq_audit: violation counts match direct filters; verdicts consistent") {
    val out = DqQueries.qDqAudit(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet == Set(
      "completeness_event_id", "completeness_value", "uniqueness_event_id",
      "non_negative_value", "domain_event_type", "ts_in_window"))

    val e = Tables.events(spark, sf)
    val n = e.count()
    assert(out("completeness_event_id")._1 == e.filter(col("event_id").isNull).count())
    assert(out("completeness_value")._1 == e.filter(col("value").isNull).count())
    // mirror count(*) − count(DISTINCT event_id) exactly: countDistinct
    // excludes NULLs, while .distinct().count() would count NULL as one
    // distinct value and spuriously shift the assertion on a null-bearing
    // corpus
    assert(out("uniqueness_event_id")._1 ==
      n - e.filter(col("event_id").isNotNull)
        .select("event_id").distinct().count())
    assert(out("non_negative_value")._1 == e.filter(col("value") < 0).count())
    assert(out("ts_in_window")._1 == e.filter(col("ts").isNull ||
      col("ts") < lit(DqQueries.TsMin).cast("timestamp") ||
      col("ts") >= lit(DqQueries.TsMaxExcl).cast("timestamp")).count())

    // verdict logic: zero-tolerance checks pass iff violations == 0; the
    // ratio check applies its per-mille budget
    out.foreach { case (name, (v, passed)) =>
      if (name == "completeness_value")
        assert(passed == (v * 1000L <= n * DqQueries.ValueNullPerMille), name)
      else assert(passed == (v == 0L), name)
    }
    // this synthetic corpus carries no nulls, so every constraint passes —
    // the audit's job is to PROVE that, not assume it
    assert(out.values.forall(_._2), s"clean corpus must pass all checks: $out")
  }

  test("q_outliers equals a driver-side BigInt z-gate; counts bounded") {
    val rows = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"),
        graft.functions.Exact.cents(col("value")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).filter(_._1 != null).map { case (t, xs) =>
      val n = BigInt(xs.length); val s = xs.map(x => BigInt(x._2)).sum
      val q = xs.map(x => BigInt(x._2) * x._2).sum
      val k = BigInt(DqQueries.OutlierSigma * DqQueries.OutlierSigma)
      val out = xs.count { case (_, x) =>
        val lhs = n * x - s; lhs * lhs > k * (n * q - s * s) }
      (t, xs.length.toLong, out.toLong, 1000L * out / xs.length)
    }.toSeq.sortBy(_._1)
    val got = DqQueries.qOutliers(spark, sf).orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // a 3σ gate on any plausible distribution flags a small minority
    got.foreach { case (t, n, o, _) =>
      assert(o * 5 <= n, s"$t flagged $o of $n — gate inverted?") }
  }

  test("q_ref_integrity: clean corpus proves intact; orphans and null keys are caught") {
    import spark.implicits._
    val report = DqQueries.qRefIntegrity(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toMap
    assert(report.size == 8)
    // this synthetic corpus is referentially intact — the audit's job is
    // to PROVE that, not assume it; spot-check one edge's child count
    assert(report.values.forall(_._4), s"clean corpus must be intact: $report")
    assert(report("nation.n_regionkey->region")._1 ==
      Tables.nation(spark, sf).count())
    // and the edge kernel catches what the corpus cannot express
    val child = Seq(Some(1L), Some(2L), Some(99L), None).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val e = DqQueries.refEdge("t", child, "k", parent, "pk").collect().head
    assert((e.getLong(1), e.getLong(2), e.getLong(3), e.getBoolean(4)) ==
      ((4L, 1L, 1L, false)))
  }

  /** Driver-side lower median: the element at rank ⌊(n+1)/2⌋ (1-based) of
    * the sorted values — the q_mad_outliers rank rule. */
  private def lowerMedian(xs: Seq[Long]): Long = {
    val s = xs.sorted
    s(((s.length + 1) / 2) - 1)
  }

  test("q_mad_outliers equals a driver-side median/MAD gate") {
    val rows = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"),
        graft.functions.Exact.cents(col("value")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).map { case (t, txs) =>
      val xs = txs.map(_._2).toSeq
      val med = lowerMedian(xs)
      val devs = xs.map(x => math.abs(x - med))
      val mad = lowerMedian(devs)
      val out = devs.count(_ > DqQueries.MadK * mad)
      (t, xs.length.toLong, med, mad, out.toLong, 1000L * out / xs.length)
    }.toSeq.sortBy(_._1)
    val got = DqQueries.qMadOutliers(spark, sf).orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("q_mad_outliers_approx tracks the exact MAD gate within sketch tolerance") {
    // the q_approx_pctl discipline (VERDICT r13 #4): the sketch form's
    // correctness gate is a tolerance bound against the exact oracled
    // twin at the identical grain — rank error ≤ n/ApproxAcc means the
    // sketch median sits within a handful of sorted positions of the
    // exact one; 5% relative (small absolute floor for near-zero MADs)
    // is the same envelope SqlSurfaceSpec grants q_approx_pctl
    val exact = DqQueries.qMadOutliers(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val approx = DqQueries.qMadOutliersApprox(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (t, (n, med, mad, out)) =>
      val (en, emed, emad, eout) = exact(t)
      assert(n == en, s"$t: n_events must be exact")
      def close(a: Long, e: Long, what: String): Unit =
        assert(math.abs(a - e) <= math.max(0.05 * math.abs(e), 5.0),
          s"$t $what: approx $a vs exact $e")
      close(med, emed, "median_cents")
      close(mad, emad, "mad_cents")
      // a shifted threshold re-judges only the near-threshold band
      assert(math.abs(out - eout) <= math.max(0.02 * n, 5.0),
        s"$t n_outliers: approx $out vs exact $eout (n=$n)")
    }
  }

  test("median kernels window only contracted value-grain frames (VERDICT r12 #1)") {
    // lowerMedian's count-of-counts contraction: every WindowExec input
    // must be a (key, value)-grain aggregate, never raw event rows — the
    // pre-r13 form funneled n/|types| rows through each window task
    Seq("q_mad_outliers" -> DqQueries.qMadOutliers(spark, sf),
        "q_anomaly_days" -> DqQueries.qAnomalyDays(spark, sf)).foreach {
      case (n, df) =>
        val ws = df.queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
        assert(ws.nonEmpty, s"$n: median windows expected in the plan")
        ws.foreach(w => assert(graft.plans.PlanWalk.contracted(w.child),
          s"$n: Window over an uncontracted frame:\n$w"))
    }
  }

  test("madOutliers: MAD=0 flags every deviant; median gate survives the tail that masks 3σ") {
    import spark.implicits._
    // over half the type at one value ⇒ MAD = 0 ⇒ any deviation flags
    val constant = Seq.fill(6)(("a", 500L)) ++ Seq(("a", 501L), ("a", 9999L))
    val c = DqQueries.madOutliers(constant.toDF("event_type", "x")).collect().head
    assert(c.getLong(2) == 500L && c.getLong(3) == 0L && c.getLong(4) == 2L)
    // masking: one extreme point inflates σ until 3σ misses it less
    // aggressively than the MAD gate — the robust gate must flag the
    // spike that the moment gate (same data, qOutliers arithmetic) hides
    val masked = (1L to 20L).map(i => ("b", 100L + i)) :+ ("b", 100000000L)
    val mOut = DqQueries.madOutliers(masked.toDF("event_type", "x")).collect().head
    assert(mOut.getLong(4) >= 1L, s"MAD gate must catch the spike: $mOut")
  }

  test("q_anomaly_days equals a driver-side per-day median/MAD replay") {
    val counts = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val expected = counts.groupBy(_._1).flatMap { case (t, rows) =>
      val med = lowerMedian(rows.map(_._3).toSeq)
      val mad = lowerMedian(rows.map(r => math.abs(r._3 - med)).toSeq)
      rows.toSeq.map(r => (t, r._2, r._3, med, mad,
        math.abs(r._3 - med) > DqQueries.MadK * mad))
    }.toSet
    val got = DqQueries.qAnomalyDays(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSet
    assert(got == expected && got.nonEmpty)
    // the report covers every (type, day) cell exactly once
    assert(got.size == counts.length)
  }

  test("q_skew_metrics equals a driver-side frequency census; event_type reads more skewed") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id").cast("string"), col("event_type")).collect()
    def replay(keyCol: String, keys: Seq[String]) = {
      val freqs = keys.groupBy(identity).values.map(_.size.toLong).toSeq.sorted
      val nk = freqs.length
      def atRank(r: Long) = freqs((r - 1).toInt)
      (keyCol, keys.length.toLong, nk.toLong, freqs.max,
        atRank((nk + 1) / 2), atRank((nk * DqQueries.SkewPctl + 99) / 100),
        1000L * freqs.max / keys.length,
        1000L * atRank((nk * DqQueries.SkewPctl + 99) / 100) / atRank((nk + 1) / 2))
    }
    val expected = Set(
      replay("user_id", rows.map(_.getString(0)).toSeq),
      replay("event_type", rows.map(_.getString(1)).toSeq))
    val got = DqQueries.qSkewMetrics(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSet
    assert(got == expected)
    // the diagnostic discriminates: the 5-value event_type column is far
    // more concentrated than the diffuse user_id key
    val byCol = got.map(t => t._1 -> t._7).toMap
    assert(byCol("event_type") > byCol("user_id"))
  }

  test("drift monitor as a standing stream: folded micro-batch counts rescore to the batch TV") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    // reference window — the persisted artifact: its counts AND its
    // envelope are fixed; per-batch bounds would shift buckets and hide
    // the very drift being measured
    val refDf = (0L until 40L).map(i => ("a", i % 10 * 10, 1L))
      .toDF("event_type", "x", "is_ref")
    val bounds = refDf.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .localCheckpoint()
    val refCounts = DqQueries.driftCounts(refDf, bounds).localCheckpoint()
    // current feed: skewed to the top buckets, arriving in micro-batches
    val cur = (1L to 30L).map(i => ("a", 70L + (i % 3) * 10, 0L))
    var state = DqQueries.driftCounts(
      Seq.empty[(String, Long, Long)].toDF("event_type", "x", "is_ref"), bounds)
      .localCheckpoint()
    val ms = MemoryStream[(String, Long, Long)]
    val q = graft.stream.StreamPipeline.start(
      ms.toDS().toDF("event_type", "x", "is_ref"),
      graft.stream.StreamPipeline.ForeachBatch((batch, _) => {
        state = state.unionByName(DqQueries.driftCounts(batch, bounds))
          .groupBy(col("event_type"), col("bucket"))
          .agg(sum(col("o_ref")).as("o_ref"), sum(col("o_cur")).as("o_cur"))
          .localCheckpoint()
      }, trigger = Trigger.ProcessingTime(0L)))
    cur.grouped(10).foreach { chunk => ms.addData(chunk); q.processAllAvailable() }
    q.stop()
    // rescore the standing state against the reference counts
    val merged = state.unionByName(refCounts)
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("o_ref")).as("o_ref"), sum(col("o_cur")).as("o_cur"))
    val got = DqQueries.tvFromCounts(merged).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // the batch operator over the union sees the same global envelope
    // (cur values lie inside the reference's), so batch ≡ stream exactly
    val want = DqQueries.driftTv(refDf.unionByName(
        cur.toDF("event_type", "x", "is_ref"))).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want && got.head._4 > 0L,
      s"stream $got vs batch $want — and a skewed feed must score > 0")
  }

  test("driftTv: zero on identical windows, 1000 on disjoint support, driver parity on the corpus") {
    import spark.implicits._
    // identical ref/cur distributions ⇒ every bucket term is 0
    val same = (1L to 50L).flatMap(i =>
      Seq(("a", i % 7 * 100, 1L), ("a", i % 7 * 100, 0L)))
    val s = DqQueries.driftTv(same.toDF("event_type", "x", "is_ref")).collect().head
    assert(s.getLong(3) == 0L, s"identical windows must read 0: $s")
    // disjoint support (ref all-low, cur all-high) ⇒ TV = 1 ⇒ 1000 milli
    val disjoint = (1L to 30L).map(i => ("a", 0L + i % 3, 1L)) ++
      (1L to 20L).map(i => ("a", 100000L + i % 3, 0L))
    val dj = DqQueries.driftTv(disjoint.toDF("event_type", "x", "is_ref")).collect().head
    assert(dj.getLong(3) == 1000L, s"disjoint windows must read 1000: $dj")
    // corpus run agrees with a driver-side recompute of the same rule
    val rows = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), graft.functions.Exact.cents(col("value")).as("x"),
        (col("ts") < lit(DqQueries.DriftCutoff).cast("timestamp")).cast("long").as("r"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val lo = rows.map(_._2).min; val hi = rows.map(_._2).max
    val expected = rows.groupBy(_._1).map { case (t, txs) =>
      val bucket = (x: Long) => (x - lo) * DqQueries.DriftBuckets / (hi - lo + 1)
      val ref = txs.filter(_._3 == 1L); val cur = txs.filter(_._3 == 0L)
      val nr = BigInt(ref.length); val nc = BigInt(cur.length)
      val num = (0L until DqQueries.DriftBuckets).map { b =>
        val or = BigInt(ref.count(x => bucket(x._2) == b))
        val oc = BigInt(cur.count(x => bucket(x._2) == b))
        (oc * nr - or * nc).abs
      }.sum
      (t, nr.toLong, nc.toLong, (1000 * num / (2 * nr * nc)).toLong)
    }.toSeq.sortBy(_._1)
    val got = DqQueries.qDriftTv(spark, sf).orderBy("event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("observed: DQ counters ride the producing job and match direct counts") {
    val events = Tables.events(spark, sf)
    val (framed, obs) = DqQueries.observed(events)
    // ONE action drives both the "pipeline output" and the metrics
    val outRows = framed.count()
    val m = obs.get
    assert(m("n_rows") == outRows)
    assert(m("n_null_value") == events.filter(col("value").isNull).count())
    assert(m("n_neg_value") == events.filter(col("value") < 0).count())
    assert(m("n_null_id") == events.filter(col("event_id").isNull).count())
    // the counters mirror q_dq_audit's rules: same violation totals
    val audit = DqQueries.qDqAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("n_null_value") == audit("completeness_value"))
    assert(m("n_null_id") == audit("completeness_event_id"))
    assert(m("n_neg_value") == audit("non_negative_value"))
  }

  test("driftKs: boundary cases, KS <= TV on the corpus, same standing count state") {
    import spark.implicits._
    // identical ref/cur distributions ⇒ every cumulative gap is 0
    val same = (1L to 50L).flatMap(i =>
      Seq(("a", i % 7 * 100, 1L), ("a", i % 7 * 100, 0L)))
    val s = DqQueries.driftKs(same.toDF("event_type", "x", "is_ref")).collect().head
    assert(s.getLong(3) == 0L, s"identical windows must read 0: $s")
    // disjoint support ⇒ some bucket boundary separates the windows
    // completely ⇒ KS = 1 ⇒ 1000 milli
    val disjoint = (1L to 30L).map(i => ("a", 0L + i % 3, 1L)) ++
      (1L to 20L).map(i => ("a", 100000L + i % 3, 0L))
    val dj = DqQueries.driftKs(disjoint.toDF("event_type", "x", "is_ref")).collect().head
    assert(dj.getLong(3) == 1000L, s"disjoint windows must read 1000: $dj")
    // a pure location shift: KS sees the full gap where TV sees the same —
    // but on mixed corpus drift the mathematical ordering KS ≤ TV holds
    // per type (max partial sum of signed terms ≤ half the absolute sum;
    // integer floors can differ by at most the truncation, hence +1)
    val tv = DqQueries.qDriftTv(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val ks = DqQueries.qDriftKs(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ks.keySet == tv.keySet && ks.nonEmpty)
    ks.foreach { case (t, k) =>
      assert(k <= tv(t) + 1L, s"KS must be <= TV per type: $t ks=$k tv=${tv(t)}")
    }
    // both monitors score the SAME count frame: rescoring driftCounts
    // state matches the end-to-end operator (the standing-stream regime)
    val e = Tables.events(spark, sf).filter(col("value").isNotNull)
      .select(col("event_type"), graft.functions.Exact.cents(col("value")).as("x"),
        (col("ts") < lit(DqQueries.DriftCutoff).cast("timestamp")).cast("long").as("is_ref"))
    val counts = DqQueries.driftCounts(e,
      e.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))).localCheckpoint()
    val rescored = DqQueries.ksFromCounts(counts).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val direct = DqQueries.qDriftKs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rescored == direct)
  }
}
