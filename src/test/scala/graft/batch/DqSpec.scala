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
}
