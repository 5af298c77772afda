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
}
