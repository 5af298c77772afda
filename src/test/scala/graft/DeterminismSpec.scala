package graft

/**
 * Meta-test for the whole query registry: every query must return the
 * identical result set under different shuffle-partition counts. Partial
 * aggregation order, shuffle placement, and window-partition planning all
 * change with parallelism — a query that survives this is safe against the
 * driver's hash-compare gate at any cluster size; one that doesn't has an
 * unbroken tie or an order-dependent float somewhere.
 */
class DeterminismSpec extends SparkSpec {

  test("every registered query is invariant to shuffle parallelism and AQE (4/AQE-on vs 7/AQE-off)") {
    // sf0.01, not the smoke tier: more rows ⇒ more groups whose unbroken
    // ties or order-dependent floats would actually collide
    val dir = "/root/testdata/sf0.01"
    // Exempt: lossy-sketch aggregates whose MERGE is partition-order
    // dependent by construction. approx_percentile's summaries stay exact
    // below `accuracy` values per group (so it would pass HERE), but the
    // invariant stops holding the moment a group crosses the sketch's
    // compression threshold — exempting it outright keeps a future
    // scale-factor bump from reading as a correctness regression. (HLL's
    // q_approx_distinct stays IN: its merge is deterministic.) The
    // exempted query's correctness gate is its tolerance spec instead.
    val sketchExempt = Set("q_approx_pctl", "q_mad_outliers_approx",
      "q_len_quantiles_approx")
    val failures = (SparkEntry.queries ++ SparkEntry.specOnly).toSeq.sortBy(_._1)
      .filterNot(q => sketchExempt(q._1)).flatMap { case (name, fn) =>
      // the second pass also disables AQE, so runtime re-planning
      // (coalesced partitions, demoted broadcasts, skew splits) is pinned
      // as result-invariant in the same two passes — two variation axes
      // for the price of one extra run
      def run(parts: String, aqe: String): Seq[String] = {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        try fn(spark, dir).collect().map(_.toString).sorted.toSeq
        finally {
          spark.conf.set("spark.sql.shuffle.partitions", "4")
          spark.conf.set("spark.sql.adaptive.enabled", "true")
        }
      }
      val a = run("4", "true")
      val b = run("7", "false")
      if (a == b) None
      else Some(s"$name: ${a.size} vs ${b.size} rows, first diff: " +
        a.zip(b).find { case (x, y) => x != y }.orElse(Some((a.length.toString, b.length.toString))))
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
