package graft.util

import org.apache.spark.sql.Dataset

/**
 * The one sanctioned driver-side collect for query paths (VERDICT r14
 * #7). Every `.collect()` inside a registered query's build is a
 * bounded model/centroid/codebook/deletion-list pull — dimension- or
 * config-sized driver state, never data-grain — and that invariant was
 * prose until now. This helper makes it mechanical: the pull states its
 * bound, the bound is ASSERTED against the actual row count (via a
 * limit(max+1) probe, so an unbounded frame never materializes on the
 * driver), and `CollectDisciplineSpec` fails the suite on any raw
 * `.collect()` in a query path outside this helper — adding an
 * unbounded collect to a query now names its site in red instead of
 * shipping.
 */
object Bounded {

  /** Collect `ds`, requiring at most `maxRows` rows. Fetches `maxRows+1`
    * rows, so a violating frame costs one extra row, not a driver OOM;
    * throws with the declared bound and the caller's `what` label. */
  def boundedCollect[T](ds: Dataset[T], maxRows: Int, what: String): Array[T] = {
    val rows = ds.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"boundedCollect($what): result exceeds the declared driver-side " +
        s"bound of $maxRows rows — this pull is no longer model-sized; " +
        "restructure the query so the frame stays distributed")
    rows
  }
}
