package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, LogicalPlan, Window => LogicalWindow}

import graft.SparkSpec

/**
 * Suite-wide enforcement of the broadcast-scalar / two-phase-rank
 * discipline (VERDICT r11 ask #6): a `Window` with an EMPTY partition
 * spec moves its whole input through ONE task, so it is only admissible
 * when that input is provably bounded — below a limit-K, or an aggregate
 * whose key space is bounded by construction. Every registered query's
 * optimized plan is swept; a partition-less window anywhere else fails
 * this spec, so the q11/q15/q22 class of scale-killer (fixed in r12)
 * cannot regress silently.
 *
 * Two admissibility routes:
 *  - automatic: the window's child subtree contains a Limit — the frame
 *    is ≤ K rows regardless of data scale (dsir_select / text_vocab
 *    shape);
 *  - allowlisted: the input is a bounded-KEY aggregate the analyzer
 *    cannot prove bounded (decile grain, value-grain score contraction,
 *    bucket-offset frames). Each entry documents WHY the frame cannot
 *    grow with data; an entry whose query no longer has such a window
 *    fails as stale, so the list cannot rot into a bypass.
 */
class WindowDisciplineSpec extends SparkSpec {

  /** query name → why its partition-less window input is bounded. */
  private val BoundedAggInput: Map[String, String] = Map(
    "q_pareto" ->
      ("running/grand-total windows ride the decile aggregate — " +
        "ParetoDeciles (=10) rows by construction"),
    "text_lm_eval" ->
      ("median via cumulative window over the groupBy(lm_milli) " +
        "value-grain contraction — lm_milli is a bounded integer score " +
        "space (count-of-counts rule), never doc grain"),
    "pack_sequences" ->
      ("cross-bucket prefix-sum offsets over the PackBuckets(=64)-row " +
        "bucket aggregate; per-doc cumsum rides the PARTITIONED bucket " +
        "window"),
    "mix_rebalance" ->
      ("rate-table windows ride the groupBy(lang) aggregate — the " +
        "language label set is a bounded vocabulary (kilobytes), never " +
        "doc grain; the realized_share window is the same lang-grain " +
        "frame post-join"),
    "mix_temperature" ->
      ("same lang-grain rate table as mix_rebalance (bounded language " +
        "label set)"),
    "mix_epochs" ->
      ("epoch plan is one window pass over the |langs|-row aggregate — " +
        "bounded vocabulary"),
    "q_skew_metrics" ->
      ("count-of-COUNTS contraction: the window sees distinct frequency " +
        "VALUES, and distinct counts sum to n so there are at most " +
        "O(sqrt(n)) of them (~10^6 rows at 10^12 events, Zipf-far fewer) " +
        "— sub-linear by arithmetic, never the |keys|-sized frame; the " +
        "literal key_col partition key folds away in the optimizer, " +
        "which is why the sweep sees an empty partitionSpec"))

  test("no partition-less Window over an unbounded frame in any registered query") {
    def hasLimitBelow(p: LogicalPlan): Boolean =
      p.collectFirst { case _: GlobalLimit | _: LocalLimit => () }.isDefined
    val offenders = scala.collection.mutable.Map.empty[String, Int]
    (graft.SparkEntry.queries ++ graft.SparkEntry.specOnly).foreach {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val unbounded = plan.collect {
          case w: LogicalWindow if w.partitionSpec.isEmpty && !hasLimitBelow(w.child) => w
        }
        if (unbounded.nonEmpty) offenders(name) = unbounded.size
    }
    val unexplained = offenders.keySet -- BoundedAggInput.keySet
    assert(unexplained.isEmpty,
      s"partition-less Window over a non-limited frame in: ${unexplained.toSeq.sorted.mkString(", ")} — " +
        "either route it through DistributedRank / a 1-row broadcast aggregate, " +
        "or document why the frame is bounded in BoundedAggInput")
    val stale = BoundedAggInput.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"stale BoundedAggInput entries (no partition-less window left): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
