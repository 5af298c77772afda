package graft.plans

import graft.SparkSpec

/**
 * Suite-wide enforcement of the broadcast-cross-join discipline (the r11
 * verdict's manual anti-pattern audit, mechanized): a cross join whose
 * build side is not explicitly `broadcast()` plans as a
 * `CartesianProduct` — n·m row pairs through a full shuffle product, the
 * at-scale killer. In this engine every cross join must be either a
 * broadcast of a provably tiny frame (1-row scalar aggregates, bounded
 * rate/centroid tables) or one of the DECLARED all-pairs truth anchors
 * that exist solely to gate their bucketed production twins.
 *
 * Method: with `autoBroadcastJoinThreshold = -1` the planner cannot
 * rescue an unhinted cross join by noticing the test fixture is small —
 * only an explicit hint (scale-independent) or a declared anchor
 * survives, so the sweep tests the PLAN SHAPE contract, not fixture
 * luck. Window discipline has the same structure in
 * [[WindowDisciplineSpec]]; the two sweeps together pin the only two
 * single-task / all-pairs plan classes this engine ever flagged.
 */
class CrossJoinDisciplineSpec extends SparkSpec {

  /** query name → why its cartesian product is the declared operation.
    * Currently EMPTY: every declared all-pairs anchor hides its product
    * behind a truth snapshot — knn_brute materializes through knn_truth
    * (the cartesian runs in the BUILD, consumers scan a LogicalRDD),
    * align_bitext/align_eval through align_truth (round 13),
    * dedup_semantic/dedup_embedding ride the emb-pair snapshots the same
    * way, and knn_filtered's label predicate is an equi-key so it never
    * plans cartesian at all. The map stays as the declaration mechanism
    * for any future anchor whose product must stay in-plan. */
  private val DeclaredAnchors: Map[String, String] = Map.empty

  test("every cross join is an explicit broadcast or a declared all-pairs anchor") {
    val conf = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(conf)
    val offenders = scala.collection.mutable.Map.empty[String, Int]
    try {
      spark.conf.set(conf, "-1")
      (graft.SparkEntry.queries ++ graft.SparkEntry.specOnly).foreach {
        case (name, fn) =>
          val plan = fn(spark, sf).queryExecution.executedPlan.toString
          val n = "CartesianProduct".r.findAllIn(plan).length
          if (n > 0) offenders(name) = n
      }
    } finally spark.conf.set(conf, prev)
    val unexplained = offenders.keySet -- DeclaredAnchors.keySet
    assert(unexplained.isEmpty,
      s"CartesianProduct in non-anchor queries: ${unexplained.toSeq.sorted.mkString(", ")} — " +
        "broadcast() the tiny side explicitly (scale-independent), or " +
        "declare the query an all-pairs anchor in DeclaredAnchors with " +
        "the production tier it gates")
    val stale = DeclaredAnchors.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"stale DeclaredAnchors entries (no cartesian left): ${stale.toSeq.sorted.mkString(", ")}")
  }

  /** snapshot tag → why that BUILDER's cartesian product is the declared
    * operation (VERDICT r13 #2: the r13 artifact migration moved every
    * all-pairs anchor INTO a builder, emptying the in-query allowlist
    * above — this is where those declarations now live). Each anchor's
    * product gates a bucketed/banded production twin; the build runs once
    * per corpus version and persists, so the n² cost is paid off-query. */
  private val BuilderAnchors: Map[String, String] = Map(
    "knn_truth" ->
      ("the exact brute-force top-k truth table — the declared all-pairs " +
        "anchor ann_eval calibrates the IVF/LSH/PQ tiers against"),
    "align_truth" ->
      ("the exact margin-criterion bitext alignment over all src×tgt " +
        "pairs — the truth anchor align_eval scores align_bitext_lsh " +
        "against"),
    "emb" ->
      ("the exact all-pairs cosine near-dup truth set — the anchor " +
        "dedup_embedding_lsh / dedup_semantic_bucketed are measured " +
        "against (SCALING.md dedup-suite recall rows)"))

  test("every snapshot-builder cross join is an explicit broadcast or a declared anchor") {
    // build (and capture) BEFORE flipping the conf — the capture executes
    // real builds, and those must run under the session's normal planner
    val builders = BuilderPlans.all(spark, sf)
    val conf = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(conf)
    val offenders = scala.collection.mutable.Map.empty[String, Int]
    try {
      spark.conf.set(conf, "-1")
      builders.foreach { case (tag, df) =>
        // select("*") re-plans the captured logical plan under THIS conf
        // (the captured frame's own physical plan is fixed at build time)
        val plan = df.select("*").queryExecution.executedPlan.toString
        val n = "CartesianProduct".r.findAllIn(plan).length
        if (n > 0) offenders(tag) = n
      }
    } finally spark.conf.set(conf, prev)
    val unexplained = offenders.keySet -- BuilderAnchors.keySet
    assert(unexplained.isEmpty,
      s"CartesianProduct in non-anchor snapshot builders: ${unexplained.toSeq.sorted.mkString(", ")} — " +
        "broadcast() the tiny side explicitly (scale-independent), or " +
        "declare the artifact an all-pairs anchor in BuilderAnchors with " +
        "the production tier it gates")
    val stale = BuilderAnchors.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"stale BuilderAnchors entries (no cartesian left): ${stale.toSeq.sorted.mkString(", ")}")
  }
}
