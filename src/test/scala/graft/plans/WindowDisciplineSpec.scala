package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}

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
        "which is why the sweep sees an empty partitionSpec"),
    "text_hybrid" ->
      ("the fusion windows run over the BM25 top-K candidate frame: " +
        "LimitPushDownThroughWindow rewrites qBm25's rank<=K filter into " +
        "a Limit BELOW its window, and the embedding attach is a " +
        "key-unique inner join on doc_id that cannot inflate K — the " +
        "strict both-sides walk stops at that join (corpus side), so the " +
        "bound is argued here instead"))

  /** Every swept plan: registered queries + spec-only entries + the 33
    * snapshot-builder frames (VERDICT r13 #2 — builders get the same
    * window discipline as queries; their names carry a `snapshot:` prefix
    * so allowlist entries can't collide with query names). The builder
    * frames re-plan fresh via select("*") — their own physical plans are
    * fixed at build time. */
  private def sweptPlans() =
    (graft.SparkEntry.queries ++ graft.SparkEntry.specOnly).toSeq.map {
      case (name, fn) => name -> (() => fn(spark, sf).queryExecution.optimizedPlan)
    } ++ BuilderPlans.all(spark, sf).toSeq.map {
      case (tag, df) => s"snapshot:$tag" -> (() => df.select("*").queryExecution.optimizedPlan)
    }

  test("no partition-less Window over an unbounded frame in any swept plan") {
    // limitBounded walks the DIRECT input path (a collectFirst over the
    // whole subtree would admit a limit re-inflated by a join/explode
    // above it — ADVICE r12)
    val offenders = scala.collection.mutable.Map.empty[String, Int]
    sweptPlans().foreach {
      case (name, plan0) =>
        val plan = plan0()
        val unbounded = plan.collect {
          case w: LogicalWindow
              if w.partitionSpec.isEmpty && !PlanWalk.limitBounded(w.child) => w
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

  /** Column names known to be bounded-cardinality dimensions in this
    * corpus (types, languages, nations, flags, date-of-corpus days,
    * fixed bucket ids). A Window PARTITIONED by only these keys has
    * O(|domain|) tasks, so if its input is still raw fact/document grain
    * each task sorts n/|domain| rows — the q_mad_outliers funnel
    * (VERDICT r12 #2). Name-based; the closed-world test below forces
    * every partition-key name appearing in any swept plan to be
    * classified either here or in [[UnboundedKeyNames]] — an unclassified
    * novel name fails the suite, so a new bounded-cardinality column can
    * no longer slip past the funnel sweep unpoliced (VERDICT r13 #3). */
  private val BoundedKeyNames: Set[String] = Set(
    "event_type", "event_date", "prev_type", "t1", "t2", "key_col",
    "lang", "split", "source", "country", "device", "segment",
    "n_name", "r_name", "flag", "l_returnflag", "l_linestatus",
    "day", "b", "bucket", "side", "method", "sym",
    // label vocabulary (knn_label_eval): its windows ride the
    // label x label confusion-matrix aggregate, which the contraction
    // walk admits
    "true_label")

  /** Column names known to be DATA-grain keys (documents, users, orders,
    * vectors, clusters …): a Window partitioned by any of these has
    * O(data) groups, so parallelism scales with the corpus and the funnel
    * concern doesn't apply. Together with [[BoundedKeyNames]] this is the
    * closed world the classification test enforces: every partition-key
    * name in every swept plan must appear in exactly one of the two sets
    * (VERDICT r13 #3 — the old list "erred loose on unknown names", so a
    * bounded-cardinality column under a novel name could reintroduce the
    * q_mad_outliers funnel unseen). */
  private val UnboundedKeyNames: Set[String] = Set(
    "doc_id", "doc_a", "doc_b",     // document grain (tfidf ranks, span pairs)
    "diag",                          // span-island anti-diagonal: O(pair volume)
    "cluster_id",                    // dup-cluster grain (dedup_survivors)
    "event_id", "user_id",           // event/user fact grain
    "query_id",                      // ANN query-set grain (fixed workload, grows with deployment)
    "src_id",                        // bitext source-sentence grain
    "o_custkey", "l_partkey", "p_partkey", "p_name",  // TPC-H key grain
    "k",                             // q_asof_order's join key = user_id renamed
    "shard")                         // pack_manifest: O(total_tokens / shard_size)

  test("every Window partition-key name in every swept plan is classified bounded or unbounded") {
    val seen = scala.collection.mutable.Map.empty[String, scala.collection.mutable.Set[String]]
    sweptPlans().foreach { case (name, plan0) =>
      plan0().foreach {
        case w: LogicalWindow =>
          w.partitionSpec.flatMap(_.references.map(_.name)).foreach { k =>
            seen.getOrElseUpdate(k, scala.collection.mutable.Set.empty) += name
          }
        case _ => ()
      }
    }
    val unclassified = seen.keySet -- BoundedKeyNames -- UnboundedKeyNames
    assert(unclassified.isEmpty,
      "unclassified Window partition-key names: " +
        unclassified.toSeq.sorted.map(k => s"$k (in ${seen(k).toSeq.sorted.take(3).mkString(", ")})")
          .mkString("; ") +
        " — classify each as BoundedKeyNames (domain-bounded dimension: the " +
        "funnel sweep polices it) or UnboundedKeyNames (data-grain key: " +
        "parallelism scales with data)")
    val doubly = BoundedKeyNames & UnboundedKeyNames
    assert(doubly.isEmpty, s"names in BOTH classifications: ${doubly.toSeq.sorted.mkString(", ")}")
    // stale-entry rule for the UNBOUNDED side only: every entry was added
    // because a swept window used it, and keeping dead ones would blur the
    // audit trail. The BOUNDED side is deliberately exempt — it is a
    // policy-forward dimension vocabulary (country/day/device … may enter
    // a window later), and an unused bounded name makes the funnel sweep
    // STRICTER, never looser, so it cannot rot into a bypass.
    val staleUnbounded = UnboundedKeyNames -- seen.keySet
    assert(staleUnbounded.isEmpty,
      s"stale UnboundedKeyNames entries (no swept window uses them): ${staleUnbounded.toSeq.sorted.mkString(", ")}")
  }

  /** query name → why its bounded-key window's uncontracted input is an
    * acceptable trade (same contract as [[BoundedAggInput]]: stale
    * entries fail). */
  private val BoundedKeyWindowOk: Map[String, String] = Map(
    "pack_shards" ->
      ("two-phase prefix sum (packedTokens): the (lang, b) in-bucket " +
        "cumsum is |langs|x64-way parallel and PackBuckets grows to " +
        "O(partitions) at scale; cross-bucket offsets ride the bounded " +
        "aggregate"),
    "pack_manifest" ->
      "same packedTokens two-phase kernel as pack_shards",
    "pack_sequences" ->
      ("two-phase global prefix sum: the in-bucket (b) cumsum is " +
        "PackBuckets-way parallel, PackBuckets -> O(partitions) at " +
        "scale; cross-bucket offsets ride the 64-row aggregate"),
    "q_gap_fill" ->
      ("the LOCF window rides the |nations|x|days| dense calendar grid " +
        "— domain-bounded, generated by sequence/explode over a " +
        "per-nation [min,max] aggregate (the Generate is why the " +
        "mechanical contraction walk cannot see it)"),
    "q_source_cap" ->
      ("at web scale the partition key is the DOMAIN — millions of " +
        "groups, cluster-wide parallelism; rank<=cap becomes a partial " +
        "WindowGroupLimit (running counter, only cap rows survive each " +
        "map task), so the exchange never carries raw doc grain; the " +
        "corpus' handful of sources is a fixture artifact"),
    "q_weighted_median_bucketed" ->
      ("the tail window reads the checkpointed (flag, value) grain " +
        "frame FILTERED to the census crossing bucket — grain/4096 rows " +
        "per flag by construction; the contraction (grain aggregate + " +
        "4096-bucket census) happens before the checkpoint, where the " +
        "mechanical walk cannot follow, and StatsSpec pins the result " +
        "hash-equal to the contracted one-window form"),
    "q_topk_per_nation" ->
      ("the window rides the per-customer revenue Aggregate (orders " +
        "contract to one row per customer FIRST — the documented W1 " +
        "aggregate-first trade); the dim attaches are key-unique " +
        "broadcasts that cannot inflate it, and rank<=3 becomes a " +
        "partial WindowGroupLimit so each map task emits at most 3 rows " +
        "per nation into the exchange"))

  test("no bounded-key Window over an uncontracted raw-grain frame in any swept plan") {
    val offenders = scala.collection.mutable.Map.empty[String, Int]
    sweptPlans().foreach {
      case (name, plan0) =>
        val plan = plan0()
        val funnels = plan.collect {
          case w: LogicalWindow if w.partitionSpec.nonEmpty && {
            val refs = w.partitionSpec.flatMap(_.references.map(_.name))
            refs.nonEmpty && refs.forall(BoundedKeyNames) &&
              !PlanWalk.contracted(w.child)
          } => w
        }
        if (funnels.nonEmpty) offenders(name) = funnels.size
    }
    val unexplained = offenders.keySet -- BoundedKeyWindowOk.keySet
    assert(unexplained.isEmpty,
      s"bounded-key Window over an uncontracted frame in: ${unexplained.toSeq.sorted.mkString(", ")} — " +
        "contract to (key, value)-grain counts first (the q_weighted_median " +
        "count-of-counts shape) or document the trade in BoundedKeyWindowOk")
    val stale = BoundedKeyWindowOk.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"stale BoundedKeyWindowOk entries: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("the contraction walk flags the pre-r13 lowerMedian shape and admits the count-of-counts form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val e = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("event_type", "x")
    val med = e.groupBy("event_type").agg(max("x").as("med"))
    // pre-fix q_mad_outliers: window over RAW rows joined to a tiny
    // aggregate — an Aggregate exists in the subtree (which a collectFirst
    // would wrongly admit), but the frame is raw grain
    val preFix = e.join(broadcast(med), "event_type")
      .withColumn("rn",
        row_number().over(Window.partitionBy("event_type").orderBy("x")))
    val pre = preFix.queryExecution.optimizedPlan.collect { case w: LogicalWindow => w }
    assert(pre.nonEmpty && pre.forall(w => !PlanWalk.contracted(w.child)),
      "the pre-fix raw-grain window must be flagged")
    // post-fix: the window rides the (key, value)-grain count frame
    val postFix = e.groupBy("event_type", "x").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt")
        .over(Window.partitionBy("event_type").orderBy("x")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val post = postFix.queryExecution.optimizedPlan.collect { case w: LogicalWindow => w }
    assert(post.nonEmpty && post.forall(w => PlanWalk.contracted(w.child)),
      "the contracted count-of-counts window must be admitted")
  }
}
