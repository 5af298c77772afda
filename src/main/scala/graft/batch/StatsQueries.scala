package graft.batch

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/**
 * Table-statistics collection — the `ANALYZE TABLE … COMPUTE STATISTICS
 * FOR COLUMNS` pass every cost-based engine runs before planning, as an
 * explicit operator family. The reference pipeline has no optimizer and
 * no stats; a 100 TB deployment of THIS engine lives and dies by them:
 * per-column NDV drives join-order and broadcast decisions, min/max
 * drives partition pruning, and histograms drive selectivity estimates
 * for range predicates. Three grains:
 *
 *  - [[qStatsProfile]]: one row per column — count / nulls / NDV /
 *    min / max. The catalog-stats row.
 *  - [[qStatsHist]]: equi-WIDTH histogram over the price column —
 *    value-range buckets, one broadcast bounds pass + one aggregate.
 *  - [[qStatsHistDepth]]: equi-DEPTH histogram (equal row mass per
 *    bucket) — the selectivity-estimation shape engines actually keep,
 *    exact here via the two-phase distributed rank.
 *
 * All output integers-or-strings so every row hash-matches the DuckDB
 * twin bit-for-bit (SURVEY §5.1 discipline).
 */
object StatsQueries {

  /** Profiled columns: name → (value column, already stringly?). Timestamps
    * profile over their ISO-formatted string (identical total order, and
    * min/max/NDV over the string are engine-identical — no float or
    * timezone rendering in the output row). Money profiles in exact cents. */
  private def profiled: Seq[(String, Column)] = Seq(
    "l_orderkey" -> col("l_orderkey"),
    "l_partkey" -> col("l_partkey"),
    "l_suppkey" -> col("l_suppkey"),
    "l_linenumber" -> col("l_linenumber").cast("long"),
    "l_returnflag" -> col("l_returnflag"),
    "l_linestatus" -> col("l_linestatus"),
    "l_shipdate" -> date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss"),
    "l_extendedprice_cents" -> Exact.cents(col("l_extendedprice")))

  /** SQL twins of [[profiled]] for the oracle. */
  private def profiledSql: Seq[(String, String)] = Seq(
    "l_orderkey" -> "l_orderkey",
    "l_partkey" -> "l_partkey",
    "l_suppkey" -> "l_suppkey",
    "l_linenumber" -> "CAST(l_linenumber AS BIGINT)",
    "l_returnflag" -> "l_returnflag",
    "l_linestatus" -> "l_linestatus",
    "l_shipdate" -> "strftime(l_shipdate, '%Y-%m-%d %H:%M:%S')",
    "l_extendedprice_cents" -> Exact.centsSql("l_extendedprice"))

  /** Column-stats profile of `lineitem`: one output row per profiled
    * column with (n_rows, n_null, n_distinct, min_str, max_str).
    *
    * Shape: ONE aggregate computes every column's stats in a single scan
    * — the multiple exact `countDistinct`s compile to Catalyst's Expand
    * (one input row fans to |distinct-aggs| grouping streams), which IS
    * how batched ANALYZE runs single-pass; the fan-out multiplies the
    * aggregate's input, not the scan. At 100 TB the one-line swap is
    * `approx_count_distinct` (HLL++) per column — same plan minus the
    * Expand, sketch-mergeable across partitions — kept exact here so the
    * row is oracle-able, exactly the A3/q_exact_distinct split. min/max
    * render through CAST AS STRING so every engine prints the identical
    * bytes (longs and ISO timestamps only — no float formatting). */
  def qStatsProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = profiled
    val li = Tables.lineitem(spark, dir)
      .select(cols.map { case (n, c) => c.as(n) }: _*)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { case (n, _) =>
      Seq(
        sum(col(n).isNull.cast("long")).as(s"null__$n"),
        countDistinct(col(n)).as(s"ndv__$n"),
        min(col(n)).cast("string").as(s"min__$n"),
        max(col(n)).cast("string").as(s"max__$n"))
    }
    val m = li.agg(aggs.head, aggs.tail: _*)
    m.select(explode(array(cols.map { case (n, _) =>
        struct(lit(n).as("column_name"),
          col("n_rows"),
          col(s"null__$n").as("n_null"),
          col(s"ndv__$n").as("n_distinct"),
          col(s"min__$n").as("min_str"),
          col(s"max__$n").as("max_str"))
      }: _*)).as("s"))
      .select(col("s.column_name").as("column_name"), col("s.n_rows").as("n_rows"),
        col("s.n_null").as("n_null"), col("s.n_distinct").as("n_distinct"),
        col("s.min_str").as("min_str"), col("s.max_str").as("max_str"))
  }

  /** Bucket count for both histograms. */
  val HistBuckets = 16L

  /** Equi-width histogram over `l_extendedprice` cents: bucket k covers
    * cents in [lo + k·w, lo + (k+1)·w) for w = ⌈(hi−lo+1)/B⌉ via the
    * all-integer rule bucket = ((x−lo)·B) DIV (hi−lo+1) — buckets are
    * value-DISJOINT by construction, so per-bucket (min, max) envelopes
    * never overlap (StatsSpec pins it).
    *
    * Shape: one narrow aggregate finds (lo, hi), broadcast back onto the
    * scan (in-plan — a driver `collect` of the bounds would bake stale
    * literals if the frame is chained after a filter); then one hash
    * aggregate on the bucket id. Two scan-bandwidth passes, ≤ B output
    * rows at any scale; the per-bucket sums are exact longs. */
  def qStatsHist(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(spark, dir)
      .select(Exact.cents(col("l_extendedprice")).as("x"))
    val bounds = x.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    x.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr(s"((x - lo) * $HistBuckets) DIV (hi - lo + 1)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("lo_cents"), max(col("x")).as("hi_cents"),
        sum(col("x")).as("sum_cents"))
  }

  /** Equi-depth histogram over `l_extendedprice` cents: every bucket
    * holds ⌊n/B⌋ or ⌈n/B⌉ rows (bucket = ⌊B·(rank−1)/n⌋ over the exact
    * global rank), with the per-bucket value envelope — the boundary set
    * a selectivity estimator interpolates range predicates against.
    * Equal-value runs straddling a boundary stay split (rank ties break
    * on the (l_orderkey, l_linenumber) PK), so adjacent envelopes may
    * TOUCH at a duplicated value but never invert (StatsSpec pins both
    * the ±1 bucket sizes and the envelope order).
    *
    * Scale shape: the exact rank is the q_global_rank two-phase kernel —
    * `orderBy` range-partitions on sampled split points, `zipWithIndex`
    * adds per-partition prefix offsets from one counts job — NO
    * single-partition window anywhere (the `row_number().over(orderBy)`
    * formulation would funnel the corpus through one task). The row
    * count rides a 1-row broadcast. At 100 TB the sketch swap is
    * `percentile_approx` boundaries (one pass, mergeable KLL-style
    * sketch) — same output contract, bounded rank error; kept exact here
    * as the oracle anchor, the same split as q_len_quantiles vs the
    * specOnly q_percentiles. */
  def qStatsHistDepth(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ranked = Tables.lineitem(spark, dir)
      .select(Exact.cents(col("l_extendedprice")).as("x"),
        col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("x"), col("l_orderkey"), col("l_linenumber"))
      .rdd.zipWithIndex
      .map { case (r, i) => (r.getLong(0), i + 1L) }
      .toDF("x", "rank")
    val total = Tables.lineitem(spark, dir).agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(total))
      .withColumn("bucket", expr(s"($HistBuckets * (rank - 1)) DIV n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("lo_cents"), max(col("x")).as("hi_cents"))
  }

  /** Range-fraction cutoffs (milli of the value range) probed by
    * [[qStatsHistEval]]. */
  val EvalFracs: Seq[Long] = Seq(100L, 250L, 500L, 900L)

  /** The stats family's calibration card — how far off is the equi-width
    * histogram's selectivity ESTIMATE for `x < c` range predicates, next
    * to the exact answer? The same in-engine recall-card discipline as
    * dedup_minhash_eval/ann_eval applied to the optimizer's own input:
    * stats drive join-order/broadcast decisions, so their error deserves
    * a measured row, not an assumption. Cutoffs are fixed FRACTIONS of
    * the value range, so the card is comparable across corpus sizes.
    *
    * The estimator is the textbook one — full buckets count whole,
    * the straddling bucket contributes `n_b · overlap DIV width`
    * (uniform-within-bucket) — with bucket EDGES derived from the same
    * integer bucket rule as stats_histogram (edge(b) = ⌈b·R/B⌉ offsets),
    * so every quantity is exact integer and the card hash-matches.
    *
    * Shape: the estimate side runs over the B-row bucket census × |fracs|
    * literals; the exact side is ONE scan whose rows fan to |fracs| flag
    * rows collapsing in a map-side-combinable |fracs|-key aggregate;
    * both join on the frac literal. Output |fracs| rows at any scale. */
  def qStatsHistEval(spark: SparkSession, dir: String): DataFrame = {
    val x = Tables.lineitem(spark, dir)
      .select(Exact.cents(col("l_extendedprice")).as("x"))
    val bounds = x.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val hist = x.crossJoin(broadcast(bounds))
      .withColumn("bucket", expr(s"((x - lo) * $HistBuckets) DIV (hi - lo + 1)"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_b"))
    val fracs = expr(s"explode(array(${EvalFracs.map(_ + "L").mkString(",")}))")
      .as("f_milli")
    val est = hist.crossJoin(broadcast(bounds)).select(col("*"), fracs)
      .withColumn("r", expr("hi - lo + 1"))
      .withColumn("e_lo", expr(s"(bucket * r + $HistBuckets - 1) DIV $HistBuckets"))
      .withColumn("e_hi", expr(s"((bucket + 1) * r + $HistBuckets - 1) DIV $HistBuckets"))
      .withColumn("oc", expr("(r * f_milli) DIV 1000"))
      .withColumn("contrib",
        expr("(n_b * least(greatest(oc - e_lo, 0L), e_hi - e_lo)) DIV (e_hi - e_lo)"))
      .groupBy(col("f_milli")).agg(sum(col("contrib")).as("est_rows"))
    val actual = x.crossJoin(broadcast(bounds)).select(col("x"), col("lo"),
        expr("hi - lo + 1").as("r"), fracs)
      .groupBy(col("f_milli"))
      .agg(sum(expr("CAST(x - lo < (r * f_milli) DIV 1000 AS LONG)")).as("actual_rows"))
    est.join(actual, "f_milli")
      .withColumn("err_milli",
        expr("(1000 * abs(est_rows - actual_rows)) DIV greatest(actual_rows, 1L)"))
      .select(col("f_milli"), col("est_rows"), col("actual_rows"), col("err_milli"))
  }

  /** Exact WEIGHTED lower median — per return flag, the smallest price
    * (cents) whose cumulative QUANTITY weight reaches half the group's
    * total (2·cumw ≥ W): the "median unit sold at" statistic, where the
    * row median answers a different question (median line). Weighted
    * quantiles are what sampling/packing decisions actually need (token
    * budgets weight documents by length, not count).
    *
    * Shape: the count-of-COUNTS discipline — the fact collapses to the
    * (flag, value)-grain weight frame FIRST (one map-side-combinable
    * aggregate, the only fact-sized pass), the cumulative window runs
    * over that value-distinct frame, and the answer reads off the first
    * crossing via a min aggregate. Quantities are integral in this
    * schema, so the weights and the crossing rule are exact integers. */
  def qWeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("flag"),
        Exact.cents(col("l_extendedprice")).as("v"),
        col("l_quantity").cast("long").as("wt"))
      .groupBy(col("flag"), col("v")).agg(sum(col("wt")).as("w"))
    // the group total rides the SAME WindowExec as the running sum (same
    // partition key, whole-partition frame) — a groupBy+join twin would
    // scan lineitem a second time for the totals (r13, the lowerMedian
    // discipline)
    val byFlag = Window.partitionBy("flag")
    vals
      .withColumn("cumw", sum(col("w")).over(byFlag.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total_w", sum(col("w")).over(byFlag))
      .filter(col("cumw") * 2 >= col("total_w"))
      .groupBy(col("flag"))
      .agg(max(col("total_w")).as("total_weight"),
        min(col("v")).as("weighted_median_cents"))
  }

  /** Bucket count for [[qWeightedMedianBucketed]]'s phase-A census — the
    * tail window's expected input is grain/[[MedianBuckets]]. */
  val MedianBuckets = 4096L

  /** The (flag, value-cents) quantity-weight grain frame the bucketed
    * weighted median reads — a shared snapshot artifact (the
    * minhash_sigs/pq_codes lifecycle): ONE map-side-combinable aggregate
    * over the fact, persisted once per corpus version, consumed by the
    * bounds/census/tail phases. At 100 TB this is the parquet the
    * quantile service maintains next to the fact. */
  private[graft] def wmedianGrain(spark: SparkSession, dir: String): DataFrame =
    graft.util.SnapshotCache.snapshot("wmedian_grain", spark, dir)(
      Tables.lineitem(spark, dir)
        .select(col("l_returnflag").as("flag"),
          Exact.cents(col("l_extendedprice")).as("v"),
          col("l_quantity").cast("long").as("wt"))
        .groupBy(col("flag"), col("v")).agg(sum(col("wt")).as("w")))

  /** The at-scale twin of [[qWeightedMedian]] (VERDICT r13 #4): the same
    * exact weighted lower median, restructured so NO window ever sees the
    * full value-grain frame — the axis the scale13 probe showed growing
    * (10× distinct (flag, value) cells ⇒ 10× window input ⇒ 6.4× cost in
    * the one-window form). Two phases, both bounded:
    *
    *  - Phase A: the grain frame buckets equi-width ([[MedianBuckets]]
    *    over the per-flag value envelope) into a ≤ B-row-per-flag weight
    *    census — one map-side-combinable aggregate — and the cumulative
    *    window runs over THAT (input B rows per flag, constant in both
    *    the row count and the value domain). The crossing bucket `cb` is
    *    the first whose cumulative weight reaches half; `min_by` lifts
    *    the exact weight-before-cb off the same census row.
    *  - Phase B: only grain rows inside `cb` (expected grain/B of the
    *    frame, broadcast-pruned) pay the per-value cumulative window,
    *    offset by the phase-A prefix — the first 2·cumw ≥ W crossing is
    *    the exact weighted lower median, bucket-local ties and all.
    *
    * Exactness: values below bucket `cb` have 2·cum < W by cb's
    * minimality, so the global crossing value lies in `cb`, and phase B
    * computes its exact rank with integer arithmetic end to end — this
    * twin HASH-matches the one-window oracle (same DuckDB SQL), unlike a
    * sketch swap. Cost trade: a second pass over the grain frame (both
    * map-side-combinable) buys windows that stay flat when the value
    * domain grows 10× — measured in SCALING.md scale14. Worst case: a
    * value domain concentrated inside one bucket's width re-inflates
    * phase B (equi-width's known weakness); the recursion (re-bucket
    * inside cb) is the documented escalation, not needed at any measured
    * scale.
    *
    * The grain frame is a SHARED SNAPSHOT ARTIFACT ([[wmedianGrain]],
    * built by `SnapshotBuild.all` like minhash_sigs/pq_codes — VERDICT
    * r14 #2): bounds, census, and the tail pass all re-read the
    * materialization, so the FACT scans once — without it Catalyst plans
    * four independent scan→grain subtrees (no exchange reuse across
    * their differently-pruned scans), and a 4×-scan "optimization" is no
    * optimization at 100 TB. Building it live on every call made the
    * in-suite reading SLOWER than the exact twin (2.81 vs 2.31 s r14)
    * while the isolated probe — which amortizes the build — showed the
    * structural 1.7× win; as an attributed artifact the suite and the
    * probe measure the same thing. */
  def qWeightedMedianBucketed(spark: SparkSession, dir: String): DataFrame =
    bucketedMedianOver(wmedianGrain(spark, dir))._1

  /** Escalation trigger for [[bucketedMedianOver]]: phase B escalates
    * when the crossing bucket holds more than this multiple of its
    * equi-share (grain/B) of distinct values — the equi-width worst case
    * (a value domain concentrated inside one bucket's width) that would
    * otherwise silently re-inflate the tail window to the exact form's
    * cost at 100 TB (VERDICT r15 #5). */
  private[graft] val MedianEscalateFactor = 4L

  /** The two-phase kernel over an explicit (flag, v, w) grain frame —
    * factored out of [[qWeightedMedianBucketed]] so StatsSpec can drive
    * the escalation path on an adversarially concentrated domain the
    * TPC-H fixture never produces. Returns (result, escalated).
    *
    * Escalation (one recursion level, previously documented prose): the
    * phase-A census counts distinct values per bucket (`nb`) alongside
    * the weights; the crossing-bucket row count comes back with the
    * per-flag crossing frame (a flag-grain bounded pull — the same
    * driver-side decision size as a centroid read), and when any flag's
    * crossing bucket exceeds [[MedianEscalateFactor]] × its equi-share,
    * the rows inside `cb` re-bucket equi-width over cb's OWN value
    * envelope and a second census window picks the crossing sub-bucket —
    * so the tail window's input is bounded by cbRows/B instead of
    * cbRows. Exactness is the same minimality argument at each level:
    * every value below the crossing (sub-)bucket has 2·cum < W, so the
    * global crossing value lies inside it, and the tail computes its
    * exact rank offset by the accumulated weight-before. The crossing
    * frame is localCheckpointed (flag-grain, a handful of rows) so the
    * decision pull and the tail plan share ONE phase-A execution. */
  /** Phase A as its own (lazy) frame: the equi-width census, the
    * bucket-grain cumulative window, and the per-flag crossing summary —
    * (flag, cb, total_w, w_before, cb_n, total_n). Exposed so StatsSpec
    * can assert the census window rides the census Aggregate (the
    * contraction), which the checkpoint in [[bucketedMedianOver]] hides
    * from the final plan. */
  private[graft] def wmedianCrossing(vals: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = vals.groupBy(col("flag"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    val census = vals.join(broadcast(bounds), "flag")
      .withColumn("bucket", expr(s"((v - lo) * $MedianBuckets) DIV (hi - lo + 1)"))
      .groupBy(col("flag"), col("bucket"))
      .agg(sum(col("w")).as("bw"), count(lit(1)).as("nb"))
    val byFlag = Window.partitionBy("flag")
    val cum = census
      .withColumn("cumw", sum(col("bw")).over(byFlag.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total_w", sum(col("bw")).over(byFlag))
      .withColumn("total_n", sum(col("nb")).over(byFlag))
    cum.filter(col("cumw") * 2 >= col("total_w"))
      .groupBy(col("flag"))
      .agg(min(col("bucket")).as("cb"), max(col("total_w")).as("total_w"),
        min_by(col("cumw") - col("bw"), col("bucket")).as("w_before"),
        min_by(col("nb"), col("bucket")).as("cb_n"),
        max(col("total_n")).as("total_n"))
  }

  private[graft] def bucketedMedianOver(vals: DataFrame): (DataFrame, Boolean) = {
    import org.apache.spark.sql.expressions.Window
    val bounds = vals.groupBy(col("flag"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
    def bucketed(df: DataFrame): DataFrame =
      df.join(broadcast(bounds), "flag")
        .withColumn("bucket", expr(s"((v - lo) * $MedianBuckets) DIV (hi - lo + 1)"))
    val byFlag = Window.partitionBy("flag")
    val crossing = wmedianCrossing(vals).localCheckpoint()
    // flag-grain escalation decision (one row per flag; bounded pull)
    val stats = graft.util.Bounded.boundedCollect(
      crossing.select(col("cb_n"), col("total_n")), 64,
      "wmedian crossing census (one row per return flag)")
    val escalate = stats.exists(r =>
      r.getLong(0) * MedianBuckets > r.getLong(1) * MedianEscalateFactor)
    def finish(rows: DataFrame, base: org.apache.spark.sql.Column): DataFrame =
      rows.withColumn("cumw", base +
        sum(col("w")).over(byFlag.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("cumw") * 2 >= col("total_w"))
        .groupBy(col("flag"))
        .agg(max(col("total_w")).as("total_weight"),
          min(col("v")).as("weighted_median_cents"))
    val cbRows = bucketed(vals).join(broadcast(crossing), "flag")
      .filter(col("bucket") === col("cb"))
    if (!escalate) (finish(cbRows, col("w_before")), false)
    else {
      // level-2 re-bucket inside cb over cb's own envelope: distinct
      // values spread across B sub-buckets unless they re-concentrate
      // within a (hi-lo)/B² span — one level suffices for any physical
      // value domain (cents are integers; a span below B² cents IS the
      // bounded case)
      val bounds2 = cbRows.groupBy(col("flag"))
        .agg(min(col("v")).as("lo2"), max(col("v")).as("hi2"))
      val r2 = cbRows.join(broadcast(bounds2), "flag")
        .withColumn("b2", expr(s"((v - lo2) * $MedianBuckets) DIV (hi2 - lo2 + 1)"))
      val census2 = r2.groupBy(col("flag"), col("b2"))
        .agg(sum(col("w")).as("bw2"), max(col("total_w")).as("tw"),
          max(col("w_before")).as("wb"))
      val cum2 = census2
        .withColumn("cumw2", col("wb") +
          sum(col("bw2")).over(byFlag.orderBy(col("b2"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val crossing2 = cum2.filter(col("cumw2") * 2 >= col("tw"))
        .groupBy(col("flag"))
        .agg(min(col("b2")).as("cb2"),
          min_by(col("cumw2") - col("bw2"), col("b2")).as("w_before2"))
      val tail = r2.join(broadcast(crossing2), "flag")
        .filter(col("b2") === col("cb2"))
      (finish(tail, col("w_before2")), true)
    }
  }

  /** Number of delete-one blocks in [[qJackknife]]. */
  val JkBlocks = 10L

  /** Deterministic uncertainty quantification — the block jackknife: how
    * stable is each type's mean value? Rows split into [[JkBlocks]]
    * deterministic hash blocks; the B leave-one-block-out means m_b are
    * computed in milli-cents, and the jackknife variance
    *
    *   Var = (B−1)/B · Σ(m_b − m̄)²
    *       = (B−1)·(B·Σm² − (Σm)²) DIV B²        (denominator cleared)
    *
    * is exact integer end to end — the error bar a monitoring dashboard
    * wants next to every mean, with NO randomness (the bootstrap's
    * resampling noise replaced by the hash split, so the estimate
    * replays bit-identically). A degenerate corpus (any empty complement)
    * reports NULL rather than a fabricated number.
    *
    * Shape: ONE map-side-combinable aggregate to the (type × B) block
    * frame is the only fact-sized pass; everything after runs on ≤
    * |types|·B rows. At 100 TB that is a scan plus kilobytes. */
  def qJackknife(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact
    val blocks = Tables.events(spark, dir).filter(col("value").isNotNull)
      .select(col("event_type"), Exact.cents(col("value")).as("x"),
        pmod(Exact.md5Long(concat(lit("jk|"), col("event_id"))), lit(JkBlocks)).as("blk"))
      .groupBy(col("event_type"), col("blk"))
      .agg(sum(col("x")).as("s_b"), count(lit(1)).as("n_b"))
    // per-type totals ride a whole-partition window over the (type × B)
    // block frame — a groupBy+join twin would run the events scan twice
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy("event_type")
    blocks
      .withColumn("s", sum(col("s_b")).over(byType))
      .withColumn("n", sum(col("n_b")).over(byType))
      .withColumn("b_present", count(lit(1)).over(byType))
      .withColumn("m_b",
        when(col("n") > col("n_b"),
          expr("1000 * (s - s_b) DIV (n - n_b)")))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_events"),
        max(expr("1000 * s DIV n")).as("mean_milli"),
        max(col("b_present")).as("n_blocks"),
        count(col("m_b")).as("n_jk"),
        sum(col("m_b")).as("sm"),
        sum(expr("m_b * m_b")).as("sm2"))
      .withColumn("jk_var_milli2",
        when(col("n_jk") === JkBlocks,
          expr(s"(($JkBlocks - 1) * ($JkBlocks * sm2 - sm * sm)) DIV (${JkBlocks * JkBlocks})")))
      .select(col("event_type"), col("n_events"), col("mean_milli"),
        col("n_blocks"), col("jk_var_milli2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stats_profile" -> (qStatsProfile _),
    "stats_histogram" -> (qStatsHist _),
    "stats_histogram_depth" -> (qStatsHistDepth _),
    "stats_hist_eval" -> (qStatsHistEval _),
    "q_weighted_median" -> (qWeightedMedian _),
    "q_weighted_median_bucketed" -> (qWeightedMedianBucketed _),
    "q_jackknife" -> (qJackknife _))

  /** One oracle, two plans: the bucketed twin is EXACT, so it answers to
    * the identical SQL — the strongest possible correctness claim for a
    * restructured kernel (hash equality with the one-window form). */
  private val weightedMedianSql =
    s"""WITH vals AS (
         |  SELECT l_returnflag AS flag, ${Exact.centsSql("l_extendedprice")} AS v,
         |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
         |  FROM lineitem GROUP BY 1, 2),
         |c AS (
         |  SELECT flag, v, w,
         |    CAST(sum(w) OVER (PARTITION BY flag ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumw,
         |    CAST(sum(w) OVER (PARTITION BY flag) AS BIGINT) AS total_w
         |  FROM vals)
         |SELECT flag, max(total_w) AS total_weight,
         |  min(v) AS weighted_median_cents
         |FROM c WHERE cumw * 2 >= total_w GROUP BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    // same value-grain contraction, same 2·cumw >= W lower-median rule
    "q_weighted_median" -> weightedMedianSql,
    "q_weighted_median_bucketed" -> weightedMedianSql,
    "stats_profile" -> {
      val m = profiledSql.map { case (n, e) =>
        s"""|    sum(CASE WHEN ($e) IS NULL THEN 1 ELSE 0 END) AS "null__$n",
            |    count(DISTINCT ($e)) AS "ndv__$n",
            |    CAST(min($e) AS VARCHAR) AS "min__$n",
            |    CAST(max($e) AS VARCHAR) AS "max__$n"""".stripMargin
      }.mkString(",\n")
      val rows = profiledSql.map { case (n, _) =>
        s"""SELECT '$n' AS column_name, n_rows, CAST("null__$n" AS BIGINT) AS n_null,
           |  CAST("ndv__$n" AS BIGINT) AS n_distinct, "min__$n" AS min_str,
           |  "max__$n" AS max_str FROM m""".stripMargin
      }.mkString("\nUNION ALL ")
      s"WITH m AS (\n  SELECT count(*) AS n_rows,\n$m\n  FROM lineitem)\n$rows"
    },
    "stats_histogram" ->
      s"""WITH x AS (
         |  SELECT ${Exact.centsSql("l_extendedprice")} AS x FROM lineitem),
         |b AS (SELECT min(x) AS lo, max(x) AS hi FROM x)
         |SELECT ((x - lo) * $HistBuckets) // (hi - lo + 1) AS bucket,
         |  count(*) AS n_rows, min(x) AS lo_cents, max(x) AS hi_cents,
         |  CAST(sum(x) AS BIGINT) AS sum_cents
         |FROM x, b GROUP BY 1""".stripMargin,
    // identical hash-block split (md5Long % B), identical milli-cent
    // integer means, identical denominator-cleared variance formula —
    // every intermediate BIGINT and non-negative, so DuckDB's floor `//`
    // matches Spark's truncating DIV and the row hashes bit-for-bit
    "q_jackknife" -> {
      val blkSql = Exact.md5LongSql("'jk|' || CAST(event_id AS VARCHAR)")
      s"""WITH r AS (
         |  SELECT event_type, ${Exact.centsSql("value")} AS x,
         |    $blkSql % $JkBlocks AS blk
         |  FROM events WHERE value IS NOT NULL),
         |blocks AS (
         |  SELECT event_type, blk, CAST(sum(x) AS BIGINT) AS s_b,
         |    count(*) AS n_b
         |  FROM r GROUP BY 1, 2),
         |totals AS (
         |  SELECT event_type, CAST(sum(s_b) AS BIGINT) AS s,
         |    CAST(sum(n_b) AS BIGINT) AS n, count(*) AS b_present
         |  FROM blocks GROUP BY 1),
         |jk AS (
         |  SELECT b.event_type, t.s, t.n, t.b_present,
         |    CASE WHEN t.n > b.n_b
         |      THEN (1000 * (t.s - b.s_b)) // (t.n - b.n_b) END AS m_b
         |  FROM blocks b JOIN totals t USING (event_type)),
         |agg AS (
         |  SELECT event_type, max(n) AS n_events,
         |    max((1000 * s) // n) AS mean_milli,
         |    max(b_present) AS n_blocks, count(m_b) AS n_jk,
         |    CAST(sum(m_b) AS BIGINT) AS sm,
         |    CAST(sum(m_b * m_b) AS BIGINT) AS sm2
         |  FROM jk GROUP BY 1)
         |SELECT event_type, n_events, mean_milli, n_blocks,
         |  CASE WHEN n_jk = $JkBlocks
         |    THEN ((${JkBlocks - 1} * ($JkBlocks * sm2 - sm * sm))
         |          // ${JkBlocks * JkBlocks}) END AS jk_var_milli2
         |FROM agg""".stripMargin
    },
    "stats_histogram_depth" ->
      s"""WITH r AS (
         |  SELECT ${Exact.centsSql("l_extendedprice")} AS x,
         |    row_number() OVER (ORDER BY ${Exact.centsSql("l_extendedprice")},
         |      l_orderkey, l_linenumber) AS rank
         |  FROM lineitem),
         |t AS (SELECT count(*) AS n FROM lineitem)
         |SELECT ($HistBuckets * (rank - 1)) // n AS bucket, count(*) AS n_rows,
         |  min(x) AS lo_cents, max(x) AS hi_cents
         |FROM r, t GROUP BY 1""".stripMargin,
    // identical integer edge rule (edge(b) = ceil(b*R/B) offsets), the
    // same floored per-bucket interpolation, and the same fan-out exact
    // side — every quantity integer, so the card hash-matches
    "stats_hist_eval" ->
      s"""WITH x AS (
         |  SELECT ${Exact.centsSql("l_extendedprice")} AS x FROM lineitem),
         |b AS (SELECT min(x) AS lo, max(x) AS hi FROM x),
         |h AS (
         |  SELECT ((x - lo) * $HistBuckets) // (hi - lo + 1) AS bucket,
         |    count(*) AS n_b
         |  FROM x, b GROUP BY 1),
         |f AS (SELECT CAST(unnest([${EvalFracs.mkString(", ")}]) AS BIGINT)
         |        AS f_milli),
         |e0 AS (
         |  SELECT f.f_milli, h.n_b, (b.hi - b.lo + 1) AS r,
         |    (h.bucket * (b.hi - b.lo + 1) + ${HistBuckets - 1}) // $HistBuckets
         |      AS e_lo,
         |    ((h.bucket + 1) * (b.hi - b.lo + 1) + ${HistBuckets - 1})
         |      // $HistBuckets AS e_hi
         |  FROM h, b, f),
         |est AS (
         |  SELECT f_milli,
         |    CAST(sum((n_b * least(greatest((r * f_milli) // 1000 - e_lo, 0),
         |                          e_hi - e_lo)) // (e_hi - e_lo)) AS BIGINT)
         |      AS est_rows
         |  FROM e0 GROUP BY 1),
         |act AS (
         |  SELECT f.f_milli,
         |    CAST(sum(CASE WHEN x.x - b.lo
         |        < ((b.hi - b.lo + 1) * f.f_milli) // 1000 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS actual_rows
         |  FROM x, b, f GROUP BY 1)
         |SELECT est.f_milli, est.est_rows, act.actual_rows,
         |  (1000 * abs(est.est_rows - act.actual_rows))
         |    // greatest(act.actual_rows, 1) AS err_milli
         |FROM est JOIN act ON est.f_milli = act.f_milli""".stripMargin)
}
