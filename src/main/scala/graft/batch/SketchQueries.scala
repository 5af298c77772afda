package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Exact, VectorFunctions}
import graft.sources.Tables

/**
 * Bounded-state order-statistic operators built on the native
 * [[graft.functions.BottomKPairs]] aggregate: deterministic per-group
 * sampling and the KMV (k-minimum-values) distinct-count sketch
 * (Bar-Yossef et al., "Counting distinct elements in a data stream",
 * RANDOM 2002 — the estimator (k−1)·RANGE/h_k over the k smallest hash
 * values).
 *
 * Why this family exists next to approx_count_distinct: Spark's HLL is
 * float-scored and engine-private, so it can only ever be spec-gated
 * against a tolerance (q_approx_distinct). KMV over the engine's md5 hash
 * is pure INTEGER order statistics — deterministic, DuckDB-replayable,
 * hash-gated like every exact operator — while still being a true
 * bounded-sketch: O(k) state per group through partial aggregation, and
 * MERGEABLE (union two sketches, re-cut to k — exactly the bottom-k of
 * the union, since any global bottom-k member is in its own partition's
 * bottom-k). That mergeability is the 100 TB story: per-day/per-shard
 * sketch artifacts roll up over any date range without rescanning raw
 * data, the same persisted-artifact lifecycle as q_sketch_rollup but with
 * a hash-gateable estimator.
 *
 * Hash width: 48-bit md5 ([[Exact.md5Long48]]), so the estimator
 * numerator (k−1)·2^48 stays far inside BIGINT with NO overflow-driven
 * precision split. 48 bits keep collision bias < 0.1% up to ~10M distinct
 * per group; beyond that widen to the 60-bit hash with split-multiply
 * arithmetic (documented trade, not a silent cap).
 */
object SketchQueries {

  /** Per-group sample size for [[qGroupSample]]. */
  val SampleK = 16

  /** Sketch size for the KMV estimator — k=64 gives ~1/√62 ≈ 13% relative
    * standard error; the calibration columns measure the actual error. */
  val KmvK = 64

  /** 2^48 — the md5Long48 hash range, the estimator's RANGE constant. */
  val HashRange: Long = 1L << 48

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)

  /** Deterministic uniform k-sample PER GROUP in one bounded aggregate —
    * the RNG-free twin of `TABLESAMPLE` stratified by group. key = md5
    * hash of the row id, value = the row id; the k smallest hashes are a
    * uniform sample of the group, and resampling is a salt change.
    *
    * This is the operator where the native aggregate's shape pays: the
    * window idiom (`row_number() OVER (PARTITION BY g ORDER BY h) <= k`)
    * shuffles and SORTS every event row; this plan's exchange carries at
    * most [[SampleK]] pairs per group per map partition — O(groups·k)
    * bytes whatever the fact size. The oracle replays the window form:
    * same rows, two plans, one truth. */
  def qGroupSample(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        Exact.md5Long48(concat(lit("gs|"), col("event_id"))).as("h"),
        col("event_id"))
      .groupBy(col("event_type"))
      .agg(VectorFunctions.bottomKPairs(col("h"), col("event_id"), SampleK)
        .as("sample"))
      .select(col("event_type"), posexplode(col("sample")).as(Seq("pos", "p")))
      .select(col("event_type"), (col("pos") + 1L).cast("long").as("rank"),
        col("p.key").as("h"), col("p.value").as("event_id"))

  /** KMV distinct-user estimate per event type, with its calibration
    * columns (exact distinct + per-mille error) — the ann_eval
    * discipline: a sketch never ships without its measured error.
    *
    * The aggregate's SET semantics (distinct pairs) are load-bearing:
    * KMV is an order statistic of the distinct hash SET, and the buffer
    * dedups duplicate user hashes at O(log k) per row. Groups with fewer
    * than k distinct hashes report their exact hash count (h_k is null —
    * the estimator branch is closed, the count IS the cardinality). */
  def qKmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val h = Exact.md5Long48(concat(lit("kmv|"), col("user_id")))
    events(spark, dir).filter(col("user_id").isNotNull)
      .select(col("event_type"), col("user_id"), h.as("h"))
      .groupBy(col("event_type"))
      .agg(VectorFunctions.bottomKPairs(col("h"), col("h"), KmvK).as("sk"),
        countDistinct(col("user_id")).as("n_exact"))
      .withColumn("n_sketch", size(col("sk")).cast("long"))
      .withColumn("h_k",
        when(col("n_sketch") === KmvK,
          element_at(col("sk"), KmvK).getField("key")))
      .withColumn("est_distinct",
        when(col("n_sketch") < KmvK, col("n_sketch"))
          .otherwise(expr(s"(${KmvK - 1L} * ${HashRange}L) DIV h_k")))
      .withColumn("err_milli",
        expr("(1000 * abs(est_distinct - n_exact)) DIV n_exact"))
      .select(col("event_type"), col("n_exact"), col("n_sketch"), col("h_k"),
        col("est_distinct"), col("err_milli"))
  }

  /** Sketch MERGE across partition artifacts: per-day KMV sketches (the
    * thing a deployment persists next to each daily parquet partition)
    * unioned and re-cut to one global estimate — no raw-data rescan. The
    * merge is relational: explode the member arrays, re-aggregate with
    * the same bottom-k. Correct because bottom-k is a semilattice:
    * bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)).
    *
    * One summary row: days merged, members carried into the merge, the
    * merged estimate, the exact global distinct, per-mille error. The
    * exact column is the truth anchor — at 100 TB it's the one you DON'T
    * compute (that's the sketch's job); here it gates the estimator. */
  def qKmvMerge(spark: SparkSession, dir: String): DataFrame = {
    val h = Exact.md5Long48(concat(lit("kmv|"), col("user_id")))
    val base = events(spark, dir).filter(col("user_id").isNotNull)
    val daily = base
      .select(to_date(col("ts")).as("day"), h.as("h"))
      .groupBy(col("day"))
      .agg(VectorFunctions.bottomKPairs(col("h"), col("h"), KmvK).as("sk"))
    val merged = daily
      .select(col("day"), explode(col("sk")).as("p"))
      .select(col("day"), col("p.key").as("h"))
      .groupBy()
      .agg(countDistinct(col("day")).as("n_days"),
        count(lit(1)).as("n_members"),
        VectorFunctions.bottomKPairs(col("h"), col("h"), KmvK).as("sk"))
    val exact = base.groupBy()
      .agg(countDistinct(col("user_id")).as("n_exact"))
    merged.crossJoin(broadcast(exact))
      .withColumn("n_sketch", size(col("sk")).cast("long"))
      .withColumn("h_k",
        when(col("n_sketch") === KmvK,
          element_at(col("sk"), KmvK).getField("key")))
      .withColumn("est_distinct",
        when(col("n_sketch") < KmvK, col("n_sketch"))
          .otherwise(expr(s"(${KmvK - 1L} * ${HashRange}L) DIV h_k")))
      .withColumn("err_milli",
        expr("(1000 * abs(est_distinct - n_exact)) DIV n_exact"))
      .select(col("n_days"), col("n_members"), col("n_sketch"), col("h_k"),
        col("est_distinct"), col("n_exact"), col("err_milli"))
  }

  /** History depth for [[qRecentEvents]]. */
  val RecentK = 16

  /** Last-[[RecentK]] events per user — the feature-store "recent history
    * per entity" primitive every sequence-feature pipeline materializes
    * (recommender interaction histories, fraud velocity windows, session
    * prefill). key = NEGATED event-time micros, so the bottom-k buffer
    * holds the LATEST k with the same bounded state: this is the raw-grain
    * workload where the native aggregate's shape pays — the fact table
    * never sorts, and the exchange carries ≤ k (time, id) pairs per user
    * per map partition instead of every event a user ever produced. The
    * window twin (which the oracle replays) must move and per-group sort
    * the full history. Ties (same micro) break on event_id — a total
    * order, so the history replays bit-identically. */
  def qRecentEvents(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), (-unix_micros(col("ts"))).as("negts"),
        col("event_id"))
      .groupBy(col("user_id"))
      .agg(VectorFunctions.bottomKPairs(col("negts"), col("event_id"), RecentK)
        .as("hist"))
      .select(col("user_id"), posexplode(col("hist")).as(Seq("pos", "p")))
      .select(col("user_id"), (col("pos") + 1L).cast("long").as("rank"),
        col("p.value").as("event_id"), (-col("p.key")).as("ts_micros"))

  /** Estimator rows for the AMS F2 sketch — median over [[F2Rows]]
    * independent ±1 sums; error decays as 1/√rows. */
  val F2Rows = 8

  /** AMS "tug-of-war" F2 sketch (Alon, Matias & Szegedy, STOC 1996): the
    * second frequency moment F2 = Σ_u c_u² of the user-activity
    * distribution — the self-join size, THE number a query planner wants
    * before joining a table with itself on a skewed key — estimated in
    * [[F2Rows]] longs of state: per estimator row j, S_j = Σ_rows
    * sign_j(user) with md5-derived ±1 signs, E[S_j²] = F2 exactly; the
    * lower median of the S_j² de-noises. Completes the engine's sketch
    * algebra: KMV (how many distinct), CM (how often is x), AMS (how
    * skewed) — all three pure integer, md5-seeded, hash-gateable, and
    * LINEAR (per-shard S_j vectors add), unlike the engine-private
    * float sketches they stand in for.
    *
    * The card ships its truth anchor: exact F2 via the count-of-counts
    * contraction (the q_skew_metrics discipline — the |users|-sized
    * count frame collapses before anything global) and the per-mille
    * error. BIGINT is exact here (|S_j| ≤ N so S_j² ≤ 10¹⁰ at bench
    * scale); at trillion-row scale the squares move to decimal(38,0)
    * accumulators — the q_drift_tv swap, same plan.
    *
    * Shape: ONE map-side-combinable aggregate produces all [[F2Rows]]
    * sums as conditional-sum columns (codegen'd, no explode — the fact
    * is scanned once, narrow); the exact side is two bounded aggregates;
    * everything downstream is ≤ [[F2Rows]] rows. */
  def qF2Sketch(spark: SparkSession, dir: String): DataFrame = {
    val base = events(spark, dir).filter(col("user_id").isNotNull)
    val sumCols = count(lit(1)).as("n_rows") +:
      (0 until F2Rows).map { j =>
        sum(when(pmod(Exact.md5Long28(
          concat(lit(s"ams$j|"), col("user_id"))), lit(2L)) === 0L, 1L)
          .otherwise(-1L)).as(s"s$j")
      }
    val sums = base.groupBy().agg(sumCols.head, sumCols.tail: _*)
    val ests = sums.select(col("n_rows"),
      sort_array(array((0 until F2Rows).map(j =>
        col(s"s$j") * col(s"s$j")): _*)).as("e"))
    val exact = base.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .groupBy().agg(sum(col("c") * col("c")).as("exact_f2"))
    ests.crossJoin(broadcast(exact))
      .withColumn("est_f2", element_at(col("e"), F2Rows / 2))
      .withColumn("err_milli",
        expr("(1000 * abs(est_f2 - exact_f2)) DIV exact_f2"))
      .select(col("n_rows"), col("exact_f2"), col("est_f2"), col("err_milli"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_group_sample"  -> (qGroupSample _),
    "q_recent_events" -> (qRecentEvents _),
    "q_kmv_distinct"  -> (qKmvDistinct _),
    "q_kmv_merge"     -> (qKmvMerge _),
    "q_f2_sketch"     -> (qF2Sketch _))

  private def hSql(salt: String, expr: String): String =
    Exact.md5Long48Sql(s"'$salt|' || CAST($expr AS VARCHAR)")

  private def hSql28(salt: String, expr: String): String =
    Exact.md5Long28Sql(s"'$salt|' || CAST($expr AS VARCHAR)")

  val oracles: Map[String, String] = Map(
    // the window replay of the bounded aggregate: same hash, same
    // (h, id) total order, same k cut. DISTINCT makes the SET semantics
    // explicit: the Spark aggregate ranks distinct (h, event_id) pairs,
    // so a duplicated event ROW must not shift oracle ranks (r11 ADVICE
    // — the fixture happens to have unique event_ids, but the contract
    // should not lean on that)
    "q_group_sample" ->
      s"""WITH r AS (
         |  SELECT event_type, h, event_id,
         |    CAST(row_number() OVER (PARTITION BY event_type
         |      ORDER BY h, event_id) AS BIGINT) AS rank
         |  FROM (SELECT DISTINCT event_type,
         |          ${hSql("gs", "event_id")} AS h, event_id
         |        FROM events) d)
         |SELECT event_type, rank, h, event_id
         |FROM r WHERE rank <= $SampleK""".stripMargin,
    "q_kmv_distinct" ->
      s"""WITH h AS (
         |  SELECT DISTINCT event_type, ${hSql("kmv", "user_id")} AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |ex AS (
         |  SELECT event_type, count(DISTINCT user_id) AS n_exact
         |  FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         |r AS (
         |  SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk,
         |    count(*) OVER (PARTITION BY event_type) AS nh
         |  FROM h),
         |sk AS (
         |  SELECT event_type,
         |    CAST(least(max(nh), $KmvK) AS BIGINT) AS n_sketch,
         |    max(CASE WHEN rk = $KmvK THEN h END) AS h_k
         |  FROM r WHERE rk <= $KmvK GROUP BY 1),
         |est AS (
         |  SELECT s.event_type, e.n_exact, s.n_sketch, s.h_k,
         |    CASE WHEN s.n_sketch < $KmvK THEN s.n_sketch
         |         ELSE (${KmvK - 1L} * $HashRange) // s.h_k END AS est_distinct
         |  FROM sk s JOIN ex e USING (event_type))
         |SELECT event_type, n_exact, n_sketch, h_k, est_distinct,
         |  (1000 * abs(est_distinct - n_exact)) // n_exact AS err_milli
         |FROM est""".stripMargin,
    // the window replay of the latest-k history: same (ts desc, id asc)
    // total order, same k cut, same micro epoch
    "q_recent_events" ->
      s"""WITH r AS (
         |  SELECT user_id, event_id, epoch_us(ts) AS ts_micros,
         |    CAST(row_number() OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts) DESC, event_id) AS BIGINT) AS rank
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
         |SELECT user_id, rank, event_id, ts_micros
         |FROM r WHERE rank <= $RecentK""".stripMargin,
    // identical ±1 hash signs, identical lower-median pick (OFFSET
    // rows/2−1 of the ascending squares), identical count-of-counts
    // exact side
    "q_f2_sketch" -> {
      val sCols = (0 until F2Rows).map { j =>
        s"""CAST(sum(CASE WHEN ${hSql28(s"ams$j", "user_id")} % 2 = 0
           | THEN 1 ELSE -1 END) AS BIGINT) AS s$j""".stripMargin.replace("\n", "")
      }.mkString(",\n    ")
      val squares = (0 until F2Rows).map(j => s"s$j * s$j").mkString(", ")
      s"""WITH b AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
         |s AS (
         |  SELECT count(*) AS n_rows,
         |    $sCols
         |  FROM b),
         |e AS (SELECT unnest([$squares]) AS est FROM s),
         |med AS (SELECT est AS est_f2 FROM e ORDER BY est
         |        LIMIT 1 OFFSET ${F2Rows / 2 - 1}),
         |ex AS (
         |  SELECT CAST(sum(c * c) AS BIGINT) AS exact_f2
         |  FROM (SELECT count(*) AS c FROM b GROUP BY user_id))
         |SELECT s.n_rows, ex.exact_f2, med.est_f2,
         |  (1000 * abs(med.est_f2 - ex.exact_f2)) // ex.exact_f2 AS err_milli
         |FROM s, ex, med""".stripMargin
    },
    // per-day cut FIRST, then union + re-cut — replaying the merge path,
    // not just the end state, so the semilattice claim itself is gated
    "q_kmv_merge" ->
      s"""WITH h AS (
         |  SELECT DISTINCT CAST(ts AS DATE) AS day,
         |    ${hSql("kmv", "user_id")} AS h
         |  FROM events WHERE user_id IS NOT NULL),
         |d AS (
         |  SELECT day, h,
         |    row_number() OVER (PARTITION BY day ORDER BY h) AS rk
         |  FROM h),
         |members AS (SELECT day, h FROM d WHERE rk <= $KmvK),
         |m AS (
         |  SELECT DISTINCT h FROM members),
         |g AS (
         |  SELECT h, row_number() OVER (ORDER BY h) AS rk FROM m),
         |card AS (
         |  SELECT CAST(count(DISTINCT day) AS BIGINT) AS n_days,
         |    CAST(count(*) AS BIGINT) AS n_members
         |  FROM members),
         |sk AS (
         |  SELECT CAST(least(count(*), $KmvK) AS BIGINT) AS n_sketch,
         |    max(CASE WHEN rk = $KmvK THEN h END) AS h_k
         |  FROM g WHERE rk <= $KmvK),
         |ex AS (
         |  SELECT count(DISTINCT user_id) AS n_exact
         |  FROM events WHERE user_id IS NOT NULL),
         |est AS (
         |  SELECT c.n_days, c.n_members, s.n_sketch, s.h_k,
         |    CASE WHEN s.n_sketch < $KmvK THEN s.n_sketch
         |         ELSE (${KmvK - 1L} * $HashRange) // s.h_k END AS est_distinct,
         |    e.n_exact
         |  FROM card c, sk s, ex e)
         |SELECT n_days, n_members, n_sketch, h_k, est_distinct, n_exact,
         |  (1000 * abs(est_distinct - n_exact)) // n_exact AS err_milli
         |FROM est""".stripMargin)
}
