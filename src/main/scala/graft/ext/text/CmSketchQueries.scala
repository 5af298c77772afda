package graft.ext.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/**
 * Count-Min sketch over the corpus bigram stream (Cormode & Muthukrishnan,
 * "An improved data stream summary: the count-min sketch and its
 * applications", J. Algorithms 2005) — the engine's bounded-memory
 * frequency table: [[Depth]] hash rows × [[Width]] counters answer "how
 * often did feature x occur" for ANY x with one-sided error
 * (est ≥ exact, overcount ≤ 2N/Width w.h.p.), in Depth·Width integers of
 * state however large the corpus.
 *
 * Why next to the exact heavy-hitter census (text_heavy_hitters): the
 * exact census answers only "what are the top keys"; the CM table answers
 * point queries for EVERY key — including ones chosen after the scan —
 * and MERGES by cell-wise addition (per-shard tables sum to the global
 * table), the same persisted-artifact lifecycle as the KMV sketch. And
 * unlike Spark's built-in CountMinSketch (whose murmur seeding is
 * engine-private), this one is built from the engine's md5 hash family —
 * pure integer counts, so the sketch TABLE ITSELF passes the DuckDB hash
 * gate, as does every estimate read off it.
 *
 * Scale shape: the build is ONE map-side-combinable aggregate of the
 * feature stream onto a (Depth × Width)-bounded key space — the exchange
 * carries ≤ Depth·Width rows per map partition; the estimate pass joins
 * the K query keys against the broadcast-sized table; the merge proof
 * re-aggregates per-source tables by cell. Nothing downstream of the
 * feature scan exceeds kilobytes.
 */
object CmSketchQueries {

  /** Hash rows — error probability decays as 2^−Depth. */
  val Depth = 4
  /** Counters per row — overcount bound is 2·N/Width in expectation. */
  val Width = 256L
  /** Point queries evaluated in the calibration card. */
  val EvalTopK = 16

  /** The corpus bigram multiset — the same zip-slice feature stream the
    * LM/DSIR families count (one token definition suite-wide). */
  private def bigrams(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.rebalanced(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), TextNorm.toks(col("text")).as("t"))
    val len = greatest(size(col("t")) - 1, lit(0))
    val zipped = arrays_zip(
      slice(col("t"), lit(1), len).as("w1"),
      slice(col("t"), lit(2), len).as("w2"))
    docs.select(col("source"), explode(zipped).as("z"))
      .select(col("source"),
        concat(col("z.w1"), lit(" "), col("z.w2")).as("bg"))
  }

  /** Row-j bucket of a bigram — Depth independent md5 functions. */
  private def bucket(j: org.apache.spark.sql.Column,
                     bg: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(Exact.md5Long28(concat(lit("cm"), j, lit("|"), bg)), lit(Width))

  /** The (j, bucket) fan-out of the feature stream: each bigram occurrence
    * increments one counter per hash row. A narrow Depth× explode —
    * no shuffle until the bounded aggregate. */
  private def cells(spark: SparkSession, dir: String): DataFrame =
    bigrams(spark, dir)
      .select(col("source"), col("bg"),
        explode(array((0 until Depth).map(j => lit(j.toLong)): _*)).as("j"))
      .select(col("source"), col("j"), bucket(col("j"), col("bg")).as("bucket"))

  /** The sketch table — the persisted artifact. Only cells that were hit
    * appear (a zero counter is an absent row; estimates coalesce to 0). */
  def qCmCounters(spark: SparkSession, dir: String): DataFrame =
    counters(spark, dir)

  private[graft] def counters(spark: SparkSession, dir: String): DataFrame =
    graft.util.SnapshotCache.snapshot("cm_counters", spark, dir)(
      countersRaw(spark, dir))

  /** The snapshot's BUILD pipeline (audited in PLANS.md). */
  private[graft] def countersRaw(spark: SparkSession, dir: String): DataFrame =
    cells(spark, dir)
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("n"))

  /** Calibration card: the [[EvalTopK]] exact-top bigrams point-queried
    * through the sketch. est = min over rows of the addressed counter;
    * overcount = est − exact is ≥ 0 BY CONSTRUCTION (every occurrence of
    * the key incremented each addressed cell; collisions only add). The
    * card makes the ε-bound a measured number, the ann_eval discipline. */
  def qCmEval(spark: SparkSession, dir: String): DataFrame = {
    val topk = bigrams(spark, dir)
      .groupBy(col("bg")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("bg")).limit(EvalTopK)
    val est = topk
      .select(col("bg"), col("exact_n"),
        explode(array((0 until Depth).map(j => lit(j.toLong)): _*)).as("j"))
      .withColumn("bucket", bucket(col("j"), col("bg")))
      .join(broadcast(counters(spark, dir)), Seq("j", "bucket"), "left")
      .groupBy(col("bg"))
      .agg(max(col("exact_n")).as("exact_n"),
        min(coalesce(col("n"), lit(0L))).as("est_n"))
    est.select(col("bg"), col("exact_n"), col("est_n"),
      (col("est_n") - col("exact_n")).as("overcount"))
  }

  /** Mergeability proof under the gate: per-source sketch tables (the
    * thing each ingest shard persists) summed cell-wise must equal the
    * global table — counters are linear. One summary row; mismatch = 0
    * is the claim. */
  def qCmMerge(spark: SparkSession, dir: String): DataFrame = {
    val global = counters(spark, dir)
    val merged = cells(spark, dir)
      .groupBy(col("source"), col("j"), col("bucket"))
      .agg(count(lit(1)).as("n"))                     // per-shard artifacts
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("n")).as("n_merged"))              // cell-wise merge
    merged.join(global, Seq("j", "bucket"), "full")
      .groupBy()
      .agg(count(lit(1)).as("n_cells"),
        sum(when(coalesce(col("n_merged"), lit(-1L)) =!=
          coalesce(col("n"), lit(-2L)), 1L).otherwise(0L)).as("n_mismatch"),
        sum(col("n")).as("l1_global"),
        sum(col("n_merged")).as("l1_merged"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_cm_counters" -> (qCmCounters _),
    "text_cm_eval"     -> (qCmEval _),
    "text_cm_merge"    -> (qCmMerge _))

  private val toksSql = TextNorm.toksSql

  /** Shared CTEs: the bigram stream and the sketch table — one truth for
    * all three gates (the weightsCtes discipline). */
  private val cmCtes: String =
    s"""bg AS MATERIALIZED (
       |  SELECT source,
       |    unnest([array_to_string(t[i:i+1], ' ')
       |            for i in generate_series(1, len(t)-1)]) AS bg
       |  FROM (SELECT source, $toksSql AS t FROM documents)
       |  WHERE len(t) >= 2),
       |cells AS MATERIALIZED (
       |  SELECT source,
       |    ${Exact.md5Long28Sql("'cm' || CAST(j AS VARCHAR) || '|' || bg")}
       |      % $Width AS bucket,
       |    CAST(j AS BIGINT) AS j
       |  FROM bg, generate_series(0, ${Depth - 1}) t(j)),
       |cm AS MATERIALIZED (
       |  SELECT j, bucket, count(*) AS n FROM cells GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_cm_counters" ->
      s"""WITH $cmCtes
         |SELECT j, bucket, n FROM cm""".stripMargin,
    "text_cm_eval" ->
      s"""WITH $cmCtes,
         |topk AS (
         |  SELECT bg, count(*) AS exact_n FROM bg
         |  GROUP BY 1 ORDER BY exact_n DESC, bg LIMIT $EvalTopK),
         |est AS (
         |  SELECT t.bg, max(t.exact_n) AS exact_n,
         |    CAST(min(coalesce(cm.n, 0)) AS BIGINT) AS est_n
         |  FROM topk t
         |  CROSS JOIN generate_series(0, ${Depth - 1}) g(j)
         |  LEFT JOIN cm ON cm.j = g.j AND cm.bucket =
         |    ${Exact.md5Long28Sql("'cm' || CAST(g.j AS VARCHAR) || '|' || t.bg")}
         |      % $Width
         |  GROUP BY 1)
         |SELECT bg, exact_n, est_n, est_n - exact_n AS overcount
         |FROM est""".stripMargin,
    "text_cm_merge" ->
      s"""WITH $cmCtes,
         |shard AS (
         |  SELECT source, j, bucket, count(*) AS n FROM cells GROUP BY 1, 2, 3),
         |merged AS (
         |  SELECT j, bucket, CAST(sum(n) AS BIGINT) AS n_merged
         |  FROM shard GROUP BY 1, 2)
         |SELECT count(*) AS n_cells,
         |  CAST(sum(CASE WHEN coalesce(m.n_merged, -1) <> coalesce(cm.n, -2)
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatch,
         |  CAST(sum(cm.n) AS BIGINT) AS l1_global,
         |  CAST(sum(m.n_merged) AS BIGINT) AS l1_merged
         |FROM merged m FULL JOIN cm USING (j, bucket)""".stripMargin)
}
