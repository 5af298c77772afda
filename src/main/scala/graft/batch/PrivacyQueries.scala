package graft.batch

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/**
 * Privacy governance over the document corpus — the release-gate pair a
 * training-data pipeline runs before publishing corpus metadata or
 * per-group statistics:
 *
 *  - [[qKAnonymity]]: the k-anonymity census — which quasi-identifier
 *    (QI) groups are so small that publishing them re-identifies their
 *    members. QI here = (lang, source, ⌊n_chars/100⌋ band): none of the
 *    columns is an identifier alone, their JOIN is the risk — the
 *    classic QI shape.
 *  - [[qAnonGeneralize]]: the fix — a fixed generalization LADDER per
 *    doc: release the finest grain whose corpus-wide population reaches
 *    [[AnonK]] (band → drop band → drop source → suppress). The chosen
 *    level is minimal and deterministic, so the release replays
 *    bit-identically.
 *
 * Guarantee (stated precisely): a level-L row's released tuple is shared
 * by ≥ K CORPUS rows at that grain — the "blend into at least K" bound
 * on the population census. That is the practical release gate for
 * per-group STATISTICS; an equivalence-class guarantee over the released
 * micro-table itself would additionally re-partition rows by their
 * released tuple (levels mix grains), which a deployment layers on the
 * same counts.
 *
 * Shape: both operators are count aggregates at bounded QI grains
 * (langs × sources × bands rows), broadcast back onto the doc list for
 * the per-doc level pick — one corpus scan each, nothing corpus-sized
 * shuffles. At 100 TB the census tables are the same kilobytes.
 */
object PrivacyQueries {

  /** Minimum group population for a QI tuple to be releasable. */
  val AnonK = 5L

  /** n_chars band width of the finest QI grain. */
  val BandChars = 100L

  private def withBand(df: DataFrame): DataFrame =
    df.withColumn("band", expr(s"n_chars DIV $BandChars"))

  /** The census: every (lang, source, band) group with its population and
    * the at-risk verdict (n < K). Bounded output at any corpus size. */
  def qKAnonymity(spark: SparkSession, dir: String): DataFrame =
    withBand(Tables.documents(spark, dir))
      .groupBy(col("lang"), col("source"), col("band"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("at_risk", col("n_docs") < AnonK)

  /** The ladder: per doc, the MINIMAL generalization level whose grain
    * population reaches K, and the released QI tuple at that level —
    * finer values nulled out. Level 3 (full suppression) exists for
    * corpora where even a whole language is tiny. */
  def qAnonGeneralize(spark: SparkSession, dir: String): DataFrame = {
    val d = withBand(Tables.documents(spark, dir))
      .select(col("doc_id"), col("lang"), col("source"), col("band"))
    val g0 = d.groupBy(col("lang"), col("source"), col("band"))
      .agg(count(lit(1)).as("n0"))
    val g1 = d.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n1"))
    val g2 = d.groupBy(col("lang")).agg(count(lit(1)).as("n2"))
    d.join(broadcast(g0), Seq("lang", "source", "band"))
      .join(broadcast(g1), Seq("lang", "source"))
      .join(broadcast(g2), Seq("lang"))
      .withColumn("anon_level",
        when(col("n0") >= AnonK, 0L).when(col("n1") >= AnonK, 1L)
          .when(col("n2") >= AnonK, 2L).otherwise(3L))
      .select(col("doc_id"), col("anon_level"),
        when(col("anon_level") <= 2, col("lang")).as("rel_lang"),
        when(col("anon_level") <= 1, col("source")).as("rel_source"),
        when(col("anon_level") <= 0, col("band")).as("rel_band"))
  }

  /** Minimum distinct sensitive values per releasable QI group. */
  val AnonL = 3L

  /** The l-diversity census — the homogeneity gate k-anonymity misses: a
    * group can hold ≥ K members yet reveal everything about them when all
    * K share ONE sensitive value (knowing someone is in the group leaks
    * the value without identifying the row). Sensitive attribute here:
    * the document's exact-content fingerprint ([[graft.functions.Exact.md5Long]]
    * of the text — the dedup family's content identity), so l counts how
    * many DISTINCT document contents a QI group blends across; l = 1
    * means group membership alone discloses the member's content.
    *
    * Output is the k-census frame widened with `l_distinct` and the
    * combined verdict (`n_docs ≥ K AND l ≥ L`). Shape: one two-level
    * aggregate (distinct-within-group), bounded (langs × sources × bands)
    * output — same kilobyte census at any corpus size. */
  def qLDiversity(spark: SparkSession, dir: String): DataFrame =
    withBand(Tables.documents(spark, dir))
      .withColumn("fp", graft.functions.Exact.md5Long(col("text")))
      .groupBy(col("lang"), col("source"), col("band"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("l_distinct"))
      .withColumn("releasable",
        col("n_docs") >= AnonK && col("l_distinct") >= AnonL)

  /** Percent of customers on the synthetic deletion list. */
  val DeletePct = 5L

  /** Right-to-be-forgotten impact audit — BEFORE a deletion batch runs,
    * the cascade census every governed warehouse wants: given a deletion
    * list of customers (here a deterministic [[DeletePct]]% hash sample —
    * at deployment, the actual request list), how many rows in each
    * downstream table are reachable from it through the FK graph
    * (customer → orders → lineitem; customer → events). One row per
    * table with total, affected, and affected_milli — the blast-radius
    * report that sizes the rewrite job and proves completeness (a table
    * missing from this report is a table the deletion forgot).
    *
    * Shape: deletion propagation is a chain of LEFT SEMI joins keyed on
    * each FK — the list broadcasts while request-sized; the derived
    * order-key list is materialized once (`localCheckpoint`) because two
    * counts read it. At 100 TB the same top-down key-list materialization
    * is exactly how deletion jobs stage their work. */
  def qForget(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact
    val del = Tables.customer(spark, dir).select(col("c_custkey"))
      .filter(pmod(Exact.md5Long(concat(lit("del|"), col("c_custkey"))),
        lit(100L)) < DeletePct)
      .localCheckpoint()
    val okeys = Tables.orders(spark, dir)
      .join(broadcast(del), col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey")).localCheckpoint()
    def card(table: String, total: DataFrame, affected: DataFrame): DataFrame =
      total.agg(count(lit(1)).as("n_rows"))
        .crossJoin(broadcast(affected.agg(count(lit(1)).as("n_affected"))))
        .select(lit(table).as("table_name"), col("n_rows"), col("n_affected"),
          expr("(1000 * n_affected) DIV n_rows").as("affected_milli"))
    val cust = card("customer", Tables.customer(spark, dir), del)
    val ords = card("orders", Tables.orders(spark, dir), okeys)
    val li = card("lineitem", Tables.lineitem(spark, dir),
      Tables.lineitem(spark, dir)
        .join(okeys, col("l_orderkey") === col("o_orderkey"), "left_semi"))
    val ev = card("events", Tables.events(spark, dir),
      Tables.events(spark, dir)
        .join(broadcast(del), col("user_id") === col("c_custkey"), "left_semi"))
    cust.unionByName(ords).unionByName(li).unionByName(ev)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_k_anonymity" -> (qKAnonymity _),
    "q_anon_generalize" -> (qAnonGeneralize _),
    "q_l_diversity" -> (qLDiversity _),
    "q_forget" -> (qForget _))

  val oracles: Map[String, String] = Map(
    "q_k_anonymity" ->
      s"""SELECT lang, source, n_chars // $BandChars AS band,
         |  count(*) AS n_docs, count(*) < $AnonK AS at_risk
         |FROM documents GROUP BY 1, 2, 3""".stripMargin,
    // the same three censuses; the level CASE is the identical minimal
    // pick, and the released tuple nulls exactly the generalized columns
    "q_anon_generalize" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, source, n_chars // $BandChars AS band
         |  FROM documents),
         |g0 AS (SELECT lang, source, band, count(*) AS n0 FROM d GROUP BY 1, 2, 3),
         |g1 AS (SELECT lang, source, count(*) AS n1 FROM d GROUP BY 1, 2),
         |g2 AS (SELECT lang, count(*) AS n2 FROM d GROUP BY 1),
         |lv AS (
         |  SELECT d.doc_id, d.lang, d.source, d.band,
         |    CASE WHEN g0.n0 >= $AnonK THEN 0
         |         WHEN g1.n1 >= $AnonK THEN 1
         |         WHEN g2.n2 >= $AnonK THEN 2 ELSE 3 END AS anon_level
         |  FROM d
         |  JOIN g0 ON d.lang = g0.lang AND d.source = g0.source AND d.band = g0.band
         |  JOIN g1 ON d.lang = g1.lang AND d.source = g1.source
         |  JOIN g2 ON d.lang = g2.lang)
         |SELECT doc_id, CAST(anon_level AS BIGINT) AS anon_level,
         |  CASE WHEN anon_level <= 2 THEN lang END AS rel_lang,
         |  CASE WHEN anon_level <= 1 THEN source END AS rel_source,
         |  CASE WHEN anon_level <= 0 THEN band END AS rel_band
         |FROM lv""".stripMargin,
    // the k-census grain with the distinct-fingerprint count and the
    // combined k AND l verdict — same md5-based content identity
    "q_l_diversity" ->
      s"""SELECT lang, source, n_chars // $BandChars AS band,
         |  count(*) AS n_docs,
         |  count(DISTINCT ${graft.functions.Exact.md5LongSql("text")}) AS l_distinct,
         |  count(*) >= $AnonK
         |    AND count(DISTINCT ${graft.functions.Exact.md5LongSql("text")}) >= $AnonL
         |    AS releasable
         |FROM documents GROUP BY 1, 2, 3""".stripMargin,
    // same hash-derived deletion list, same FK reachability chain
    "q_forget" ->
      s"""WITH del AS (
         |  SELECT c_custkey FROM customer
         |  WHERE ${graft.functions.Exact.md5LongSql("'del|' || CAST(c_custkey AS VARCHAR)")}
         |    % 100 < $DeletePct),
         |oa AS (
         |  SELECT o_orderkey FROM orders
         |  WHERE o_custkey IN (SELECT c_custkey FROM del))
         |SELECT 'customer' AS table_name,
         |  (SELECT count(*) FROM customer) AS n_rows,
         |  (SELECT count(*) FROM del) AS n_affected,
         |  (1000 * (SELECT count(*) FROM del)) // (SELECT count(*) FROM customer) AS affected_milli
         |UNION ALL SELECT 'orders',
         |  (SELECT count(*) FROM orders), (SELECT count(*) FROM oa),
         |  (1000 * (SELECT count(*) FROM oa)) // (SELECT count(*) FROM orders)
         |UNION ALL SELECT 'lineitem',
         |  (SELECT count(*) FROM lineitem),
         |  (SELECT count(*) FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM oa)),
         |  (1000 * (SELECT count(*) FROM lineitem WHERE l_orderkey IN (SELECT o_orderkey FROM oa)))
         |    // (SELECT count(*) FROM lineitem)
         |UNION ALL SELECT 'events',
         |  (SELECT count(*) FROM events),
         |  (SELECT count(*) FROM events WHERE user_id IN (SELECT c_custkey FROM del)),
         |  (1000 * (SELECT count(*) FROM events WHERE user_id IN (SELECT c_custkey FROM del)))
         |    // (SELECT count(*) FROM events)""".stripMargin)
}
