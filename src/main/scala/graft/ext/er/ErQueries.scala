package graft.ext.er

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ext.dedup.DedupQueries
import graft.sources.Tables

/**
 * Entity resolution over a dirty dimension: blocked fuzzy matching
 * (levenshtein) plus canonicalization of the match graph — the "merge
 * near-identical entity names" step every large-scale pipeline runs over
 * scraped product/author/site catalogs before joining facts against them.
 * The reference's dimension enrichment (kafka_spark_etl.py:100-120 joins a
 * clean in-memory dim) assumes exact keys; this family is what produces
 * those clean keys from dirty input.
 *
 * Scale shape — the standard two-phase ER plan:
 *
 *  1. VOCABULARY CONTRACTION: entities dedupe to their distinct surface
 *     forms first (`groupBy(p_name)`), so everything downstream runs on a
 *     vocabulary-sized frame, never the fact table. At 100 TB the fact
 *     side may be billions of rows; distinct entity names are millions —
 *     the aggregate is the only full-data pass.
 *  2. BLOCKED SELF-JOIN: candidate pairs come from an equi-join on a
 *     cheap blocking key (here: first character; production uses several
 *     redundant keys — prefix, phonetic code, length band — unioned so a
 *     true match must only survive in ONE block). The expensive edit
 *     distance evaluates exclusively on blocked candidates, inside one
 *     whole-stage-codegen'd filter over the join — never all-pairs. The
 *     vocabulary-sized build side broadcasts; with an entity vocabulary
 *     too large for one executor, drop the hint and the same plan
 *     shuffle-joins on the block key (block sizes, not vocab², bound the
 *     work either way).
 *
 * Canonicalization reuses the dedup family's connected-components kernel
 * ([[DedupQueries.components]]) directly on the string-keyed match graph —
 * min-label propagation is type-agnostic — so fuzzy-match clusters
 * collapse with the same O(rounds × one join + one aggregate) loop,
 * checkpoint discipline included, as the document near-dup graph.
 */
object ErQueries {

  /** Maximum levenshtein distance for a candidate pair to count as a
    * fuzzy match. 3 absorbs one short-word substitution in a two-word
    * name; the threshold is a constant of the gate, not tuned per run. */
  val ErMaxDist = 3

  /** The entity vocabulary: one row per distinct surface form with its
    * occurrence count and a stable representative key (min part key —
    * deterministic, so every engine elects the same representative). */
  private def nameStats(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("rep_key"))

  /** The vocabulary with its blocking key, contracted from the fact table
    * ONCE and checkpointed — the fact aggregate is the dominant cost at
    * scale, so every layer of one query invocation shares this frame
    * rather than re-deriving it (fuzzy → canonical → resolve would
    * otherwise each run their own full-data pass). */
  private def namesCk(spark: SparkSession, dir: String): DataFrame =
    nameStats(spark, dir)
      .withColumn("blk", substring(col("p_name"), 1, 1))
      .localCheckpoint()

  /** Fuzzy-match candidate pairs from an already-materialized vocabulary:
    * blocked levenshtein self-join. Output is one row per matched
    * (name_a < name_b) pair with the edit distance and both occurrence
    * counts — the edge list of the match graph. */
  private def fuzzyFrom(names: DataFrame): DataFrame = {
    val lhs = names.select(col("blk"), col("p_name").as("name_a"),
      col("n_parts").as("n_parts_a"))
    val rhs = names.select(col("blk"), col("p_name").as("name_b"),
      col("n_parts").as("n_parts_b"))
    lhs.join(broadcast(rhs), Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      // levenshtein runs on blocked candidates only, pipelined inside the
      // join's output — cast to long so the schema matches DuckDB's BIGINT
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= ErMaxDist)
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_parts_a"), col("n_parts_b"))
  }

  def qErFuzzy(spark: SparkSession, dir: String): DataFrame =
    fuzzyFrom(namesCk(spark, dir))

  /** Canonical entity assignment: collapse the fuzzy-match graph to
    * connected components (min-label propagation — transitive closure, so
    * a↔b and b↔c merge even when a↔c misses the distance cut) and map
    * every surface form to its component's lexicographic-min name.
    * Unmatched names are their own canonical form. One row per distinct
    * name: the lookup table that rewrites the dirty dimension. */
  private def canonicalFrom(names: DataFrame): DataFrame = {
    val pairs = fuzzyFrom(names).select(col("name_a"), col("name_b"))
    // component labels ARE names here: min-label propagation is
    // type-agnostic (least() on strings), so the kernel reuses verbatim
    val comp = DedupQueries.components(pairs, "name_a", "name_b")
      .select(col("id").as("p_name"), col("label").as("canon"))
    names
      .join(comp, Seq("p_name"), "left")
      .select(col("p_name"),
        coalesce(col("canon"), col("p_name")).as("canonical_name"),
        col("n_parts"), col("rep_key"))
      .withColumn("is_canonical", col("p_name") === col("canonical_name"))
  }

  def qErCanonical(spark: SparkSession, dir: String): DataFrame =
    canonicalFrom(namesCk(spark, dir))

  /** The payoff step: the fact table re-aggregated by CANONICAL entity —
    * what the whole family exists to make correct. Per canonical name:
    * how many surface variants merged into it, total fact rows, exact
    * revenue cents, max size. Without the merge, the 'rod'/'bolt'/'ring'
    * variants of one entity each under-report; after it, one row per
    * real-world entity. The canonical map (vocabulary-sized) broadcasts
    * into the fact scan — at 100 TB this is a map-side dictionary rewrite
    * followed by one aggregate on the (smaller) canonical key space;
    * nothing new shuffles beyond the aggregate itself. */
  def qErResolve(spark: SparkSession, dir: String): DataFrame = {
    val canon = canonicalFrom(namesCk(spark, dir))
      .select(col("p_name"), col("canonical_name"))
    Tables.part(spark, dir)
      .join(broadcast(canon), Seq("p_name"))
      .groupBy(col("canonical_name"))
      .agg(countDistinct(col("p_name")).as("n_variants"),
        count(lit(1)).as("n_parts"),
        sum(graft.functions.Exact.cents(col("p_retailprice"))).as("retail_cents"),
        max(col("p_size")).as("max_size"))
  }

  /** In-engine calibration of the blocking key: the blocked match pairs
    * ([[qErFuzzy]], verbatim) against ALL-PAIRS levenshtein ground truth
    * over the vocabulary — recall (true matches whose pair survived in
    * the block) and precision as integer milli-ratios, one summary row.
    * A true match that differs in its FIRST character never shares a
    * first-char block, so blocking recall < 1000‰ is exactly the number
    * this report exists to surface before a deployment trusts the key
    * (production unions several redundant keys until recall holds).
    *
    * Scale shape: truth is a vocabulary² comparison — affordable only
    * because the vocabulary is the contracted frame (names ≪ facts); at
    * a vocabulary too large for that, the truth side runs over a sampled
    * stratum, same reasoning as dedup_minhash_eval. The comparison
    * itself is one pair-keyed full-outer join + a global aggregate over
    * two match-graph-sized frames. */
  def qErBlockingEval(spark: SparkSession, dir: String): DataFrame = {
    val names = namesCk(spark, dir)
    val truth = names.select(col("p_name").as("name_a"))
      .join(broadcast(names.select(col("p_name").as("name_b"))),
        col("name_a") < col("name_b"))
      .filter(levenshtein(col("name_a"), col("name_b")) <= ErMaxDist)
      .select(col("name_a"), col("name_b"), lit(1L).as("is_true"))
    val blocked = fuzzyFrom(names)
      .select(col("name_a"), col("name_b"), lit(1L).as("is_blocked"))
    // outer coalesce: a vocabulary with no fuzzy matches leaves both pair
    // frames empty, and the global agg's all-NULL row must read as zeros
    // (the oracle's scalar COUNT(*) form does)
    truth.join(blocked, Seq("name_a", "name_b"), "full_outer")
      .agg(
        coalesce(sum(coalesce(col("is_true"), lit(0L))), lit(0L)).as("n_true_pairs"),
        coalesce(sum(coalesce(col("is_blocked"), lit(0L))), lit(0L)).as("n_blocked_pairs"),
        coalesce(sum(coalesce(col("is_true"), lit(0L)) * coalesce(col("is_blocked"), lit(0L))), lit(0L)).as("n_hits"))
      .select(col("n_true_pairs"), col("n_blocked_pairs"), col("n_hits"),
        expr("1000 * n_hits DIV greatest(n_true_pairs, 1)").as("recall_milli"),
        expr("1000 * n_hits DIV greatest(n_blocked_pairs, 1)").as("precision_milli"))
  }

  /** Percent of the vocabulary playing the established base; the rest
    * arrives as the incoming batch (deterministic hash split — the same
    * RNG-free discipline as sample_split). */
  val ErBasePct = 80

  /** Incremental ER — the lifecycle step the dedup family already has
    * (dedup_incremental / dedup_embedding_incremental) applied to
    * entities: new dirty names screen against an ESTABLISHED base
    * vocabulary and its canonical map, instead of re-running ER over
    * everything. Per incoming name: its best base match (min distance,
    * then lexicographic — deterministic), the distance, and the
    * canonical entity it resolves to (base's canonical for a match, the
    * name itself for a genuinely new entity).
    *
    * Scale shape: at deployment the base vocabulary + canonical map are
    * persisted artifacts of the last full ER run (vocabulary-sized), and
    * the incoming batch is small — the screen is one blocked equi-join
    * of batch × base (broadcast whichever is smaller) and a per-name
    * top-1 window over the match candidates; nothing fact-sized moves.
    * The full closure re-runs only on the base, here, to BUILD that
    * artifact — exactly what the corpus-index builds in the dedup
    * incremental family do. */
  def qErIncremental(spark: SparkSession, dir: String): DataFrame = {
    val names = namesCk(spark, dir)
      .withColumn("bucket",
        pmod(graft.functions.Exact.md5Long(concat(lit("erb|"), col("p_name"))), lit(100)))
    val base = names.filter(col("bucket") < ErBasePct).drop("bucket")
    val inc = names.filter(col("bucket") >= ErBasePct).drop("bucket")
    val canon = canonicalFrom(base)
      .select(col("p_name").as("base_name"), col("canonical_name"))
    val w = Window.partitionBy("p_name").orderBy(col("dist"), col("base_name"))
    val best = inc.select(col("blk"), col("p_name"))
      .join(broadcast(base.select(col("blk"), col("p_name").as("base_name"))), Seq("blk"))
      .withColumn("dist", levenshtein(col("p_name"), col("base_name")).cast("long"))
      .filter(col("dist") <= ErMaxDist)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_name"), col("base_name"), col("dist"))
    inc.select(col("p_name"))
      .join(best, Seq("p_name"), "left")
      .join(broadcast(canon), Seq("base_name"), "left")
      .select(col("p_name"), col("base_name").as("matched_name"), col("dist"),
        coalesce(col("canonical_name"), col("p_name")).as("canonical_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_fuzzy"         -> (qErFuzzy _),
    "er_canonical"     -> (qErCanonical _),
    "er_resolve"       -> (qErResolve _),
    "er_blocking_eval" -> (qErBlockingEval _),
    "er_incremental"   -> (qErIncremental _))

  // ------------------------------------------------------------- oracles

  /** Shared vocabulary + blocked-pair CTEs — one truth for both gates. */
  private val fuzzyCtes: String =
    s"""names AS (
       |  SELECT p_name, count(*) AS n_parts, min(p_partkey) AS rep_key
       |  FROM part GROUP BY 1),
       |fpairs AS (
       |  SELECT a.p_name AS name_a, b.p_name AS name_b,
       |    levenshtein(a.p_name, b.p_name) AS dist,
       |    a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
       |  FROM names a JOIN names b
       |    ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
       |   AND a.p_name < b.p_name
       |  WHERE levenshtein(a.p_name, b.p_name) <= $ErMaxDist)""".stripMargin

  /** Recursive min-label closure + canonical map over the fuzzy-pair
    * graph — shared by er_canonical and er_resolve (one truth for the
    * canonical assignment both gates depend on). Same closure shape as
    * the dedup_clusters oracle, on string node ids — min(VARCHAR) is the
    * lexicographic component min. */
  private val canonicalCtes: String =
    s"""$fuzzyCtes,
       |edges AS (SELECT name_a AS u, name_b AS v FROM fpairs
       |          UNION SELECT name_b, name_a FROM fpairs),
       |reach AS (SELECT DISTINCT u, u AS v FROM edges
       |          UNION
       |          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
       |comp AS (SELECT u AS p_name, min(v) AS canon FROM reach GROUP BY u),
       |canon_map AS (
       |  SELECT n.p_name, coalesce(c.canon, n.p_name) AS canonical_name,
       |    n.n_parts, n.rep_key
       |  FROM names n LEFT JOIN comp c ON n.p_name = c.p_name)""".stripMargin

  val oracles: Map[String, String] = Map(
    "er_fuzzy" ->
      s"""WITH $fuzzyCtes
         |SELECT name_a, name_b, dist, n_parts_a, n_parts_b FROM fpairs""".stripMargin,
    "er_canonical" ->
      s"""WITH RECURSIVE $canonicalCtes
         |SELECT p_name, canonical_name, n_parts, rep_key,
         |  p_name = canonical_name AS is_canonical
         |FROM canon_map""".stripMargin,
    "er_resolve" ->
      s"""WITH RECURSIVE $canonicalCtes
         |SELECT m.canonical_name,
         |  count(DISTINCT p.p_name) AS n_variants,
         |  count(*) AS n_parts,
         |  CAST(sum(${graft.functions.Exact.centsSql("p.p_retailprice")}) AS BIGINT) AS retail_cents,
         |  max(p.p_size) AS max_size
         |FROM part p JOIN canon_map m ON p.p_name = m.p_name
         |GROUP BY 1""".stripMargin,
    // blocked = the shared fpairs statement verbatim; truth = the same
    // distance rule with the block predicate REMOVED — the eval nests the
    // gate it calibrates so the two cannot drift
    "er_blocking_eval" ->
      s"""WITH $fuzzyCtes,
         |truth AS (
         |  SELECT a.p_name AS name_a, b.p_name AS name_b
         |  FROM names a JOIN names b ON a.p_name < b.p_name
         |  WHERE levenshtein(a.p_name, b.p_name) <= $ErMaxDist),
         |blocked AS (SELECT name_a, name_b FROM fpairs),
         |hits AS (SELECT name_a, name_b FROM blocked
         |         INTERSECT SELECT name_a, name_b FROM truth)
         |SELECT CAST(nt AS BIGINT) AS n_true_pairs,
         |  CAST(nb AS BIGINT) AS n_blocked_pairs,
         |  CAST(nh AS BIGINT) AS n_hits,
         |  (1000 * CAST(nh AS BIGINT)) // greatest(CAST(nt AS BIGINT), 1) AS recall_milli,
         |  (1000 * CAST(nh AS BIGINT)) // greatest(CAST(nb AS BIGINT), 1) AS precision_milli
         |FROM (SELECT (SELECT count(*) FROM truth) AS nt,
         |             (SELECT count(*) FROM blocked) AS nb,
         |             (SELECT count(*) FROM hits) AS nh)""".stripMargin,
    // base/incoming split by the shared md5 hash; closure over BASE pairs
    // only (the persisted-artifact build); the screen is the same blocked
    // join + distance rule as fpairs, asymmetric batch × base
    "er_incremental" ->
      s"""WITH RECURSIVE names AS (
         |  SELECT p_name, count(*) AS n_parts FROM part GROUP BY 1),
         |tagged AS (SELECT p_name, n_parts,
         |  ${graft.functions.Exact.md5LongSql("'erb|' || p_name")} % 100 AS bucket FROM names),
         |base AS (SELECT p_name, n_parts FROM tagged WHERE bucket < $ErBasePct),
         |inc AS (SELECT p_name FROM tagged WHERE bucket >= $ErBasePct),
         |bpairs AS (
         |  SELECT a.p_name AS name_a, b.p_name AS name_b
         |  FROM base a JOIN base b
         |    ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
         |   AND a.p_name < b.p_name
         |  WHERE levenshtein(a.p_name, b.p_name) <= $ErMaxDist),
         |edges AS (SELECT name_a AS u, name_b AS v FROM bpairs
         |          UNION SELECT name_b, name_a FROM bpairs),
         |reach AS (SELECT DISTINCT u, u AS v FROM edges
         |          UNION
         |          SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
         |comp AS (SELECT u AS p_name, min(v) AS canon FROM reach GROUP BY u),
         |canon AS (
         |  SELECT b.p_name AS base_name, coalesce(c.canon, b.p_name) AS canonical_name
         |  FROM base b LEFT JOIN comp c ON b.p_name = c.p_name),
         |m AS (
         |  SELECT i.p_name, b.p_name AS base_name,
         |    levenshtein(i.p_name, b.p_name) AS dist
         |  FROM inc i JOIN base b
         |    ON substr(i.p_name, 1, 1) = substr(b.p_name, 1, 1)
         |  WHERE levenshtein(i.p_name, b.p_name) <= $ErMaxDist),
         |best AS (
         |  SELECT p_name, base_name, CAST(dist AS BIGINT) AS dist,
         |    row_number() OVER (PARTITION BY p_name ORDER BY dist, base_name) AS rn
         |  FROM m)
         |SELECT i.p_name, b.base_name AS matched_name, b.dist,
         |  coalesce(cn.canonical_name, i.p_name) AS canonical_name
         |FROM inc i
         |LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON b.p_name = i.p_name
         |LEFT JOIN canon cn ON cn.base_name = b.base_name""".stripMargin)
}
