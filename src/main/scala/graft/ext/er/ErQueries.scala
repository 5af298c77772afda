package graft.ext.er

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
 *  2. COMPOUND-BLOCKED SELF-JOIN: candidate pairs come from an equi-join
 *     on a UNION of redundant compound blocking keys (see [[keyed]]) — a
 *     true match must survive in only ONE block. The expensive edit
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

  /** Characters of prefix/suffix in the compound blocking key. */
  val ErKeyChars = 2

  /** Width of the length band folded into each compound key. With
    * `ErMaxDist = 3` a true pair's lengths differ by at most 3, so a
    * band of width 4 plus the dual-band emission below guarantees every
    * true pair shares at least one band value. */
  val ErBandWidth = 4

  /** The entity vocabulary: one row per distinct surface form with its
    * occurrence count and a stable representative key (min part key —
    * deterministic, so every engine elects the same representative). */
  private def nameStats(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"), min(col("p_partkey")).as("rep_key"))

  /** The vocabulary, contracted from the fact table ONCE and
    * checkpointed — the fact aggregate is the dominant cost at scale, so
    * every layer of one query invocation shares this frame rather than
    * re-deriving it (fuzzy → canonical → resolve would otherwise each run
    * their own full-data pass). */
  private def namesCk(spark: SparkSession, dir: String): DataFrame =
    nameStats(spark, dir).localCheckpoint()

  /** The compound blocking keys of one name — the UNION of two redundant
    * key families, each compounded with a length band:
    *
    *   p|&lt;first 2 chars&gt;|&lt;band&gt;   (survives edits in the tail)
    *   s|&lt;last 2 chars&gt;|&lt;band&gt;    (survives edits in the head)
    *
    * Each family emits TWO band values, ⌊len/4⌋ and ⌊(len+3)/4⌋, so any
    * pair within the distance cut (length gap ≤ 3) shares at least one
    * band value — band boundaries never cost recall. A candidate pair
    * sharing a band but violating the length gap is killed by the
    * levenshtein filter (lev ≥ Δlen), so the match set is EXACTLY
    * "(shared 2-prefix OR shared 2-suffix) AND lev ≤ 3" — the clean
    * predicate the oracles state, with no band term.
    *
    * Why compound, not the single first-char key this kernel launched
    * with: one character yields ≤ |alphabet| blocks, so candidate mass
    * Σ|block|² stays quadratic in the vocabulary (vocab²/26) — ~10¹⁰
    * levenshtein calls at a million-name vocabulary — AND any match
    * editing the first character is unrecallable (166‰ measured recall on
    * this corpus). The compound family's block count GROWS with the
    * vocabulary (prefix × suffix × length diversity), bounding block
    * sizes, while the two redundant families lift recall to 1000‰ here
    * (a first-word edit is caught by the suffix key and vice versa);
    * [[qErBlockingEval]] reports both sides of that trade, and the
    * vocabulary-growth probe in SCALING.md measures the candidate-mass
    * reduction at grown vocabularies. Production systems add further
    * redundant families (phonetic codes, token keys) the same way: one
    * more array element here, one more disjunct in the oracle.
    *
    * Assumes names of ≥ 2 characters (the corpus minimum is 7); shorter
    * names would need the oracle's `greatest(length-1, 1)` guard mirrored
    * here. */
  private[graft] def keyed(names: DataFrame, nameCol: String = "p_name"): DataFrame = {
    val n = col(nameCol)
    def key(fam: String, part: Column, band: Column): Column =
      concat_ws("|", lit(fam), part, band)
    val b1 = expr(s"length($nameCol) DIV $ErBandWidth")
    val b2 = expr(s"(length($nameCol) + ${ErMaxDist}) DIV $ErBandWidth")
    val pfx = substring(n, 1, ErKeyChars)
    val sfx = substring(n, -ErKeyChars, ErKeyChars)
    names.withColumn("bk", explode(array_distinct(array(
      key("p", pfx, b1), key("p", pfx, b2),
      key("s", sfx, b1), key("s", sfx, b2)))))
  }

  /** Fuzzy-match candidate pairs from an already-materialized vocabulary:
    * compound-blocked levenshtein self-join. Output is one row per
    * matched (name_a < name_b) pair with the edit distance and both
    * occurrence counts — the edge list of the match graph. A pair sharing
    * several blocks (both families, or both band variants) is generated
    * per block and deduped AFTER the distance filter: the distinct then
    * shuffles only the match-graph-sized survivors, at the cost of a few
    * redundant levenshtein evaluations on short strings — far cheaper
    * than a pre-filter distinct over the full candidate mass. */
  private[graft] def fuzzyFrom(names: DataFrame): DataFrame = {
    val k = keyed(names)
    val lhs = k.select(col("bk"), col("p_name").as("name_a"),
      col("n_parts").as("n_parts_a"))
    val rhs = k.select(col("bk"), col("p_name").as("name_b"),
      col("n_parts").as("n_parts_b"))
    lhs.join(broadcast(rhs), Seq("bk"))
      .filter(col("name_a") < col("name_b"))
      // levenshtein runs on blocked candidates only, pipelined inside the
      // join's output — cast to long so the schema matches DuckDB's
      // BIGINT. The THRESHOLD form (round 10) computes a banded DP
      // (O(k·len), early exit) instead of the full O(len²) matrix and
      // returns −1 above the cut — on rejected candidates (most of the
      // block) the full matrix was always wasted work; kept pairs get the
      // identical exact distance, so the oracle's plain `lev ≤ k`
      // predicate is unchanged. between(0, k) is the −1 guard.
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), ErMaxDist.toInt).cast("long"))
      .filter(col("dist").between(0, ErMaxDist))
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_parts_a"), col("n_parts_b"))
      .distinct()
  }

  def qErFuzzy(spark: SparkSession, dir: String): DataFrame =
    fuzzyFrom(namesCk(spark, dir))

  /** Maximum names per physical block for the CAPPED kernel. Inactive on
    * this corpus (largest block ≪ 256 — [[qErFuzzyCapped]] therefore
    * equals [[qErFuzzy]], a cross-check the spec pins); binding on a real
    * vocabulary, where it converts the worst case from Σ|block|²
    * (quadratic in the hottest block — a boilerplate brand or a
    * head-noun shared by 10⁵ product names) to cap · Σ|block| ≤
    * cap · 4·vocab — LINEAR in the vocabulary. The ER analogue of the
    * dedup family's MaxShingleDf posting-list cap: an oversized block is
    * dropped whole (deterministic, oracle-replayable), and a true match
    * inside one usually survives via its OTHER key family — what remains
    * unrecallable is measured, not hoped about (the capped variant of
    * [[qErBlockingEval]]'s recall applies; production either widens the
    * compound key — 3-char prefix, phonetic — or accepts the measured
    * loss, exactly the df-cap trade). */
  val ErMaxBlock = 256

  /** [[qErFuzzy]] with the block-size cap — the at-scale kernel. Keys
    * whose block exceeds [[ErMaxBlock]] generate no candidates; the
    * levenshtein gate and pair dedup are unchanged. */
  def qErFuzzyCapped(spark: SparkSession, dir: String): DataFrame =
    fuzzyCappedFrom(namesCk(spark, dir))

  private[graft] def fuzzyCappedFrom(names: DataFrame): DataFrame = {
    val k = keyed(names)
    val ok = k.groupBy(col("bk")).agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= ErMaxBlock).select(col("bk"))
    val kc = k.join(broadcast(ok), Seq("bk"))
    val lhs = kc.select(col("bk"), col("p_name").as("name_a"),
      col("n_parts").as("n_parts_a"))
    val rhs = kc.select(col("bk"), col("p_name").as("name_b"),
      col("n_parts").as("n_parts_b"))
    lhs.join(broadcast(rhs), Seq("bk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), ErMaxDist.toInt).cast("long"))
      .filter(col("dist").between(0, ErMaxDist))
      .select(col("name_a"), col("name_b"), col("dist"),
        col("n_parts_a"), col("n_parts_b"))
      .distinct()
  }

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

  /** The full-vocabulary canonical map as a suite-scoped snapshot (r16
    * optimization round, guide §1.2): er_canonical and er_resolve each
    * re-ran the fuzzy pair generation PLUS the iterative components loop
    * over the same vocabulary. The fixpoint is unique and deterministic,
    * so the materialization is value-identical to both former private
    * runs; at 100 TB it is the canonical-entity lookup table a resolution
    * deployment persists per vocabulary version (exactly the docstring's
    * "lookup table that rewrites the dirty dimension"). Built by
    * `SnapshotBuild.all` as its own attributable entry. */
  private[graft] def canonMap(spark: SparkSession, dir: String): DataFrame =
    graft.util.SnapshotCache.snapshot("er_canon_map", spark, dir)(
      canonicalFrom(namesCk(spark, dir)))

  def qErCanonical(spark: SparkSession, dir: String): DataFrame =
    canonMap(spark, dir)

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
    val canon = canonMap(spark, dir)
      .select(col("p_name"), col("canonical_name"))
    Tables.part(spark, dir)
      .join(broadcast(canon), Seq("p_name"))
      .groupBy(col("canonical_name"))
      .agg(countDistinct(col("p_name")).as("n_variants"),
        count(lit(1)).as("n_parts"),
        sum(graft.functions.Exact.cents(col("p_retailprice"))).as("retail_cents"),
        max(col("p_size")).as("max_size"))
  }

  /** In-engine calibration of the blocking kernel — BOTH sides of the
    * blocking trade on one summary row:
    *
    *  - QUALITY: the blocked match pairs ([[qErFuzzy]], verbatim) against
    *    ALL-PAIRS levenshtein ground truth over the vocabulary — recall
    *    (true matches whose pair survived in some block) and precision as
    *    integer milli-ratios. Blocked matches all pass the distance cut,
    *    so precision is 1000‰ by construction; recall is the number a
    *    deployment must watch.
    *  - COST: distinct candidate-pair mass (pairs co-blocked BEFORE the
    *    distance filter — the levenshtein evaluations actually paid),
    *    broken out per key family (`n_cand_prefix` / `n_cand_suffix`)
    *    next to two comparators: `n_cand_firstchar`, what the retired
    *    single first-char key would compare (Σ block·(block−1)/2 over
    *    first-char blocks), and `n_all_pairs`, what unblocked truth
    *    costs. Recall per candidate is the figure of merit: on this
    *    corpus the compound key buys 6× the recall (166‰ → 1000‰) for 2×
    *    the candidates; block-count growth makes the mass ratio flip
    *    hard at realistic vocabularies (SCALING.md measures the curve).
    *
    * Scale shape: truth is a vocabulary² comparison — affordable only
    * because the vocabulary is the contracted frame (names ≪ facts); at
    * a vocabulary too large for that, the truth side runs over a sampled
    * stratum, same reasoning as dedup_minhash_eval. The comparison
    * itself is one pair-keyed full-outer join + a global aggregate over
    * two match-graph-sized frames; the candidate mass re-runs only the
    * block join (no levenshtein) and aggregates in place; the two
    * comparator columns are one vocabulary-sized aggregate each. The
    * four 1-row frames meet in crossJoins — broadcast scalars, not data
    * joins. */
  def qErBlockingEval(spark: SparkSession, dir: String): DataFrame =
    blockingEvalFrom(namesCk(spark, dir))

  /** The eval over an arbitrary vocabulary frame (`p_name` + `n_parts`) —
    * split out so ErSpec can certify the recall/cost trade on a grown
    * synthetic vocabulary, not just the corpus fixture. */
  private[graft] def blockingEvalFrom(names: DataFrame): DataFrame = {
    val truth = names.select(col("p_name").as("name_a"))
      .join(broadcast(names.select(col("p_name").as("name_b"))),
        col("name_a") < col("name_b"))
      .filter(levenshtein(col("name_a"), col("name_b"), ErMaxDist.toInt)
        .between(0, ErMaxDist))
      .select(col("name_a"), col("name_b"), lit(1L).as("is_true"))
    val blocked = fuzzyFrom(names)
      .select(col("name_a"), col("name_b"), lit(1L).as("is_blocked"))
    // outer coalesce: a vocabulary with no fuzzy matches leaves both pair
    // frames empty, and the global agg's all-NULL row must read as zeros
    // (the oracle's scalar COUNT(*) form does)
    val quality = truth.join(blocked, Seq("name_a", "name_b"), "full_outer")
      .agg(
        coalesce(sum(coalesce(col("is_true"), lit(0L))), lit(0L)).as("n_true_pairs"),
        coalesce(sum(coalesce(col("is_blocked"), lit(0L))), lit(0L)).as("n_blocked_pairs"),
        coalesce(sum(coalesce(col("is_true"), lit(0L)) * coalesce(col("is_blocked"), lit(0L))), lit(0L)).as("n_hits"))
    val k = keyed(names)
    val cand = k.select(col("bk"), col("p_name").as("name_a"))
      .join(broadcast(k.select(col("bk"), col("p_name").as("name_b"))), Seq("bk"))
      .filter(col("name_a") < col("name_b"))
      .select(substring(col("bk"), 1, 1).as("fam"), col("name_a"), col("name_b"))
    val mass = cand.agg(
      countDistinct(col("name_a"), col("name_b")).as("n_cand_pairs"),
      countDistinct(when(col("fam") === "p",
        struct(col("name_a"), col("name_b")))).as("n_cand_prefix"),
      countDistinct(when(col("fam") === "s",
        struct(col("name_a"), col("name_b")))).as("n_cand_suffix"))
    val firstChar = names
      .groupBy(substring(col("p_name"), 1, 1).as("c"))
      .agg(count(lit(1)).as("m"))
      .agg(coalesce(sum(expr("m * (m - 1) DIV 2")), lit(0L)).as("n_cand_firstchar"))
    val allPairs = names.agg(expr("count(*) * (count(*) - 1) DIV 2").as("n_all_pairs"))
    // each side is a 1-row aggregate — broadcast explicitly so the plan
    // never rests on size estimates (CrossJoinDisciplineSpec)
    quality.crossJoin(broadcast(mass)).crossJoin(broadcast(firstChar))
      .crossJoin(broadcast(allPairs))
      .select(col("n_true_pairs"), col("n_blocked_pairs"), col("n_hits"),
        expr("1000 * n_hits DIV greatest(n_true_pairs, 1)").as("recall_milli"),
        expr("1000 * n_hits DIV greatest(n_blocked_pairs, 1)").as("precision_milli"),
        col("n_cand_pairs"), col("n_cand_prefix"), col("n_cand_suffix"),
        col("n_cand_firstchar"), col("n_all_pairs"))
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
    val (base, inc, canon) = baseArtifacts(spark, dir)
    screenAgainstBase(inc, base, canon)
  }

  /** The persisted artifacts of the last full ER run over the BASE split
    * plus the incoming batch: (base vocabulary, incoming names, canonical
    * map). At deployment base + canon are what survives between
    * incremental runs; here they rebuild from the shared hash split so
    * the batch query and its streaming twin screen against the SAME
    * index (StreamPipelineSpec drives the twin through this hook). */
  private[graft] def baseArtifacts(spark: SparkSession,
                                   dir: String): (DataFrame, DataFrame, DataFrame) = {
    val names = namesCk(spark, dir)
      .withColumn("bucket",
        pmod(graft.functions.Exact.md5Long(concat(lit("erb|"), col("p_name"))), lit(100)))
    val base = names.filter(col("bucket") < ErBasePct).drop("bucket")
    val inc = names.filter(col("bucket") >= ErBasePct).drop("bucket")
    // the canonical map is the expensive member (fuzzy blocking + the
    // components fixpoint over the base vocabulary) and at deployment is
    // exactly what PERSISTS between incremental runs — a snapshot
    // artifact (built with the others in SnapshotBuild), not a per-run
    // recompute; base/inc stay live splits (two cheap filters)
    val canon = graft.util.SnapshotCache.snapshot("er_base_canon", spark, dir) {
      canonicalFrom(base)
        .select(col("p_name").as("base_name"), col("canonical_name"))
    }
    (base, inc, canon)
  }

  /** The screen given the PERSISTED artifacts (base vocabulary + canonical
    * map) — split out so the streaming twin can run it per micro-batch
    * against a fixed index, exactly like the dedup family's
    * screenAgainstIndex: per-name verdicts are independent given the
    * artifacts, so micro-batch outputs union to the one-shot answer
    * (StreamPipelineSpec pins it). `batch` needs only `p_name`. */
  private[graft] def screenAgainstBase(batch: DataFrame, base: DataFrame,
                                       canon: DataFrame): DataFrame = {
    val w = Window.partitionBy("p_name").orderBy(col("dist"), col("base_name"))
    // distinct BEFORE the window: a pair co-blocked in both key families
    // must score once, not twice, in the rank
    val best = keyed(batch.select(col("p_name"))).select(col("bk"), col("p_name"))
      .join(broadcast(keyed(base.select(col("p_name")))
        .select(col("bk"), col("p_name").as("base_name"))), Seq("bk"))
      .withColumn("dist",
        levenshtein(col("p_name"), col("base_name"), ErMaxDist.toInt).cast("long"))
      .filter(col("dist").between(0, ErMaxDist))
      .select(col("p_name"), col("base_name"), col("dist"))
      .distinct()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_name"), col("base_name"), col("dist"))
    batch.select(col("p_name"))
      .join(best, Seq("p_name"), "left")
      .join(broadcast(canon), Seq("base_name"), "left")
      .select(col("p_name"), col("base_name").as("matched_name"), col("dist"),
        coalesce(col("canonical_name"), col("p_name")).as("canonical_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_fuzzy"         -> (qErFuzzy _),
    "er_fuzzy_capped"  -> (qErFuzzyCapped _),
    "er_canonical"     -> (qErCanonical _),
    "er_resolve"       -> (qErResolve _),
    "er_blocking_eval" -> (qErBlockingEval _),
    "er_incremental"   -> (qErIncremental _))

  // ------------------------------------------------------------- oracles

  /** The compound blocking predicate between two name columns — the clean
    * logical form of [[keyed]]'s key union (the band term is provably
    * redundant under the distance cut, see [[keyed]]). The `greatest`
    * guard covers 1-char names (the Spark side documents the same ≥2-char
    * assumption). */
  private def blockSql(a: String, b: String): String =
    s"""(substr($a, 1, $ErKeyChars) = substr($b, 1, $ErKeyChars)
       |     OR substr($a, greatest(length($a) - ${ErKeyChars - 1}, 1), $ErKeyChars)
       |      = substr($b, greatest(length($b) - ${ErKeyChars - 1}, 1), $ErKeyChars))""".stripMargin

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
       |    ON a.p_name < b.p_name
       |   AND ${blockSql("a.p_name", "b.p_name")}
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

  /** The band-overlap predicate the candidate COUNT must model exactly
    * (unlike the match set, the pre-distance candidate mass depends on
    * the physical band keys): two names share a band value iff one of the
    * four ⌊len/W⌋ / ⌊(len+k)/W⌋ combinations coincides. */
  private def bandSql(a: String, b: String): String = {
    val (w, k) = (ErBandWidth, ErMaxDist)
    s"""(length($a) // $w = length($b) // $w
       |     OR length($a) // $w = (length($b) + $k) // $w
       |     OR (length($a) + $k) // $w = length($b) // $w
       |     OR (length($a) + $k) // $w = (length($b) + $k) // $w)""".stripMargin
  }

  /** The PHYSICAL key set of [[keyed]] in SQL — needed only where the
    * block-size cap makes physicality observable (the capped kernel and
    * the eval's candidate mass); the uncapped match set stays the clean
    * logical predicate. UNION (not ALL) mirrors `array_distinct`. */
  private val keysCte: String = {
    def one(fam: String, part: String, band: String) =
      s"  SELECT p_name, n_parts, '$fam|' || $part || '|' || CAST($band AS VARCHAR) AS bk FROM names"
    val pfx = s"substr(p_name, 1, $ErKeyChars)"
    val sfx = s"substr(p_name, greatest(length(p_name) - ${ErKeyChars - 1}, 1), $ErKeyChars)"
    val b1 = s"length(p_name) // $ErBandWidth"
    val b2 = s"(length(p_name) + $ErMaxDist) // $ErBandWidth"
    Seq(one("p", pfx, b1), one("p", pfx, b2), one("s", sfx, b1), one("s", sfx, b2))
      .mkString("keys AS (\n", "\n  UNION\n", ")")
  }

  val oracles: Map[String, String] = Map(
    "er_fuzzy" ->
      s"""WITH $fuzzyCtes
         |SELECT name_a, name_b, dist, n_parts_a, n_parts_b FROM fpairs""".stripMargin,
    // the capped kernel is physical by nature (WHICH block a pair
    // survives in decides whether the cap kills it), so this oracle
    // replays the key explosion + block census + cap verbatim
    "er_fuzzy_capped" ->
      s"""WITH names AS (
         |  SELECT p_name, count(*) AS n_parts, min(p_partkey) AS rep_key
         |  FROM part GROUP BY 1),
         |$keysCte,
         |ok AS (SELECT bk FROM keys GROUP BY bk HAVING count(*) <= $ErMaxBlock),
         |cand AS (
         |  SELECT DISTINCT a.p_name AS name_a, b.p_name AS name_b,
         |    a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
         |  FROM keys a
         |  JOIN ok ON ok.bk = a.bk
         |  JOIN keys b ON b.bk = a.bk AND a.p_name < b.p_name)
         |SELECT name_a, name_b,
         |  CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist,
         |  n_parts_a, n_parts_b
         |FROM cand WHERE levenshtein(name_a, name_b) <= $ErMaxDist""".stripMargin,
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
    // gate it calibrates so the two cannot drift. The cand CTE mirrors
    // the PHYSICAL key family (block predicate AND band overlap, per
    // family) because candidate mass — unlike the match set — is a
    // property of the physical keys, not their logical closure.
    "er_blocking_eval" ->
      s"""WITH $fuzzyCtes,
         |truth AS (
         |  SELECT a.p_name AS name_a, b.p_name AS name_b
         |  FROM names a JOIN names b ON a.p_name < b.p_name
         |  WHERE levenshtein(a.p_name, b.p_name) <= $ErMaxDist),
         |blocked AS (SELECT name_a, name_b FROM fpairs),
         |hits AS (SELECT name_a, name_b FROM blocked
         |         INTERSECT SELECT name_a, name_b FROM truth),
         |cand AS (
         |  SELECT a.p_name AS name_a, b.p_name AS name_b,
         |    substr(a.p_name, 1, $ErKeyChars) = substr(b.p_name, 1, $ErKeyChars) AS is_pfx,
         |    substr(a.p_name, greatest(length(a.p_name) - ${ErKeyChars - 1}, 1), $ErKeyChars)
         |      = substr(b.p_name, greatest(length(b.p_name) - ${ErKeyChars - 1}, 1), $ErKeyChars) AS is_sfx
         |  FROM names a JOIN names b
         |    ON a.p_name < b.p_name
         |   AND ${blockSql("a.p_name", "b.p_name")}
         |   AND ${bandSql("a.p_name", "b.p_name")}),
         |fc AS (
         |  SELECT CAST(coalesce(sum(m * (m - 1) // 2), 0) AS BIGINT) AS n_cand_firstchar
         |  FROM (SELECT count(*) AS m FROM names GROUP BY substr(p_name, 1, 1))),
         |ap AS (
         |  SELECT CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_all_pairs FROM names)
         |SELECT CAST(nt AS BIGINT) AS n_true_pairs,
         |  CAST(nb AS BIGINT) AS n_blocked_pairs,
         |  CAST(nh AS BIGINT) AS n_hits,
         |  (1000 * CAST(nh AS BIGINT)) // greatest(CAST(nt AS BIGINT), 1) AS recall_milli,
         |  (1000 * CAST(nh AS BIGINT)) // greatest(CAST(nb AS BIGINT), 1) AS precision_milli,
         |  CAST(nc AS BIGINT) AS n_cand_pairs,
         |  CAST(ncp AS BIGINT) AS n_cand_prefix,
         |  CAST(ncs AS BIGINT) AS n_cand_suffix,
         |  fc.n_cand_firstchar, ap.n_all_pairs
         |FROM (SELECT (SELECT count(*) FROM truth) AS nt,
         |             (SELECT count(*) FROM blocked) AS nb,
         |             (SELECT count(*) FROM hits) AS nh,
         |             (SELECT count(*) FROM cand) AS nc,
         |             (SELECT count(*) FROM cand WHERE is_pfx) AS ncp,
         |             (SELECT count(*) FROM cand WHERE is_sfx) AS ncs),
         |     fc, ap""".stripMargin,
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
         |    ON a.p_name < b.p_name
         |   AND ${blockSql("a.p_name", "b.p_name")}
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
         |    ON ${blockSql("i.p_name", "b.p_name")}
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
