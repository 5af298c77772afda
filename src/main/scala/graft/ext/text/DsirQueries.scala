package graft.ext.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Exact
import graft.sources.Tables

/**
 * DSIR-shaped data selection — importance resampling on hashed n-gram
 * features (Xie et al., "Data Selection for Language Models via Importance
 * Resampling", NeurIPS 2023). The deployment question it answers: given a
 * raw crawl and a small trusted TARGET corpus, which raw documents look
 * most like the target? DSIR fits two bag-of-hashed-ngrams models, scores
 * every raw document by its log importance weight
 *
 *   log w(doc) = Σ_features [ log p_target(f) − log p_raw(f) ]
 *
 * and resamples the crawl by that weight. Here the target distribution is
 * the corpus's English slice (the CCNet-style "match the trusted English
 * data" deployment) and the raw distribution is the whole corpus.
 *
 * Exactness: the float log is replaced by the engine's LOG2-QUANTIZED
 * count surprise (the text_lm_score discipline):
 *
 *   lg(c) = floor(log2(1 + c)) = length(bin(1 + c)) − 1
 *
 * so the per-doc weight in "log2 units" is
 *
 *   w_units = Σ_f [ lg(c_target(f)) − lg(c_raw(f)) ]
 *           + n_feats · [ lg(N_raw) − lg(N_target) ]
 *
 * — the exact quantized form of the likelihood ratio including the
 * normalizer term, integer end to end (no division anywhere, so the
 * Spark/DuckDB negative-division mismatch never arises), monotone in the
 * true log weight. Features are word BIGRAMS hashed into [[NBuckets]]
 * buckets via md5 — DSIR's hashed feature space, with both count tables
 * bounded at [[NBuckets]] rows regardless of corpus size.
 *
 * Scale shape: the feature pass is one narrow zip-slice projection per
 * doc; BOTH count tables are ≤ [[NBuckets]]-row aggregates with map-side
 * combine, broadcast back onto the feature stream (no fact-sized shuffle
 * for the model attach); scoring is one doc-keyed aggregate. At 100 TB
 * the count tables are the persisted per-target artifact (kilobytes) and
 * scoring a new crawl is scan + broadcast join + aggregate — the same
 * screen-against-artifact lifecycle as the LM and dedup families.
 */
object DsirQueries {

  /** Hashed feature-space size — DSIR hashes into 10k buckets; 2^12 keeps
    * the bucket id comfortably small while the count tables stay
    * broadcast-sized at ANY corpus scale (the point of hashing). */
  val NBuckets = 4096L

  /** Target-language slice standing in for the trusted target corpus. */
  val TargetLang = "en"

  /** Selected-corpus size for [[qDsirSelect]]. */
  val DsirK = 100

  /** The corpus-wide (doc_id, lang, inc, bucket) hashed-bigram feature
    * stream as ONE suite-scoped snapshot (r16 optimization round, guide
    * §1.2/§2.4): the full-corpus weight build and the incremental model
    * previously each ran their own scan→tokenize→bigram→md5 pass — the
    * md5-per-bigram projection is the dominant cost of both, and
    * dsir_weights was the snapshot section's critical path. The `inc`
    * flag marks the incoming slice so [[incModel]] derives its
    * corpus-minus-incoming stream by FILTER over the same
    * materialization; per-row values are bit-identical to the former
    * private builds (filter commutes with the per-doc feature explode).
    * At 100 TB this is the persisted feature-extraction parquet any DSIR
    * deployment stages before fitting count tables. */
  private[graft] def dsirFeatures(spark: SparkSession, dir: String): DataFrame =
    graft.util.SnapshotCache.snapshot("dsir_features", spark, dir)(
      featureRowsOf(
        Tables.rebalanced(spark, Tables.documents(spark, dir)),
        carry = Seq("inc"),
        prep = _.withColumn("inc",
          col("source") === graft.ext.dedup.DedupQueries.IncomingSource)))

  /** [[dsirFeatures]]' kernel over an arbitrary (doc_id, lang, text)
    * frame — also what the incremental screen drives with a micro-batch.
    * `carry` names extra columns to ride every feature row (must be
    * functionally dependent on doc_id); `prep` derives them first. */
  private[graft] def featureRowsOf(docs: DataFrame, carry: Seq[String] = Nil,
                                   prep: DataFrame => DataFrame = identity): DataFrame = {
    val keys = Seq(col("doc_id"), col("lang")) ++ carry.map(col)
    val toks = prep(docs)
      .select(keys :+ TextNorm.toks(col("text")).as("t"): _*)
    val len = greatest(size(col("t")) - 1, lit(0))
    val zipped = arrays_zip(
      slice(col("t"), lit(1), len).as("w1"),
      slice(col("t"), lit(2), len).as("w2"))
    toks.select(keys :+ explode(zipped).as("z"): _*)
      .select(keys :+
        pmod(Exact.md5Long28(
          concat(lit("dsirf|"), col("z.w1"), lit(" "), col("z.w2"))),
          lit(NBuckets)).as("bucket"): _*)
  }

  /** The persisted DSIR model of a feature stream: the (bucket, c_r, c_t)
    * count table (c_t null where the target never hit the bucket — the
    * target is a subset of the training stream, so c_r covers every
    * bucket) and the 1-row normalizer totals. BOTH bounded at
    * [[NBuckets]] rows at any corpus size. */
  private[graft] def modelOf(f: DataFrame): (DataFrame, DataFrame) = {
    // ONE aggregate pass over the feature stream builds both count
    // columns (r15 — the former cr/ct/totals trio planned three passes
    // plus a bucket join); c_t reads null where the target never hit the
    // bucket, matching the old left join exactly. The normalizer totals
    // then re-aggregate the ≤ NBuckets-row counts frame — free at any
    // corpus size, and no third fact-sized pass exists at 100 TB either.
    val counts = f.groupBy(col("bucket")).agg(
      count(lit(1)).as("c_r"),
      sum(when(col("lang") === TargetLang, 1L).otherwise(0L)).as("c_t0"))
    val model = counts.select(col("bucket"), col("c_r"),
      when(col("c_t0") > 0L, col("c_t0")).as("c_t"))
    val totals = counts.groupBy()
      .agg(coalesce(sum(col("c_r")), lit(0L)).as("n_r"),
        coalesce(sum(col("c_t0")), lit(0L)).as("n_t"))
    (model, totals)
  }

  /** Score a feature stream against a FROZEN model — the kernel shared by
    * the full-corpus weight build and the incremental screen. Buckets the
    * model never saw score lg(1+0)−lg(1+0) = 0, the add-one floor. */
  private[graft] def scoreAgainst(f: DataFrame, model: DataFrame,
                                  totals: DataFrame): DataFrame =
    f.join(broadcast(model), Seq("bucket"), "left")
      .withColumn("fam_diff",
        lg(coalesce(col("c_t"), lit(0L))) - lg(coalesce(col("c_r"), lit(0L))))
      .groupBy(col("doc_id"))
      .agg(max(col("lang")).as("lang"), count(lit(1)).as("n_feats"),
        sum(col("fam_diff")).as("fam_diff"))
      .crossJoin(broadcast(totals))
      .withColumn("w_units",
        col("fam_diff") + col("n_feats") * (lg(col("n_r")) - lg(col("n_t"))))
      .select(col("doc_id"), col("lang"), col("n_feats"), col("w_units"))

  /** floor(log2(1+c)) over a count column — exact via binary-string
    * length in both engines; no float log anywhere. */
  private def lg(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    length(bin(lit(1L) + c)).cast("long") - 1L

  /** Per-document quantized log importance weight vs the target
    * distribution. Suite-scoped snapshot: three consumers (the weight
    * frame itself, the selection, the composition eval) read it, and
    * weights given frozen count tables never change. */
  private[graft] def weightFrame(spark: SparkSession, dir: String): DataFrame =
    graft.util.SnapshotCache.snapshot("dsir_weights", spark, dir)(
      weightFrameRaw(spark, dir))

  /** The snapshot's BUILD pipeline (audited in PLANS.md — the registered
    * entry serves a localCheckpoint whose plan is an RDD scan).
    *
    * The feature stream materializes ONCE (the [[dsirFeatures]] snapshot —
    * the same one-scan discipline as the weighted-median grain frame):
    * four consumers read it here (target counts, raw counts, the
    * normalizer totals, and the scoring join's stream side), and without
    * the materialization Catalyst plans four independent
    * scan→tokenize→bigram→md5 subtrees — the md5-per-bigram feature build
    * is the expensive term, and paying it 4× made dsir_weights the
    * snapshot section's critical path (VERDICT r14 #4: 7.8–8.3 s in-pool;
    * ~3 s with the single build). Since r16 the SAME materialization also
    * feeds [[incModel]] (filter on `inc`), removing the second full
    * feature pass the incremental model used to pay. */
  private[graft] def weightFrameRaw(spark: SparkSession, dir: String): DataFrame = {
    val f = dsirFeatures(spark, dir)
    val (model, totals) = modelOf(f)
    scoreAgainst(f, model, totals)
  }

  def qDsirWeights(spark: SparkSession, dir: String): DataFrame =
    weightFrame(spark, dir)

  /** The selected corpus: top-[[DsirK]] docs by importance weight (the
    * paper's top-k variant of resampling — deterministic, so the selected
    * set replays bit-identically; ties broken by doc_id, a total order).
    *
    * Shape: TakeOrderedAndProject — each partition forwards at most K
    * rows, the driver merges K; the rank window then runs over the K-row
    * result only. NEVER a corpus-sized global sort. */
  def qDsirSelect(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    weightFrame(spark, dir)
      .orderBy(col("w_units").desc, col("doc_id")).limit(DsirK)
      .withColumn("rank",
        row_number().over(
          Window.orderBy(col("w_units").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("lang"), col("n_feats"),
        col("w_units"))
  }

  /** Composition card — did the selection move toward the target? Per
    * language: raw docs and per-mille share vs selected docs and share.
    * The in-engine form of the paper's KL-reduction check: the target
    * slice's share should rise from its raw fraction toward ~1000. */
  def qDsirEval(spark: SparkSession, dir: String): DataFrame = {
    val w = weightFrame(spark, dir)
    val sel = qDsirSelect(spark, dir)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sel"))
    val raw = w.groupBy(col("lang")).agg(count(lit(1)).as("n_raw"))
    val totals = w.groupBy().agg(count(lit(1)).as("n_docs"))
    raw.join(broadcast(sel), Seq("lang"), "left")
      .withColumn("n_sel", coalesce(col("n_sel"), lit(0L)))
      .crossJoin(broadcast(totals))
      .select(col("lang"), col("n_raw"),
        expr("(1000 * n_raw) DIV n_docs").as("raw_milli"),
        col("n_sel"),
        expr(s"(1000 * n_sel) DIV $DsirK").as("sel_milli"))
  }

  /** The persisted-model artifacts of the incremental screen (the
    * corpusIndex / screenAgainstIndex lifecycle every incremental family
    * follows): the DSIR count table and normalizer trained on every doc
    * OUTSIDE the incoming slice, frozen as suite-scoped snapshots. */
  private[graft] def incModel(spark: SparkSession,
                              dir: String): (DataFrame, DataFrame) = {
    // a FILTER over the shared corpus-wide feature snapshot (r16): the
    // incremental model's stream is dsir_features minus the incoming
    // slice — the md5-per-bigram pass is paid once suite-wide instead of
    // once per model. Lazy so two warm snapshots below build nothing.
    lazy val corpusFeatures = dsirFeatures(spark, dir).filter(!col("inc"))
    val model = graft.util.SnapshotCache.snapshot("dsir_inc_model", spark, dir)(
      modelOf(corpusFeatures)._1)
    val totals = graft.util.SnapshotCache.snapshot("dsir_inc_totals", spark, dir)(
      modelOf(corpusFeatures)._2)
    (model, totals)
  }

  /** Screen a BATCH (doc_id, lang, text) against the frozen model — the
    * foreachBatch-drivable kernel (per-doc scores are independent given
    * the model, so micro-batch outputs union to the one-shot answer —
    * the streaming-twin contract). `keep` = weight ≥ 0: the doc looks
    * at least as target-like as raw-like, DSIR's acceptance reading of
    * the likelihood ratio. */
  private[graft] def screenAgainstModel(batch: DataFrame, model: DataFrame,
                                        totals: DataFrame): DataFrame =
    scoreAgainst(featureRowsOf(batch), model, totals)
      .withColumn("keep", col("w_units") >= 0L)

  /** The DSIR deployment shape: a new crawl slice (the IncomingSource
    * split) scored against the count tables trained on the existing
    * corpus — probe-side cost only. The corpus appears ONLY through its
    * two bounded persisted artifacts (≤ [[NBuckets]]-row model + 1-row
    * totals, broadcast); every batch-derived frame is micro-batch-sized.
    * At 100 TB screening a day's crawl is scan + broadcast + one
    * doc-keyed aggregate, whatever the corpus size. */
  def qDsirIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (model, totals) = incModel(spark, dir)
    val batch = Tables.rebalanced(spark, Tables.documents(spark, dir))
      .filter(col("source") === graft.ext.dedup.DedupQueries.IncomingSource)
    screenAgainstModel(batch, model, totals)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dsir_weights"     -> (qDsirWeights _),
    "dsir_select"      -> (qDsirSelect _),
    "dsir_eval"        -> (qDsirEval _),
    "dsir_incremental" -> (qDsirIncremental _))

  private val toksSql = TextNorm.toksSql

  /** Shared weight CTEs — one truth for all three gates (the lmScoreSql
    * discipline). Identical hash, identical bucket mod, identical
    * length(bin(1+c))−1 quantized log, identical normalizer term. */
  private val weightsCtes: String =
    s"""d AS MATERIALIZED (
       |  SELECT doc_id, lang, $toksSql AS t FROM documents),
       |f AS MATERIALIZED (
       |  SELECT doc_id, lang,
       |    ${Exact.md5Long28Sql("'dsirf|' || bg")} % $NBuckets AS bucket
       |  FROM (SELECT doc_id, lang,
       |          unnest([array_to_string(t[i:i+1], ' ')
       |                  for i in generate_series(1, len(t)-1)]) AS bg
       |        FROM d WHERE len(t) >= 2)),
       |ct AS (SELECT bucket, count(*) AS c_t FROM f
       |       WHERE lang = '$TargetLang' GROUP BY 1),
       |cr AS (SELECT bucket, count(*) AS c_r FROM f GROUP BY 1),
       |tot AS (SELECT count(*) AS n_r,
       |          CAST(sum(CASE WHEN lang = '$TargetLang' THEN 1 ELSE 0 END)
       |            AS BIGINT) AS n_t
       |        FROM f),
       |w AS MATERIALIZED (
       |  SELECT s.doc_id, s.lang, s.n_feats,
       |    s.fam_diff + s.n_feats *
       |      ((length(bin(1 + tot.n_r)) - 1) - (length(bin(1 + tot.n_t)) - 1))
       |      AS w_units
       |  FROM (
       |    SELECT f.doc_id, max(f.lang) AS lang, count(*) AS n_feats,
       |      CAST(sum((length(bin(1 + coalesce(ct.c_t, 0))) - 1)
       |               - (length(bin(1 + cr.c_r)) - 1)) AS BIGINT) AS fam_diff
       |    FROM f JOIN cr USING (bucket) LEFT JOIN ct USING (bucket)
       |    GROUP BY 1) s, tot)""".stripMargin

  val oracles: Map[String, String] = Map(
    "dsir_weights" ->
      s"""WITH $weightsCtes
         |SELECT doc_id, lang, n_feats, w_units FROM w""".stripMargin,
    "dsir_select" ->
      s"""WITH $weightsCtes
         |SELECT CAST(row_number() OVER (ORDER BY w_units DESC, doc_id)
         |         AS BIGINT) AS rank,
         |  doc_id, lang, n_feats, w_units
         |FROM w ORDER BY w_units DESC, doc_id LIMIT $DsirK""".stripMargin,
    // the corpus/batch split replayed end to end: model counts from the
    // non-incoming slice only, the batch scored with the same quantized
    // log and add-one floor on model-unseen buckets
    "dsir_incremental" -> {
      val inc = graft.ext.dedup.DedupQueries.IncomingSource
      s"""WITH d AS MATERIALIZED (
         |  SELECT doc_id, lang, source, $toksSql AS t FROM documents),
         |f AS MATERIALIZED (
         |  SELECT doc_id, lang, source,
         |    ${Exact.md5Long28Sql("'dsirf|' || bg")} % $NBuckets AS bucket
         |  FROM (SELECT doc_id, lang, source,
         |          unnest([array_to_string(t[i:i+1], ' ')
         |                  for i in generate_series(1, len(t)-1)]) AS bg
         |        FROM d WHERE len(t) >= 2)),
         |cf AS (SELECT * FROM f WHERE source <> '$inc'),
         |bf AS (SELECT * FROM f WHERE source = '$inc'),
         |ct AS (SELECT bucket, count(*) AS c_t FROM cf
         |       WHERE lang = '$TargetLang' GROUP BY 1),
         |cr AS (SELECT bucket, count(*) AS c_r FROM cf GROUP BY 1),
         |tot AS (SELECT count(*) AS n_r,
         |          CAST(sum(CASE WHEN lang = '$TargetLang' THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_t
         |        FROM cf),
         |w AS (
         |  SELECT s.doc_id, s.lang, s.n_feats,
         |    s.fam_diff + s.n_feats *
         |      ((length(bin(1 + tot.n_r)) - 1) - (length(bin(1 + tot.n_t)) - 1))
         |      AS w_units
         |  FROM (
         |    SELECT bf.doc_id, max(bf.lang) AS lang, count(*) AS n_feats,
         |      CAST(sum((length(bin(1 + coalesce(ct.c_t, 0))) - 1)
         |               - (length(bin(1 + coalesce(cr.c_r, 0))) - 1))
         |        AS BIGINT) AS fam_diff
         |    FROM bf LEFT JOIN cr USING (bucket) LEFT JOIN ct USING (bucket)
         |    GROUP BY 1) s, tot)
         |SELECT doc_id, lang, n_feats, w_units, w_units >= 0 AS keep
         |FROM w""".stripMargin
    },
    "dsir_eval" ->
      s"""WITH $weightsCtes,
         |sel AS (SELECT lang, count(*) AS n_sel FROM (
         |          SELECT lang FROM w
         |          ORDER BY w_units DESC, doc_id LIMIT $DsirK)
         |        GROUP BY 1),
         |raw AS (SELECT lang, count(*) AS n_raw FROM w GROUP BY 1),
         |tot2 AS (SELECT count(*) AS n_docs FROM w)
         |SELECT r.lang, r.n_raw,
         |  (1000 * r.n_raw) // tot2.n_docs AS raw_milli,
         |  coalesce(s.n_sel, 0) AS n_sel,
         |  (1000 * coalesce(s.n_sel, 0)) // $DsirK AS sel_milli
         |FROM raw r LEFT JOIN sel s USING (lang), tot2""".stripMargin)
}
