package graft.ext.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.dedup.DedupQueries
import graft.sources.Tables

/**
 * Text-analysis operators for LLM training-data pipelines over the
 * `documents` table: language-ID (stopword-profile n-gram heuristic),
 * quality scoring, token counting, and key-fingerprinting.
 *
 * Everything is built from codegen'd string/array built-ins — no UDFs — so
 * the whole stage stays inside WholeStageCodegen and scales linearly with
 * document count: no shuffles except the final per-language aggregate in
 * [[qTokens]], which groups on a ~10-value key.
 *
 * Cross-engine determinism: all scores are integer counts or single IEEE
 * expressions over integer counts (see [[graft.functions.Exact]] rationale),
 * so the DuckDB oracles hash-match exactly.
 */
object TextQueries {

  import TextNorm.toks

  /** Stopword profiles for the language-ID heuristic. Deliberately tiny and
    * ASCII-only — the capability under test is the Spark-side shape
    * (array-filter scoring + argmax), not linguistic accuracy. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "que", "y", "en", "un", "es", "los"),
    "fr" -> Seq("le", "les", "des", "et", "une", "est", "pas", "pour"))

  private def score(t: Column, words: Seq[String]): Column =
    size(filter(t, x => array_contains(array(words.map(lit): _*), x))).cast("long")

  /** Language ID: per-language stopword hit counts + deterministic argmax
    * (ties resolve by profile order en > de > es > fr). */
  def qLangId(spark: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    val scored = Tables.documents(spark, dir).select(
      col("doc_id") +: col("lang") +:
        profiles.map { case (l, ws) => score(t, ws).as(s"s_$l") }: _*)
    scored.withColumn("predicted_lang",
      when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") && col("s_en") >= col("s_fr"), "en")
        .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
        .when(col("s_es") >= col("s_fr"), "es")
        .otherwise("fr"))
  }

  /** Classifier evaluation in-engine: the (actual, predicted) confusion
    * matrix of [[qLangId]] against the corpus's labeled `lang` — the
    * eval-pass every heuristic/model-scored column needs before its
    * output drives sampling or filtering decisions. Output is at most
    * |langs|² rows regardless of corpus size; exact counts, so the whole
    * eval sits under the hash gate. */
  def qLangIdEval(spark: SparkSession, dir: String): DataFrame =
    qLangId(spark, dir)
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))

  /** Quality scoring: length / alpha-ratio / punctuation / stopword-ratio
    * signals combined into one deterministic score — the standard cheap
    * pre-filter before expensive dedup/embedding stages.
    *
    * Exposed as a pure DataFrame→DataFrame stage (needs `doc_id`, `lang`,
    * `text` columns): all-narrow expressions, so the SAME code runs on a
    * batch table or a streaming source — asserted by the batch≡stream
    * spec in StreamPipelineSpec. */
  def quality(docs: DataFrame): DataFrame = {
    val t = col("text")
    val nChars = length(coalesce(t, lit(""))).cast("long")
    val nAlpha = length(regexp_replace(coalesce(t, lit("")), "[^A-Za-z]", "")).cast("long")
    val nPunct = length(regexp_replace(coalesce(t, lit("")), "[^.,;:!?]", "")).cast("long")
    val nToks = size(toks(t)).cast("long")
    val nStop = score(toks(t), profiles.head._2)
    docs.select(
      col("doc_id"), col("lang"),
      nChars.as("n_chars"), nAlpha.as("n_alpha"), nPunct.as("n_punct"),
      nToks.as("n_tokens"), nStop.as("n_stopwords"))
      .withColumn("alpha_ratio",
        col("n_alpha").cast("double") / greatest(col("n_chars"), lit(1L)))
      .withColumn("stop_ratio",
        col("n_stopwords").cast("double") / greatest(col("n_tokens"), lit(1L)))
      .withColumn("quality_score",
        lit(0.4) * col("alpha_ratio") + lit(0.3) * col("stop_ratio") +
          lit(0.3) * when(col("n_tokens").between(20, 2000), 1.0).otherwise(0.0))
  }

  def qQuality(spark: SparkSession, dir: String): DataFrame =
    quality(Tables.documents(spark, dir))

  /** Token counting per language: whitespace tokens + a BPE-ish regex
    * tokenizer (words / digit runs / single symbols) — the usual
    * budget-estimation pass; aggregates on the tiny `lang` key. */
  def qTokens(spark: SparkSession, dir: String): DataFrame = {
    val ws = size(toks(col("text"))).cast("long")
    val bpe = size(regexp_extract_all(coalesce(col("text"), lit("")),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")
    Tables.documents(spark, dir)
      .select(col("lang"), ws.as("ws_tokens"), bpe.as("bpe_tokens"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).as("total_ws_tokens"),
        sum(col("bpe_tokens")).as("total_bpe_tokens"))
      .withColumn("avg_ws_tokens",
        col("total_ws_tokens").cast("double") / col("n_docs"))
  }

  /** Key fingerprint (sorted distinct normalized tokens → md5) — the
    * OpenRefine-style clustering key; exact-dup docs collide, word-order
    * variants collide too. Narrow, shuffle-free. */
  def qFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val t = toks(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"), col("source"),
      md5(array_join(array_sort(array_distinct(t)), " ")).as("fingerprint"),
      size(array_distinct(t)).cast("long").as("n_distinct_tokens"))
  }

  /** Corpus heavy hitters: the [[HeavyHittersK]] most frequent tokens with
    * total occurrences and document frequency. The canonical word-count
    * shape: explode → hash-aggregate on token (map-side partial combine
    * does the heavy lifting — the shuffle carries one row per distinct
    * token per partition, not per occurrence), then a total-order top-K
    * over the bounded vocabulary aggregate. Deterministic tie-break
    * (count desc, token asc). The production use: boilerplate detection
    * and stopword-list induction before dedup/quality stages. */
  def qHeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("tok"))
      .limit(HeavyHittersK)

  val HeavyHittersK = 30

  /** Pattern redaction: count and replace blocklisted terms, fingerprint
    * the redacted text. One narrow codegen'd projection — the exact shape
    * of PII scrubbing (emails/phones/IDs) in a production corpus; this
    * corpus contains no PII-shaped strings by construction (TESTDATA.md
    * synthetic word-salad), so the patterns here target real tokens and
    * the production swap is just the regex constant. */
  val RedactPattern = "\\b(customer|spark|vector)\\b"

  def qRedact(spark: SparkSession, dir: String): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      size(regexp_extract_all(t, lit(RedactPattern), lit(0))).cast("long").as("n_redacted"),
      md5(regexp_replace(t, RedactPattern, "<TERM>")).as("redacted_fp"))
  }

  /** Keywords kept per document. */
  val TfidfK = 3
  /** Fixed-point scale for the rational tf-idf score. */
  val TfidfScale = 1000000L

  /** Per-document keyword extraction by rational tf-idf: score =
    * ⌊tf · SCALE · N / df⌋ — the log-free variant (rank-equivalent to
    * tf·(N/df); the standard log damping only compresses the range), kept
    * ALL-INTEGER so every score, and therefore every top-K cut, is
    * engine-identical. Top-[[TfidfK]] tokens per doc, ties on token.
    *
    * Shape: explode → (doc, token) hash aggregate (map-side combine) →
    * vocabulary-keyed df aggregate over the ALREADY-collapsed (doc, token)
    * grain — never the raw occurrences — then one join on token and a
    * per-doc window over ≤|doc's vocab| rows. At 100 TB the df frame is
    * vocabulary-sized (bounded, zipfian): broadcast when it fits, shuffle
    * join on token otherwise; both sides of that join are aggregates, not
    * facts.
    *
    * The corpus size N stays IN the plan as a 1-row aggregate broadcast
    * cross-joined onto the scored rows (the same move as [[qBm25]]) — not
    * a driver `count()` pre-pass, which would split the query into two
    * jobs and bake a stale N in as a literal if the input is ever a
    * filtered/chained frame. */
  def qTfidf(spark: SparkSession, dir: String): DataFrame = {
    // both frames read the shared doc_tokens snapshot (one row per doc,
    // empty array for token-less docs — so n_docs counts ALL documents,
    // exactly the former count over the raw table)
    val totals = tokenizedDocs(spark, dir)
      .agg(count(lit(1)).as("n_docs"))
    val tf = tokenizedDocs(spark, dir)
      .select(col("doc_id"), explode(col("t")).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_micro").desc, col("token"))
    tf.join(df, "token")
      .crossJoin(broadcast(totals))
      .withColumn("score_micro", expr(s"(tf * $TfidfScale * n_docs) DIV df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= TfidfK)
      .select(col("doc_id"), col("token"), col("tf"), col("df"),
        col("score_micro"), col("rank"))
  }

  /** Context-window size (tokens) and stride for [[qChunk]]. Stride <
    * size ⇒ consecutive chunks overlap by ChunkSize − ChunkStride tokens
    * (the boundary-context trick every pretraining tokenizer pipeline
    * uses so no span is only ever seen cut in half). */
  val ChunkSize = 64
  val ChunkStride = 48

  /** Context-window chunking: split each document's token stream into
    * [[ChunkSize]]-token windows every [[ChunkStride]] tokens — the
    * doc→training-example explosion that feeds sequence packing
    * ([[graft.ext.pipeline.CurateQueries.qPackShards]] packs whole docs;
    * this splits docs that exceed the context window). One row per chunk
    * with its token span and content fingerprint.
    *
    * Shape: tokenize → `sequence`-generated starts → explode → `slice` —
    * all narrow codegen'd expressions, zero shuffles; output rows scale
    * with total tokens / stride. The token array is carried through ONE
    * projection (the explode) and sliced immediately, so no chunk text is
    * duplicated upstream of the final row. */
  def qChunk(spark: SparkSession, dir: String): DataFrame = {
    val chunk = slice(col("t"), col("start") + 1, lit(ChunkSize))
    Tables.documents(spark, dir)
      .select(col("doc_id"), toks(col("text")).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), size(col("t")) - 1, lit(ChunkStride))).as("start"))
      .select(col("doc_id"),
        (col("start").cast("long") / ChunkStride).cast("long").as("chunk_idx"),
        col("start").cast("long").as("chunk_start"),
        size(chunk).cast("long").as("n_chunk_tokens"),
        md5(array_join(chunk, " ")).as("chunk_fp"))
  }

  /** The fixed query of [[qBm25]] (a search capability demo needs A
    * query; parameterizing it is a string swap). */
  val Bm25Terms: Seq[String] = Seq("spark", "join", "window")
  val Bm25K = 10
  /** Reference vector for [[qHybridSearch]]: retrieval is "term matches,
    * re-ranked by semantic similarity to THIS document's embedding" —
    * vec_id aligns with doc_id in the fixture corpus. */
  val HybridQueryVec = 0L
  /** The standard reciprocal-rank-fusion constant (k = 60 throughout the
    * RRF literature and production search engines). */
  val RrfK = 60

  /** HYBRID retrieval — the RAG-serving pattern: lexical recall (BM25
    * top-[[Bm25K]]) re-ranked by embedding cosine against
    * [[HybridQueryVec]], the two rank lists fused with reciprocal-rank
    * fusion. RRF is kept in INTEGER micro-units — ⌊10⁶/(k+r)⌋ per arm —
    * so fusion scores, ties, and the final order are engine-identical
    * (float RRF would hinge on addition rounding).
    *
    * Scale shape: the expensive arms are both already bounded — BM25's
    * explode drops to query-term hits immediately, and the cosine arm
    * scores ONLY the candidate list (a broadcast-joined K-row frame), the
    * way a production reranker touches only retrieved candidates. The
    * fusion windows run over K rows. */
  def qHybridSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.ext.dedup.DedupQueries.quantized(spark, dir)
    val qv = broadcast(e.filter(col("vec_id") === HybridQueryVec)
      .select(col("v").as("qv"), col("nsq").as("qn")))
    val wc = org.apache.spark.sql.expressions.Window
      .orderBy(col("cosine").desc, col("doc_id"))
    val wf = org.apache.spark.sql.expressions.Window
      .orderBy(col("rrf_micro").desc, col("doc_id"))
    qBm25(spark, dir).select(col("doc_id"), col("rank").as("bm25_rank"))
      .join(e.withColumnRenamed("vec_id", "doc_id"), "doc_id")
      .crossJoin(qv)
      .withColumn("cosine", graft.ext.dedup.DedupQueries.cosine(
        col("qv"), col("v"), col("qn"), col("nsq")))
      .withColumn("cos_rank", row_number().over(wc).cast("long"))
      .withColumn("rrf_micro",
        expr(s"1000000 DIV ($RrfK + bm25_rank) + 1000000 DIV ($RrfK + cos_rank)"))
      .withColumn("rank", row_number().over(wf).cast("long"))
      .select(col("doc_id"), col("bm25_rank"), col("cos_rank"),
        col("rrf_micro"), col("rank"))
  }

  /** BM25 retrieval: top-[[Bm25K]] documents for a term query, scored with
    * the k1 = 1.2, b = 0.75 length-normalized BM25 formula kept ENTIRELY
    * in integer arithmetic — k1 and b enter as the rationals 6/5 and 3/4,
    * the average-document-length division is cleared by multiplying
    * through by 20·T (T = corpus token count), and the idf is the log-free
    * rational floor(1000·(N+1)/(df+1)) (log damping only compresses the
    * per-term range; same move as [[qTfidf]]). Every per-term score is a
    * floored integer division of exact BIGINTs, so scores and the top-K
    * cut are engine-identical.
    *
    * Shape: tokenize → filter to query terms BEFORE the (doc, term)
    * aggregate (the exploded stream drops to query-term hits immediately,
    * so the aggregate is hit-sized, not corpus-sized) → broadcast the
    * term-count-sized df table → one unpartitioned top-K window over
    * scoring docs. At 100 TB the corpus stats (N, T) come from the ingest
    * snapshot rather than a pre-pass, and the top-K is a
    * WindowGroupLimit — only K rows survive each partial. Integer
    * headroom: idf ≤ 10³·N, score numerator ≤ idf·tf·44·T — at extreme
    * N·T move the score to DECIMAL(38,0), same plan. */
  def qBm25(spark: SparkSession, dir: String): DataFrame = {
    // materialized ONCE as the shared doc_tokens snapshot: the totals
    // pre-pass and the hit explode would otherwise each run the full
    // tokenize (the dominant cost — measured 1.9 s vs 1.2 s at sf0.1),
    // and tfidf/hybrid re-ran it per query; at 100 TB this IS the
    // persisted tokenized/ ingest table every retrieval consumer reads
    val sized = tokenizedDocs(spark, dir)
    // corpus totals stay IN the plan: a 1-row aggregate broadcast
    // cross-joined onto every hit (not a driver .head() pre-pass, which
    // would split the query into two jobs and bake totals in as literals)
    val totals = sized.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("t_toks"))
    val tf = sized
      .select(col("doc_id"), col("dl"), explode(col("t")).as("term"))
      .filter(col("term").isin(Bm25Terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfTable = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bm25_milli").desc, col("doc_id"))
    tf.join(broadcast(dfTable), "term")
      .crossJoin(broadcast(totals))
      .withColumn("idf_k", expr("(1000 * (n_docs + 1)) DIV (df + 1)"))
      .withColumn("s", expr(
        "(idf_k * tf * 44 * t_toks) DIV " +
          "(20 * tf * t_toks + 6 * t_toks + 18 * dl * n_docs)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s")).as("bm25_milli"), count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= Bm25K)
  }

  /** Pairs kept by the BPE census. */
  val BpeK = 30

  /** Tokenizer-training inner loop: the frequency-weighted census of
    * adjacent character pairs over the corpus vocabulary — one iteration
    * of byte-pair encoding (BPE training repeats exactly this census,
    * merging the winner into a new symbol each round; the data shape per
    * round is identical). Top-[[BpeK]] pairs by weighted count, ties on
    * the pair string.
    *
    * Shape: the corpus collapses to its VOCABULARY first (explode →
    * word-keyed hash aggregate with map-side combine — the same shuffle
    * discipline as [[qHeavyHitters]]); the pair explosion then runs over
    * distinct words only, so its cost is vocab × avg-word-length no
    * matter how many tokens the corpus has. Zipf makes the vocabulary
    * bounded (≪ corpus) at any scale — this is why real BPE trainers also
    * precompute word frequencies. The final census aggregates on the
    * pair key (≤ |alphabet|² values) and top-K cuts via one bounded
    * sort. */
  def qBpePairs(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.rebalanced(spark, Tables.documents(spark, dir))
      .select(explode(toks(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
    words.filter(length(col("w")) >= 2)
      .select(col("w"), col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"), col("freq"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).as("pair_count"), count(lit(1)).as("n_contexts"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(BpeK)
  }

  /** Number of merge rounds [[qBpeTrain]] runs — like the k-means
    * trainer's fixed 3 Lloyd iterations, a fixed oracle-able prefix of
    * the training loop (production runs to a vocab-size budget). */
  val BpeMerges = 4

  /** Iterative BPE TRAINING — the actual merge loop, where [[qBpePairs]]
    * is only round one's census: each round counts adjacent symbol pairs
    * over the word vocabulary (weighted by word frequency), elects the
    * most frequent pair (ties: count desc, left asc, right asc — total
    * order, so the elected merge replays bit-identically), and rewrites
    * every word with the pair fused GREEDILY LEFT-TO-RIGHT (the BPE
    * convention: "o o o" under (o,o) becomes "oo o", not "o oo").
    * Output is the merge TABLE — (round, merge_left, merge_right,
    * pair_count), the artifact a BPE tokenizer ships — and each round's
    * count depends on every prior round's rewrite, so one wrong merge
    * anywhere fails the later rows of the oracle.
    *
    * The greedy rewrite is RELATIONAL, not a lambda scan: mark match
    * positions (lead over the word's symbol sequence), group consecutive
    * matches into runs (gaps-and-islands — runs longer than 1 occur only
    * for self-pairs like (o,o)), merge at ODD run offsets, drop consumed
    * positions, reassemble with an ordered collect. Window partitions
    * are single words (≤ word-length rows).
    *
    * Scale shape: the bpe_pairs contraction does the heavy lifting — the
    * corpus collapses to its Zipf-bounded VOCABULARY before the loop, so
    * every round's passes are vocab × word-length rows, never
    * corpus-sized; the driver holds one elected pair per round (the
    * k-means centroid-collect pattern, K=1); vocabulary re-checkpoints
    * per round to truncate lineage like the components loop. */
  def qBpeTrain(spark: SparkSession, dir: String): DataFrame =
    bpeArtifacts(spark, dir)._1

  /** The merged vocabulary AFTER the [[qBpeTrain]] loop — exposed for the
    * spec's driver replay (the merge table alone does not show the final
    * word segmentations). */
  private[graft] def bpeFinalVocab(spark: SparkSession, dir: String): DataFrame =
    bpeArtifacts(spark, dir)._2

  /** The trained tokenizer as suite-scoped snapshot artifacts — (merge
    * table, final word-segmentation vocabulary). The training loop runs
    * AT MOST ONCE per suite (the corpusIndex shared-build discipline):
    * both artifacts derive from one [[bpeTrainLoop]] call on a cold
    * build, and bpe_train / bpe_encode / the spec hooks all read the
    * same materialization — exactly the deployment shape, where a
    * tokenizer is trained once per corpus version and shipped to every
    * consumer. */
  private[graft] def bpeArtifacts(spark: SparkSession,
                                  dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    var computed: Option[(Seq[(Long, String, String, Long)], org.apache.spark.sql.DataFrame)] = None
    def loop = {
      if (computed.isEmpty) computed = Some(bpeTrainLoop(spark, dir))
      computed.get
    }
    val mt = graft.util.SnapshotCache.snapshot("bpe_merges", spark, dir)(
      loop._1.toDF("round", "merge_left", "merge_right", "pair_count"))
    val fv = graft.util.SnapshotCache.snapshot("bpe_vocab", spark, dir)(loop._2)
    (mt, fv)
  }

  /** BPE ENCODING — the trained tokenizer APPLIED to the corpus, closing
    * the lifecycle ([[qBpePairs]] census → [[qBpeTrain]] merge loop →
    * encode): every document's token stream under the final
    * segmentation vocabulary, reported as per-doc word/BPE-token counts
    * plus an order-exact stream signature (md5 of the position-ordered
    * segment sequence — one transposed or mis-segmented token anywhere
    * fails the hash gate; the text_token_ids ids_sig discipline). The
    * token-budget number a training run actually plans with is
    * n_bpe_tokens under the REAL tokenizer, not the whitespace proxy.
    *
    * Shape: the segmentation vocabulary is Zipf-bounded and broadcasts
    * (a production 100k-merge vocab is still kilobytes-per-entry); the
    * corpus pass is one narrow posexplode + broadcast join + one
    * doc-keyed aggregate — linear in corpus tokens, no corpus-sized
    * shuffle beyond the doc-key collect. Every corpus word hits the
    * vocabulary by construction (trained on the same corpus); an
    * out-of-corpus encode would left-join with a char-fallback instead. */
  def qBpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncoded(spark, dir)
      .select(col("doc_id"), col("n_words"), col("n_bpe_tokens"), col("seq_sig"))

  /** The doc-grain ENCODED frame behind [[qBpeEncode]] / [[qBpeEval]] /
    * CurateQueries.qPackSequences, as a suite-scoped snapshot: the
    * corpus is tokenized ONCE per corpus version and the token-count /
    * signature stats are what every downstream consumer (budgeting,
    * packing, fertility audits) reads — the materialized
    * `tokenized/` table of a production pipeline. Adds `n_word_chars`
    * (total characters across the doc's words — the denominator of the
    * compression audit) to the gate columns. */
  private[graft] def bpeEncoded(spark: SparkSession, dir: String): DataFrame =
    graft.util.SnapshotCache.snapshot("bpe_encoded", spark, dir) {
      val segs = bpeArtifacts(spark, dir)._2
        .select(regexp_replace(col("sym"), " ", "").as("w"), col("sym").as("seg"),
          size(split(col("sym"), " ")).cast("long").as("nseg"))
      Tables.rebalanced(spark, Tables.documents(spark, dir))
        .select(col("doc_id"), posexplode(toks(col("text"))).as(Seq("pos", "w")))
        .join(broadcast(segs), Seq("w"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("nseg")).as("n_bpe_tokens"),
          sum(length(col("w")).cast("long")).as("n_word_chars"),
          md5(concat_ws(" ", transform(
            array_sort(collect_list(struct(col("pos"), col("seg")))),
            x => x.getField("seg")))).as("seq_sig"))
    }

  /** Tokenizer CALIBRATION CARD — the eval every trained artifact ships
    * before its numbers drive decisions (the text_lm_eval / ann_eval
    * discipline): per source, corpus-weighted FERTILITY (BPE tokens per
    * 1000 words — the multiplier that converts a word budget into the
    * token budget a training run is actually priced in) and
    * CHARS-PER-TOKEN (word characters per 1000 BPE tokens — the
    * compression the merge table actually bought, the number a tokenizer
    * bake-off compares). Both integer-milli via exact floor division, so
    * the card hash-matches the oracle bit-for-bit.
    *
    * Shape: a 1:1 doc-keyed join of the snapshotted encode frame against
    * a two-column documents projection, then a ~|sources|-row aggregate
    * with map-side combine — probe-side cost only, the trained encode
    * frame is read, never rebuilt. */
  def qBpeEval(spark: SparkSession, dir: String): DataFrame =
    bpeEncoded(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")),
        Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_bpe_tokens")).as("n_bpe_tokens"),
        sum(col("n_word_chars")).as("n_word_chars"))
      .withColumn("fertility_milli",
        expr("(1000 * n_bpe_tokens) DIV n_words"))
      .withColumn("chars_per_token_milli",
        expr("(1000 * n_word_chars) DIV n_bpe_tokens"))

  /** Adjacent-pair frame of a symbol-sequence vocab: each word's
    * (symbol, successor) pairs by ARRAY SLICING — per-row, no shuffle
    * (r14, VERDICT r13 #7: the previous `lead() OVER (PARTITION BY
    * sym)` form shuffled the vocab×word-length frame on the word key
    * once per census and TWICE per rewrite, which was the whole
    * snapshot_build critical path — the bpe chain at 9–11 s of the
    * section). A word is its own tiny ordered sequence; pairing within
    * it never needed a distributed window. The higher-order functions
    * here are CodegenFallback (interpreted inside the codegen'd stage) —
    * the win is the removed shuffles, not codegen. */
  private def bpePairFrame(vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val syms = split(col("sym"), " ")
    vocab.select(col("freq"),
      explode(zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("freq"))
  }

  /** Greedy left-to-right merge of pair (bl, br) over ONE word's symbol
    * array, as a fold (`aggregate` over the (symbol, successor)
    * zip): state is (rewritten-prefix, consumed-next?) — a matched pair
    * emits the fused symbol and consumes its right side, which is exactly
    * the BPE scan order including self-pair runs ("o o o" → "oo o", the
    * odd-offset rule, falls out of the consume flag). The finish lambda
    * restores the last symbol unless the final pair consumed it. Word
    * arrays are character-bounded, so the quadratic-looking prefix
    * concat is a few tiny copies per word. */
  private def bpeMergeExpr(syms: Column, bl: Column, br: Column): Column = {
    val pairs = zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("s"), b.as("nx")))
    aggregate(
      pairs,
      struct(typedLit(Seq.empty[String]).as("out"), lit(false).as("skip")),
      (acc, p) => {
        val out = acc.getField("out"); val skip = acc.getField("skip")
        val s = p.getField("s"); val nx = p.getField("nx")
        when(skip, struct(out.as("out"), lit(false).as("skip")))
          .when(s === bl && nx === br,
            struct(concat(out, array(concat(bl, br))).as("out"),
              lit(true).as("skip")))
          .otherwise(struct(concat(out, array(s)).as("out"),
            lit(false).as("skip")))
      },
      acc => when(acc.getField("skip"), acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(element_at(syms, -1)))))
  }

  /** The loop: (merge table rows, final vocabulary). */
  private def bpeTrainLoop(spark: SparkSession,
                           dir: String): (Seq[(Long, String, String, Long)], org.apache.spark.sql.DataFrame) = {
    var vocab = Tables.rebalanced(spark, Tables.documents(spark, dir))
      .select(explode(toks(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("sym"), col("freq"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var round = 1
    var exhausted = false
    while (round <= BpeMerges && !exhausted) {
      val best = graft.util.Bounded.boundedCollect(
        bpePairFrame(vocab)
          .groupBy(col("l"), col("r"))
          .agg(sum(col("freq")).as("c"))
          .orderBy(col("c").desc, col("l"), col("r"))
          .limit(1), 1, "bpe best pair")
      if (best.isEmpty) exhausted = true
      else {
        val (bl, br, bc) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        merges += ((round.toLong, bl, br, bc))
        vocab = bpeApplyMerge(vocab, bl, br).localCheckpoint()
        round += 1
      }
    }
    (merges.toSeq, vocab)
  }

  /** One greedy left-to-right merge pass of pair (bl, br) over every
    * word — a pure projection through [[bpeMergeExpr]]: no shuffle, no
    * window, no join (r14; the relational windows-and-join form this
    * replaces cost ~5 vocab-frame shuffles per round and set the
    * snapshot_build critical path). Word identity is preserved (a sym
    * with spaces removed IS its word), so the (sym, freq) grain needs no
    * re-aggregation. Gated by TextModelSpec's independent driver-side
    * greedy BPE replay and the unrolled DuckDB oracle. */
  private def bpeApplyMerge(vocab: org.apache.spark.sql.DataFrame,
                            bl: String, br: String): org.apache.spark.sql.DataFrame =
    vocab.select(
      concat_ws(" ",
        bpeMergeExpr(split(col("sym"), " "), lit(bl), lit(br))).as("sym"),
      col("freq"))

  /** Integer weights of the quality model, in micro-logit units: keep
    * score = [[QmBias]] + [[QmWAlpha]]·alpha_micro + [[QmWStop]]·stop_micro
    * + [[QmWLen]]·len_ok, where the ratio features are floored integer
    * micro-fractions. Chosen so the corpus splits into both classes (the
    * spec asserts it); a trained model swaps the constants. */
  val QmBias = -1300000L
  val QmWAlpha = 1L
  val QmWStop = 3L
  val QmWLen = 500000L

  /** Model-based quality filtering: a linear classifier over cheap text
    * features, evaluated ENTIRELY in integer arithmetic — the
    * FineWeb/CCNet-style "score every document with a small model, keep
    * above threshold" stage, with integer-quantized weights and features
    * so the logit, and therefore the keep/drop cut, is engine-identical
    * (a float sigmoid would only rescale the threshold; the sign of the
    * logit IS the decision).
    *
    * Shape: one narrow codegen'd projection — no shuffle at any scale;
    * the output feeds the same downstream as [[quality]]'s heuristic
    * score. Features: alpha ratio and stopword ratio as floored
    * micro-fractions (integer `div`), plus the length-band indicator. */
  def qQualityModel(spark: SparkSession, dir: String): DataFrame = {
    val t = coalesce(col("text"), lit(""))
    Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      length(t).cast("long").as("n_chars"),
      length(regexp_replace(t, "[^A-Za-z]", "")).cast("long").as("n_alpha"),
      size(toks(col("text"))).cast("long").as("n_tokens"),
      score(toks(col("text")), profiles.head._2).as("n_stopwords"))
      .select(col("doc_id"), col("lang"),
        expr("n_alpha * 1000000 DIV greatest(n_chars, 1)").as("alpha_micro"),
        expr("n_stopwords * 1000000 DIV greatest(n_tokens, 1)").as("stop_micro"),
        when(col("n_tokens").between(20, 2000), lit(1L)).otherwise(lit(0L)).as("len_ok"))
      .withColumn("logit_micro",
        lit(QmBias) + lit(QmWAlpha) * col("alpha_micro") +
          lit(QmWStop) * col("stop_micro") + lit(QmWLen) * col("len_ok"))
      .withColumn("keep", col("logit_micro") > 0)
  }

  /** Minimum distinct documents a shingle must appear in to count as
    * boilerplate, and the size of the reported census. */
  val BoilerplateMinDocs = 3
  val BoilerplateK = 50

  /** Boilerplate detection: the 3-word shingles repeated across at least
    * [[BoilerplateMinDocs]] distinct documents, with how many documents
    * and how many distinct sources each appears in — the C4/MassiveText
    * "remove text repeated verbatim across pages" pre-pass, at shingle
    * grain because this corpus has no line structure (TESTDATA.md). A
    * shingle spanning many sources is template/chrome boilerplate; one
    * confined to a single source is a mirror or a near-dup cluster —
    * downstream scrubbing treats them differently, which is why
    * `n_sources` rides along.
    *
    * Shape: the shared single-projection shingle build
    * ([[graft.ext.dedup.DedupQueries.shingleRowsOf]], `source` carried)
    * → ONE shingle-keyed hash aggregate (map-side combine collapses each
    * partition's repeats before the exchange) → bounded top-K sort.
    * `count(*)` IS the document frequency because the build already
    * dedups shingles within a document. At 100 TB the aggregate output is
    * vocabulary-sized (zipfian, ≪ corpus) and the top-K is a
    * TakeOrderedAndProject — only K rows survive each partial. */
  def qBoilerplate(spark: SparkSession, dir: String): DataFrame =
    // reads the shared shingle_rows artifact (r16 optimization round):
    // the snapshot is the same (doc_id, source, s) build pre-distinct
    // (dedup=false), so the per-doc distinct here reproduces the former
    // dedup=true grain exactly — tokenize+explode paid once suite-wide
    graft.ext.dedup.DedupQueries.shingleRowsSnapshot(spark, dir)
      .select(col("doc_id"), col("source"), col("s")).distinct()
      .groupBy(col("s"))
      .agg(count(lit(1)).as("doc_freq"),
        countDistinct(col("source")).as("n_sources"))
      .filter(col("doc_freq") >= BoilerplateMinDocs)
      .orderBy(col("doc_freq").desc, col("s"))
      .limit(BoilerplateK)
      .select(col("s").as("shingle"), col("doc_freq"), col("n_sources"))

  /** Per-document n-gram novelty — the log-free perplexity proxy: what
    * fraction of a document's distinct shingles appear NOWHERE else in
    * the corpus. Freshly-written text scores near 1000 (all shingles
    * corpus-unique); templated, boilerplate-heavy, or duplicated text
    * scores near 0 (a near-dup's shingles all have df ≥ 2) — the same
    * rarity axis CCNet's LM perplexity buckets capture, kept ALL-INTEGER
    * (`⌊1000·n_unique/n_shingles⌋`) so the score and any threshold cut on
    * it are engine-identical.
    *
    * Shape: NO join back on the shingle key. Only df = 1 shingles
    * contribute to the numerator, and a df = 1 shingle's posting list IS
    * its one document — so the shingle-keyed aggregate carries
    * `min(doc_id)` along with the count, filters to df = 1, and
    * re-aggregates per doc. The denominator is a doc-keyed count over the
    * same shingle rows. That removes the classic fan-out (joining every
    * shingle row against its df would replicate a corpus-hot shingle df
    * times); what remains is two map-side-combinable aggregates keyed on
    * real data grain (shingle, then doc) plus one doc-keyed join of two
    * per-doc frames. The shingle rows materialize ONCE (the tokenize is
    * the dominant cost — same move and rationale as [[qBm25]]'s `sized`);
    * at 100 TB the checkpoint becomes the shingle-index snapshot the
    * dedup family already persists. Docs whose every shingle recurs
    * elsewhere simply have no df = 1 row — the left join + coalesce(0)
    * keeps them at novelty 0, not dropped. */
  def qNovelty(spark: SparkSession, dir: String): DataFrame =
    // reads the shared shingle_rows artifact (r16): distinct over the
    // materialized multiset ≡ the former dedup=true build; the checkpoint
    // still materializes the distinct once for the two aggregates below
    noveltyFrom(graft.ext.dedup.DedupQueries.shingleRowsSnapshot(spark, dir)
      .select(col("doc_id"), col("s")).distinct()
      .localCheckpoint())

  /** The novelty aggregates over an already-materialized (doc_id, s)
    * shingle frame — split out so the plan dossier can audit the full
    * un-checkpointed pipeline ([[graft.tools.Explain]]). */
  private[graft] def noveltyFrom(sh: DataFrame): DataFrame = {
    val nSh = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val uniq = sh.groupBy(col("s"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("doc_id"))
      .filter(col("df") === 1)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_unique"))
    nSh.join(uniq, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"))
      .withColumn("novelty_milli", expr("(1000 * n_unique) DIV n_shingles"))
  }

  /** Query phrases for [[qPhraseSearch]] — 3-token literals, the shared
    * shingle width, chosen to actually occur in the corpus so the result
    * exercises real hits. */
  val SearchPhrases: Seq[String] = Seq("slow hash batch", "row column sort")

  /** Exact-phrase search: per (phrase, doc), how many times the phrase
    * occurs verbatim — the retrieval primitive BM25's bag-of-words
    * scoring cannot express (term adjacency), served off the SAME
    * 3-token shingle definition as the dedup/repetition family, so a
    * phrase index IS the span family's window artifact at shingle width.
    * Multiset shingles (dedup = false) count within-doc repeats, not
    * just presence.
    *
    * Shape: the phrase literals filter the narrow shingle projection
    * IMMEDIATELY (the BM25 discipline — hits-sized data from the first
    * operator on), so the one aggregate exchange carries only matching
    * (phrase, doc) rows. At 100 TB the same query runs as a lookup into
    * the persisted shingle posting-list artifact instead of a rescan —
    * the plan above the filter is identical. */
  def qPhraseSearch(spark: SparkSession, dir: String): DataFrame =
    // reads the shared shingle_rows artifact (r16): the phrase literals
    // filter the materialized rows instead of re-tokenizing the corpus —
    // the "lookup into the persisted shingle posting-list artifact" the
    // docstring's at-scale story already promised
    DedupQueries.shingleRowsSnapshot(spark, dir)
      .filter(col("s").isin(SearchPhrases: _*))
      .groupBy(col("s"), col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
      .select(col("s").as("phrase"), col("doc_id"), col("n_occurrences"))

  /** Vocabulary size for [[qVocab]]/[[qTokenIds]] — deliberately smaller
    * than this corpus's 31-token vocabulary so the OOV path is genuinely
    * exercised (7 token types fall out). */
  val VocabK = 24

  /** Sentinel id for out-of-vocabulary tokens. */
  val OovId = -1L

  /** The tokenizer's ID TABLE: the top-[[VocabK]] tokens by corpus
    * frequency (ties broken by token text — a total order, so the table
    * replays bit-identically), each with its dense id and count. The
    * word-level analog of a trained tokenizer vocabulary; bpe_pairs is
    * the subword census that would refine it.
    *
    * Shape: the corpus collapses to its Zipf-bounded vocabulary in one
    * map-side-combinable aggregate; the top-K cut is
    * TakeOrderedAndProject (K rows per partial) and the id window runs
    * over K rows. */
  def qVocab(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.rebalanced(spark, Tables.documents(spark, dir))
      .select(explode(TextNorm.toks(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token")).limit(VocabK)
      .withColumn("id",
        row_number().over(Window.orderBy(col("n_occurrences").desc, col("token")))
          .cast("long") - 1L)
      .select(col("token"), col("id"), col("n_occurrences"))
  }

  /** Tokenization APPLIED: every doc's token sequence mapped through the
    * [[qVocab]] id table (OOV → [[OovId]]), with the id SEQUENCE itself
    * under the hash gate — `ids_sig` is the md5 of the position-ordered
    * id string, so a single transposed or mis-mapped id anywhere in the
    * corpus fails the oracle. Plus the per-doc OOV stats a coverage
    * report needs. Docs whose normalized text is empty have no sequence
    * and no row (grain = docs with ≥ 1 token, like the explode).
    *
    * Shape: posexplode is narrow; the vocab attach is a broadcast join
    * against the K-row table; the per-doc re-assembly is one doc-keyed
    * aggregate (collect_list + array_sort over that doc's own tokens).
    * At real vocab sizes the id table stays broadcast-sized (a 100k-row
    * map is kilobytes); nothing else changes. */
  def qTokenIds(spark: SparkSession, dir: String): DataFrame = {
    val vocab = qVocab(spark, dir).select(col("token"), col("id"))
    Tables.rebalanced(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), posexplode(TextNorm.toks(col("text"))).as(Seq("pos", "token")))
      .join(broadcast(vocab), Seq("token"), "left")
      .withColumn("id", coalesce(col("id"), lit(OovId)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum((col("id") === OovId).cast("long")).as("n_oov"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("id")))),
            x => x.getField("id").cast("string")))).as("ids_sig"))
      .withColumn("oov_milli", expr("(1000 * n_oov) DIV n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"), col("oov_milli"),
        col("ids_sig"))
  }

  /** Percent of docs forming the LM training split (hash-deterministic —
    * the sample_split / ErBasePct discipline). */
  val LmTrainPct = 80L

  /** Bigram-LM familiarity score — the engine's CCNet-shaped quality
    * filter: score each document by how familiar its token BIGRAMS are to
    * a language model trained on a held-out split of the corpus, so
    * word-salad and boilerplate-mangled text (rare transitions) scores low
    * while fluent text (frequent transitions) scores high. The usual
    * deployment trains on a trusted corpus (Wikipedia in CCNet) and
    * filters the crawl by perplexity band; here the trusted split is the
    * deterministic [[LmTrainPct]] hash split of the same table.
    *
    * Exactness: real perplexity sums float log-probs — engine-unhashable.
    * This gate uses the LOG2-QUANTIZED familiarity
    *
    *   fam(b) = floor(log2(1 + count_train(b))) = length(bin(1+cnt)) − 1
    *
    * (exact in both engines via the binary-string length — no float log
    * anywhere), and scores lm_milli = 1000·Σfam DIV n_bigrams. Monotone
    * in the true log-probability numerator, integer end to end; unseen
    * bigrams contribute 0, the add-one floor of smoothing.
    *
    * Shape: bigram rows are one narrow zip-slice projection per doc (the
    * shingleRows build at width 2, multiset — LM counts weigh repeats);
    * the train aggregate is vocabulary-sized with map-side combine; the
    * scoring join is keyed by bigram — the canonical LM-scoring shuffle,
    * linear in corpus tokens. At 100 TB the count table is the persisted
    * artifact and the score pass is one join + one doc-keyed aggregate;
    * a df-cap on mega-hot bigrams is unnecessary because the join
    * fan-out is 1:1 (counts are unique per bigram). */
  def qLmScore(spark: SparkSession, dir: String): DataFrame =
    lmScoreSnapshot(spark, dir)

  /** The doc-grain score frame as a suite-scoped snapshot artifact:
    * three consumers read it (text_lm_score itself, text_lm_eval's
    * calibration, text_ppl_buckets' partitioner), and per-doc scores
    * given a frozen model never change — so the corpus-sized scoring
    * join is paid once, not once per consumer. At 100 TB this is the
    * scored-corpus parquet a deployment writes right after training the
    * count table; every downstream read is doc-grain. */
  private[graft] def lmScoreSnapshot(spark: SparkSession, dir: String): DataFrame =
    graft.util.SnapshotCache.snapshot("lm_scores", spark, dir) {
      // one materialized bigram stream feeds the count fit, the scoring
      // pass, AND (since r16) the ppl incremental model — the corpus is
      // tokenized into bigrams exactly once suite-wide
      val bigrams = lmBigrams(spark, dir)
      scoreBigramsAgainstCounts(bigrams, lmCountsFrom(spark, dir)(bigrams))
    }

  /** The corpus-wide (doc_id, is_train, inc, bg) bigram stream as ONE
    * suite-scoped snapshot (r16 optimization round, guide §1.2/§2.4): the
    * LM score build and the ppl incremental model previously each ran
    * their own scan→tokenize→bigram pass over near-identical inputs. The
    * `inc` flag marks the incoming slice so [[pplArtifacts]] derives its
    * corpus-minus-incoming stream by FILTER over the same materialization
    * (filter commutes with the per-doc bigram explode, so values are
    * bit-identical to the former private builds). */
  private[graft] def lmBigrams(spark: SparkSession, dir: String): DataFrame =
    graft.util.SnapshotCache.snapshot("lm_bigrams", spark, dir)(
      bigramRows(lmTagged(spark, dir), carry = Seq("inc"),
        prep = _.withColumn("inc",
          col("source") === graft.ext.dedup.DedupQueries.IncomingSource)))

  /** The LM lifecycle split (the corpusIndex / screenAgainstIndex shape
    * of the dedup and ER families): (tagged doc frame, trained bigram
    * count table). At deployment the count table is the persisted
    * artifact of the last training run; here it rebuilds from the hash
    * split so the batch query and its streaming twin score against the
    * SAME model (StreamPipelineSpec drives the twin through this hook). */
  private[graft] def lmArtifacts(spark: SparkSession,
                                 dir: String): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val docs = lmTagged(spark, dir)
    (docs, lmCountsFrom(spark, dir)(bigramRows(docs)))
  }

  /** The trained count table is itself a snapshot artifact (the thing a
    * deployment persists per model version) so the streaming twin and
    * any re-score screen against the SAME materialization; the bigram
    * frame is a parameter so lm_scores can pass its shared scratch
    * checkpoint (by-name: a warm lm_counts builds nothing). */
  private def lmCountsFrom(spark: SparkSession, dir: String)
                          (bgRows: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    graft.util.SnapshotCache.snapshot("lm_counts", spark, dir)(
      bgRows.filter(col("is_train"))
        .groupBy(col("bg")).agg(count(lit(1)).as("cnt")))

  /** The scoring pass given the PERSISTED count table — per-doc scores
    * are independent given the model, so micro-batch outputs union to
    * the one-shot answer (the streaming-twin contract). `batch` needs
    * (doc_id, is_train, text). */
  private[graft] def scoreAgainstCounts(batch: org.apache.spark.sql.DataFrame,
                                        counts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    scoreBigramsAgainstCounts(bigramRows(batch), counts)

  /** [[scoreAgainstCounts]] over a PRE-BUILT (doc_id, is_train, bg)
    * bigram frame — lets a builder share one materialized bigram stream
    * across the count fit and the threshold scoring (pplArtifacts). */
  private[graft] def scoreBigramsAgainstCounts(bgRows: org.apache.spark.sql.DataFrame,
                                               counts: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    bgRows.join(counts, Seq("bg"), "left")
      .withColumn("fam", length(bin(lit(1L) + coalesce(col("cnt"), lit(0L)))).cast("long") - 1L)
      .groupBy(col("doc_id"))
      .agg(max(col("is_train")).as("is_train"),
        count(lit(1)).as("n_bigrams"), sum(col("fam")).as("fam_sum"))
      .withColumn("lm_milli", expr("(1000 * fam_sum) DIV n_bigrams"))
      .select(col("doc_id"), col("is_train"), col("n_bigrams"), col("fam_sum"),
        col("lm_milli"))

  /** Calibration card for the LM screen — the family discipline (every
    * scored screen ships its eval): cross-tabulate [[qLmScore]]'s
    * familiarity verdict against the INDEPENDENT [[qQualityModel]] keep
    * decision, so a deployment sees whether the two quality signals
    * agree before wiring either as a gate. "Low by LM" = lm_milli below
    * the corpus lower median, computed exactly through the value-grain
    * contraction (lm_milli is bounded, so the cumulative window runs
    * over ≤ |distinct scores| rows — never doc-sized; the same
    * count-of-COUNTS rule as q_skew_metrics' quantiles).
    *
    * One summary row: doc count, the median threshold, the 2×2 confusion
    * counts, and agreement in milli — all exact integers. Disagreement
    * is not an error: the two screens measure different things (fluency
    * vs feature heuristics); the card makes the overlap a number. */
  def qLmEval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lm = qLmScore(spark, dir).select(col("doc_id"), col("lm_milli"))
    val qm = qQualityModel(spark, dir).select(col("doc_id"), col("keep"))
    val joined = lm.join(qm, "doc_id")
    val vals = joined.groupBy(col("lm_milli")).agg(count(lit(1)).as("c"))
    val med = vals
      .withColumn("cum", sum(col("c")).over(
        Window.orderBy("lm_milli").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(joined.agg(count(lit(1)).as("n"))))
      .filter(col("cum") * 2 >= col("n"))
      .agg(min(col("lm_milli")).as("lm_median"))
    joined.crossJoin(broadcast(med))
      .withColumn("above", col("lm_milli") >= col("lm_median"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("lm_median")).as("lm_median"),
        sum((col("keep") && col("above")).cast("long")).as("n_keep_above"),
        sum((col("keep") && !col("above")).cast("long")).as("n_keep_below"),
        sum((!col("keep") && col("above")).cast("long")).as("n_drop_above"),
        sum((!col("keep") && !col("above")).cast("long")).as("n_drop_below"))
      .withColumn("agree_milli",
        expr("(1000 * (n_keep_above + n_drop_below)) DIV n_docs"))
  }

  /** CCNet's actual OUTPUT partitioning — head/middle/tail perplexity
    * terciles per language (Wenzek et al. 2020 §4.3: the crawl is split
    * into three equal buckets by LM perplexity percentile within each
    * language, and most downstream corpora train on head+middle only).
    * [[qLmScore]] is the screen; this is the partitioner a deployment
    * writes its output shards by.
    *
    * Exactness: bucket cut-points are RANK-based, not score-based — doc
    * with tie-group max-rank r (out of the language's N scored docs,
    * ranked by lm_milli DESCENDING, so most-familiar = lowest perplexity
    * = head) lands in bucket (3·(r−1)) DIV N ∈ {0,1,2}. Every doc in a
    * tie group shares r, so ties NEVER straddle a bucket boundary
    * (bucket sizes flex by at most the tie-group width — the price of
    * determinism, exactly how CCNet's score cut-points behave). Integer
    * end to end.
    *
    * Shape: the rank never touches doc grain — lm_milli is bounded, so
    * ranks come from a cumulative count over the (lang × score) VALUE
    * grain (the q_global_rank two-phase discipline: ≤ |langs|·|scores|
    * rows under the window, never a doc-sized per-lang sort), and the
    * bucket map broadcasts back onto docs. Grain = scored docs (< 2
    * tokens ⇒ no bigrams ⇒ no score ⇒ no row, like qLmScore). At 100 TB
    * the only fact-sized passes are the score itself and one broadcast
    * join. */
  def qPplBuckets(spark: SparkSession, dir: String): DataFrame = {
    val scored = qLmScore(spark, dir).select(col("doc_id"), col("lm_milli"))
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
    scored.join(broadcast(tercileMap(scored)
        .withColumn("ppl_bucket",
          when(col("bucket_id") === 0, "head")
            .when(col("bucket_id") === 1, "middle").otherwise("tail"))),
        Seq("lang", "lm_milli"))
      .select(col("doc_id"), col("lang"), col("lm_milli"),
        col("bucket_id"), col("ppl_bucket"))
  }

  /** The tercile kernel shared by [[qPplBuckets]] and the incremental
    * variant's threshold build: the (lang, lm_milli) → bucket_id map from
    * a scored frame, via the value-grain cumulative rank (never a
    * doc-sized sort). `scored` needs (doc_id, lang, lm_milli). */
  private def tercileMap(scored: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grain = scored.groupBy(col("lang"), col("lm_milli"))
      .agg(count(lit(1)).as("c"))
    val cum = grain.withColumn("cum_ge",
      sum(col("c")).over(Window.partitionBy("lang").orderBy(col("lm_milli").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perLang = scored.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    cum.join(broadcast(perLang), "lang")
      .withColumn("bucket_id", expr("(3 * (cum_ge - 1)) DIV n_lang"))
      .select(col("lang"), col("lm_milli"), col("bucket_id"))
  }

  /** The perplexity-bucket lifecycle step — new-batch docs (the
    * [[graft.ext.dedup.DedupQueries.IncomingSource]] slice, the family's
    * incoming-batch convention) bucketed against FROZEN corpus artifacts:
    * the bigram count table trained on the corpus's train split and the
    * per-language tercile cut scores derived from the corpus's own bucket
    * assignment. This is how CCNet actually deploys — thresholds are
    * computed once per model version and each crawl batch is scored and
    * routed against them, NOT re-ranked against a moving corpus (which
    * would reassign already-written shards).
    *
    * Bucket rule for a batch doc: score ≥ lo(head) → head; else if the
    * corpus produced a middle bucket and score ≥ lo(middle) → middle;
    * else tail — so a batch score BETWEEN two corpus buckets falls to the
    * lower bucket (routing is conservative), and a language the corpus
    * never scored sends the whole batch to tail (don't train on unvetted
    * data until the next threshold build). lo(bucket) = the corpus's min
    * lm_milli in that bucket; head is non-empty for every scored corpus
    * language (rank 1 always lands in bucket 0), middle needs ≥ 2 docs.
    *
    * Shape: artifacts are snapshot-cached (counts: vocabulary-sized;
    * thresholds: ≤ |langs| rows, broadcast); the probe side is
    * batch-bounded end to end — score join + two broadcast attaches. The
    * same screenAgainstIndex discipline as the dedup/ER incrementals;
    * per-doc verdicts given frozen artifacts are independent, so
    * micro-batch outputs union to the one-shot answer (the streaming-twin
    * contract, drivable from a foreachBatch sink via
    * [[bucketAgainstThresholds]]). */
  def qPplBucketsIncremental(spark: SparkSession, dir: String): DataFrame = {
    val (counts, thresholds) = pplArtifacts(spark, dir)
    val batch = lmTagged(spark, dir)
      .filter(col("source") === graft.ext.dedup.DedupQueries.IncomingSource)
    bucketAgainstThresholds(batch, counts, thresholds)
  }

  /** The persisted artifacts of the incremental bucket screen: the corpus-
    * trained bigram count table and the per-language tercile cut scores
    * (lang, lo_head, lo_mid). Corpus = every doc OUTSIDE the incoming
    * slice; the count table trains on its [[LmTrainPct]] hash split. */
  private[graft] def pplArtifacts(spark: SparkSession,
                                  dir: String): (DataFrame, DataFrame) = {
    // a FILTER over the shared corpus-wide bigram snapshot (r16): the
    // incremental model's stream is lm_bigrams minus the incoming slice —
    // the tokenize+bigram pass is paid once suite-wide instead of once
    // per model. Lazy so two warm snapshots below build nothing.
    lazy val bigrams = lmBigrams(spark, dir).filter(!col("inc"))
    val counts = graft.util.SnapshotCache.snapshot("ppl_inc_counts", spark, dir)(
      bigrams.filter(col("is_train"))
        .groupBy(col("bg")).agg(count(lit(1)).as("cnt")))
    val thresholds = graft.util.SnapshotCache.snapshot("ppl_inc_thresholds", spark, dir) {
      val scored = scoreBigramsAgainstCounts(bigrams, counts)
        .select(col("doc_id"), col("lm_milli"))
        .join(Tables.documents(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
      tercileMap(scored).groupBy(col("lang")).agg(
        min(when(col("bucket_id") === 0, col("lm_milli"))).as("lo_head"),
        min(when(col("bucket_id") === 1, col("lm_milli"))).as("lo_mid"))
    }
    (counts, thresholds)
  }

  /** Probe-side routing of a BATCH (doc_id, source, is_train, text, lang
    * via re-join) against frozen artifacts — the foreachBatch-drivable
    * kernel. `batch` needs (doc_id, is_train, text); lang re-attaches by
    * doc_id from the batch frame itself. */
  private[graft] def bucketAgainstThresholds(batch: DataFrame, counts: DataFrame,
                                             thresholds: DataFrame): DataFrame =
    scoreAgainstCounts(batch, counts)
      .select(col("doc_id"), col("lm_milli"))
      .join(batch.select(col("doc_id"), col("lang")), "doc_id")
      .join(broadcast(thresholds), Seq("lang"), "left")
      .withColumn("bucket_id",
        when(col("lm_milli") >= col("lo_head"), 0L)
          .when(col("lo_mid").isNotNull && col("lm_milli") >= col("lo_mid"), 1L)
          .otherwise(2L))
      .withColumn("ppl_bucket",
        when(col("bucket_id") === 0, "head")
          .when(col("bucket_id") === 1, "middle").otherwise("tail"))
      .select(col("doc_id"), col("lang"), col("lm_milli"),
        col("bucket_id"), col("ppl_bucket"))

  /** The tokenized corpus as a suite-scoped snapshot — (doc_id, dl,
    * token array), one row per document (empty array when the text
    * yields no token, so doc counts over this frame equal counts over
    * the raw table). The `tokenized/` ingest table of a production
    * pipeline: the whitespace/regex tokenize is the dominant cost of
    * every retrieval query, so bm25 / tfidf / hybrid (and the corpus
    * stats they carry in-plan) read the artifact instead of each
    * re-running the scan+tokenize. */
  private[graft] def tokenizedDocs(spark: SparkSession, dir: String): DataFrame =
    graft.util.SnapshotCache.snapshot("doc_tokens", spark, dir) {
      Tables.rebalanced(spark, Tables.documents(spark, dir))
        .select(col("doc_id"), toks(col("text")).as("t"))
        .select(col("doc_id"), size(col("t")).cast("long").as("dl"), col("t"))
    }

  /** Documents tagged with the LM train split — the shared base frame of
    * [[lmArtifacts]] and the incremental bucket screen. */
  private def lmTagged(spark: SparkSession, dir: String): DataFrame =
    Tables.rebalanced(spark, Tables.documents(spark, dir))
      .withColumn("is_train",
        pmod(graft.functions.Exact.md5Long(concat(lit("lmb|"), col("doc_id"))),
          lit(100L)) < LmTrainPct)

  /** Multiset (doc_id, is_train, bg) bigram rows — the shingleRows
    * zip-slice build at width 2: two staggered slices of the token array
    * zipped and exploded in ONE narrow projection, no lambda, no shuffle.
    * Docs with < 2 tokens emit no bigram (nothing to score). */
  private def bigramRows(docs: org.apache.spark.sql.DataFrame,
                         carry: Seq[String] = Nil,
                         prep: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame = identity): org.apache.spark.sql.DataFrame = {
    val keys = Seq(col("doc_id"), col("is_train")) ++ carry.map(col)
    val t = TextNorm.toks(col("text"))
    val withT = prep(docs).select(keys :+ t.as("t"): _*)
    val len = greatest(size(col("t")) - 1, lit(0))
    val zipped = arrays_zip(
      slice(col("t"), lit(1), len).as("w1"),
      slice(col("t"), lit(2), len).as("w2"))
    withT
      .select(keys :+ explode(zipped).as("z"): _*)
      .select(keys :+ concat_ws(" ", col("z.w1"), col("z.w2")).as("bg"): _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "bpe_train"          -> (qBpeTrain _),
    "bpe_encode"         -> (qBpeEncode _),
    "bpe_eval"           -> (qBpeEval _),
    "text_lm_score"      -> (qLmScore _),
    "text_lm_eval"       -> (qLmEval _),
    "text_ppl_buckets"   -> (qPplBuckets _),
    "text_ppl_buckets_incremental" -> (qPplBucketsIncremental _),
    "text_langid"        -> (qLangId _),
    "text_vocab"         -> (qVocab _),
    "text_token_ids"     -> (qTokenIds _),
    "text_phrase_search" -> (qPhraseSearch _),
    "text_quality"       -> (qQuality _),
    "text_tokens"        -> (qTokens _),
    "text_fingerprint"   -> (qFingerprint _),
    "text_heavy_hitters" -> (qHeavyHitters _),
    "text_tfidf"         -> (qTfidf _),
    "text_redact"        -> (qRedact _),
    "text_chunk"         -> (qChunk _),
    "text_bm25"          -> (qBm25 _),
    "text_hybrid"        -> (qHybridSearch _),
    "text_langid_eval"   -> (qLangIdEval _),
    "bpe_pairs"          -> (qBpePairs _),
    "text_quality_model" -> (qQualityModel _),
    "text_boilerplate"   -> (qBoilerplate _),
    "text_novelty"       -> (qNovelty _))

  // ------------------------------------------------------------- oracles

  private val toksSql = TextNorm.toksSql

  /** Language-ID prediction SQL — shared by the text_langid oracle and the
    * confusion-matrix eval built on it. */
  private lazy val langIdSql: String = {
    val scores = profiles.map { case (l, ws) => s"${scoreSql(ws)} AS s_$l" }.mkString(",\n  ")
    s"""WITH scored AS (
       |  SELECT doc_id, lang, $scores FROM documents)
       |SELECT *,
       |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
       |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
       |       WHEN s_es >= s_fr THEN 'es'
       |       ELSE 'fr' END AS predicted_lang
       |FROM scored""".stripMargin
  }

  private def scoreSql(words: Seq[String]): String = {
    val arr = words.map(w => s"'$w'").mkString("[", ",", "]")
    s"CAST(len(list_filter($toksSql, x -> list_contains($arr, x))) AS BIGINT)"
  }

  /** The quality_score expression as DuckDB SQL — single source of truth
    * shared by the text_quality oracle and the curation-pipeline oracle
    * (drift between copies would silently desynchronize the gates). */
  val qualityScoreSql: String =
    s"""0.4 * (CAST(CAST(length(regexp_replace(coalesce(text,''), '[^A-Za-z]', '', 'g')) AS BIGINT) AS DOUBLE)
       |        / greatest(CAST(length(coalesce(text,'')) AS BIGINT), 1))
       |  + 0.3 * (CAST(${scoreSql(profiles.head._2)} AS DOUBLE)
       |        / greatest(CAST(len($toksSql) AS BIGINT), 1))
       |  + 0.3 * (CASE WHEN CAST(len($toksSql) AS BIGINT) BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END)""".stripMargin

  /** The BM25 oracle — a standalone statement, shared verbatim by
    * text_bm25 and (as an embedded CTE) text_hybrid, so lexical recall
    * has exactly one definition. */
  private lazy val bm25Sql: String = {
    val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
    s"""WITH sized AS (
       |  SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS dl, $toksSql AS t
       |  FROM documents),
       |tot AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS tt FROM sized),
       |tf AS (
       |  SELECT doc_id, dl, term, count(*) AS tf
       |  FROM (SELECT doc_id, dl, unnest(t) AS term FROM sized)
       |  WHERE term IN ($termList) GROUP BY 1, 2, 3),
       |dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT tf.doc_id,
       |    (((1000 * (tot.n + 1)) // (dfx.df + 1)) * tf.tf * 44 * tot.tt)
       |      // (20 * tf.tf * tot.tt + 6 * tot.tt + 18 * tf.dl * tot.n) AS s
       |  FROM tf JOIN dfx USING (term), tot),
       |agg AS (
       |  SELECT doc_id, CAST(sum(s) AS BIGINT) AS bm25_milli,
       |    count(*) AS n_terms
       |  FROM scored GROUP BY 1)
       |SELECT doc_id, bm25_milli, n_terms,
       |  row_number() OVER (ORDER BY bm25_milli DESC, doc_id) AS rank
       |FROM agg
       |QUALIFY rank <= $Bm25K""".stripMargin
  }

  /** The per-doc quality statement — shared by the text_quality gate and
    * the curation oracles that rank on the score (q_global_rank), so the
    * score definition cannot drift between them. */
  private[graft] lazy val qualitySql: String =
    s"""WITH m AS (
       |  SELECT doc_id, lang,
       |    CAST(length(coalesce(text,'')) AS BIGINT) AS n_chars,
       |    CAST(length(regexp_replace(coalesce(text,''), '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       |    CAST(length(regexp_replace(coalesce(text,''), '[^.,;:!?]', '', 'g')) AS BIGINT) AS n_punct,
       |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
       |    ${scoreSql(profiles.head._2)} AS n_stopwords
       |  FROM documents)
       |SELECT *,
       |  CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1) AS alpha_ratio,
       |  CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1) AS stop_ratio,
       |  0.4 * (CAST(n_alpha AS DOUBLE) / greatest(n_chars, 1))
       |    + 0.3 * (CAST(n_stopwords AS DOUBLE) / greatest(n_tokens, 1))
       |    + 0.3 * (CASE WHEN n_tokens BETWEEN 20 AND 2000 THEN 1.0 ELSE 0.0 END) AS quality_score
       |FROM m""".stripMargin

  // lazy for the same reason as DedupQueries.oracles: the two maps embed
  // each other's shared SQL fragments, and strict-val initialization
  // would cross the class-init locks (see the note there)
  /** The id-table statement, shared verbatim by both tokenizer oracles —
    * one truth for the token→id mapping. */
  private lazy val vocabSql: String =
    s"""SELECT token,
       |  CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) - 1
       |    AS BIGINT) AS id,
       |  n_occurrences
       |FROM (
       |  SELECT tok AS token, count(*) AS n_occurrences
       |  FROM (SELECT unnest($toksSql) AS tok FROM documents)
       |  GROUP BY 1)
       |ORDER BY n_occurrences DESC, token LIMIT $VocabK""".stripMargin

  /** One training round of the bpe_train oracle, unrolled per round k
    * (the k-means oracle discipline — the iterative loop replayed as
    * generated CTEs, one truth for election AND rewrite): census the
    * adjacent pairs of v_k, elect b_k by (count desc, l, r), rewrite
    * with the same odd-run-offset greedy rule as the engine. */
  /** One unrolled BPE round as DuckDB CTEs. Every CTE is MATERIALIZED:
    * DuckDB inlines single-reference CTEs by default, and the round
    * chain references its predecessor several times (census + rewrite +
    * four scalar reads of the election) — inlined, the re-evaluation
    * compounds per round (~20 s at sf0.001, unbounded at sf0.01);
    * materialized, the whole unroll is sub-second at sf0.01. */
  private def bpeRoundCtes(k: Int): String =
    s"""p$k AS MATERIALIZED (
       |  SELECT split_part(pr, ' ', 1) AS l, split_part(pr, ' ', 2) AS r,
       |    CAST(sum(freq) AS BIGINT) AS c
       |  FROM (SELECT freq,
       |          unnest([t[i] || ' ' || t[i+1] for i in generate_series(1, len(t)-1)]) AS pr
       |        FROM (SELECT freq, string_split(sym, ' ') AS t FROM v$k))
       |  GROUP BY 1, 2),
       |b$k AS MATERIALIZED (SELECT l, r, c FROM p$k ORDER BY c DESC, l, r LIMIT 1),
       |x$k AS MATERIALIZED (
       |  SELECT sym AS w, freq, unnest(string_split(sym, ' ')) AS s,
       |    unnest(generate_series(1, len(string_split(sym, ' ')))) AS i
       |  FROM v$k),
       |n$k AS MATERIALIZED (
       |  SELECT w, freq, i, s, lead(s) OVER (PARTITION BY w ORDER BY i) AS nx
       |  FROM x$k),
       |m$k AS MATERIALIZED (
       |  SELECT w, freq, i, s,
       |    (s = (SELECT l FROM b$k) AND nx = (SELECT r FROM b$k)) AS m
       |  FROM n$k),
       |st$k AS MATERIALIZED (
       |  SELECT w, i,
       |    (row_number() OVER (PARTITION BY w, grp ORDER BY i) % 2 = 1) AS start
       |  FROM (SELECT w, i, i - row_number() OVER (PARTITION BY w ORDER BY i) AS grp
       |        FROM m$k WHERE m)),
       |g$k AS MATERIALIZED (
       |  SELECT m.w, m.freq, m.i, m.s,
       |    coalesce(st.start, false) AS st,
       |    coalesce(lag(coalesce(st.start, false))
       |      OVER (PARTITION BY m.w ORDER BY m.i), false) AS cons
       |  FROM m$k m LEFT JOIN st$k st ON st.w = m.w AND st.i = m.i),
       |v${k + 1} AS MATERIALIZED (
       |  SELECT string_agg(
       |      CASE WHEN st THEN (SELECT l FROM b$k) || (SELECT r FROM b$k)
       |           WHEN cons THEN NULL ELSE s END, ' ' ORDER BY i) AS sym,
       |    freq
       |  FROM g$k GROUP BY w, freq)""".stripMargin

  /** The full encode-side CTE chain — character-split vocabulary, the
    * [[BpeMerges]] unrolled rewrite rounds, the final segmentation table
    * (`wseg`: word → trained segmentation + per-word token count), and
    * the corpus at word grain with positions (`dw`). Shared verbatim by
    * the bpe_encode / bpe_eval oracles and CurateQueries' pack_sequences
    * — one truth for the trained tokenizer across every consumer. */
  private[graft] lazy val bpeSegCtes: String =
    s"""v0 AS MATERIALIZED (
       |  SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sym, freq
       |  FROM (SELECT w, count(*) AS freq
       |        FROM (SELECT unnest($toksSql) AS w FROM documents)
       |        GROUP BY 1)),
       |${(0 until BpeMerges).map(bpeRoundCtes).mkString(",\n")},
       |wseg AS MATERIALIZED (
       |  SELECT replace(sym, ' ', '') AS w, sym AS seg,
       |    CAST(len(string_split(sym, ' ')) AS BIGINT) AS nseg
       |  FROM v$BpeMerges),
       |dw AS MATERIALIZED (
       |  SELECT doc_id, unnest(t) AS w,
       |    unnest(generate_series(1, len(t))) AS pos
       |  FROM (SELECT doc_id, $toksSql AS t FROM documents))""".stripMargin

  /** The text_quality_model statement — shared verbatim by its own oracle,
    * the LM eval that cross-tabulates against it, and the per-source cap's
    * priority key (CurateQueries.q_source_cap). */
  private[graft] lazy val qualityModelSql: String =
    s"""WITH m AS (
       |  SELECT doc_id, lang,
       |    CAST(length(coalesce(text,'')) AS BIGINT) AS n_chars,
       |    CAST(length(regexp_replace(coalesce(text,''), '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       |    CAST(len($toksSql) AS BIGINT) AS n_tokens,
       |    ${scoreSql(profiles.head._2)} AS n_stopwords
       |  FROM documents),
       |f AS (
       |  SELECT doc_id, lang,
       |    n_alpha * 1000000 // greatest(n_chars, 1) AS alpha_micro,
       |    n_stopwords * 1000000 // greatest(n_tokens, 1) AS stop_micro,
       |    CAST(CASE WHEN n_tokens BETWEEN 20 AND 2000 THEN 1 ELSE 0 END AS BIGINT) AS len_ok
       |  FROM m)
       |SELECT doc_id, lang, alpha_micro, stop_micro, len_ok,
       |  $QmBias + $QmWAlpha * alpha_micro + $QmWStop * stop_micro
       |    + $QmWLen * len_ok AS logit_micro,
       |  ($QmBias + $QmWAlpha * alpha_micro + $QmWStop * stop_micro
       |    + $QmWLen * len_ok) > 0 AS keep
       |FROM f""".stripMargin

  /** The text_lm_score statement — shared verbatim by its own oracle and
    * the eval that calibrates it. */
  private lazy val lmScoreSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    ${graft.functions.Exact.md5LongSql("'lmb|' || CAST(doc_id AS VARCHAR)")}
       |      % 100 < $LmTrainPct AS is_train,
       |    $toksSql AS t
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, is_train,
       |    unnest([array_to_string(t[i:i+1], ' ')
       |            for i in generate_series(1, len(t)-1)]) AS bg
       |  FROM d WHERE len(t) >= 2),
       |c AS (SELECT bg, count(*) AS cnt FROM bg WHERE is_train GROUP BY 1)
       |SELECT b.doc_id, max(b.is_train) AS is_train,
       |  count(*) AS n_bigrams,
       |  CAST(sum(length(bin(1 + coalesce(c.cnt, 0))) - 1) AS BIGINT) AS fam_sum,
       |  CAST((1000 * sum(length(bin(1 + coalesce(c.cnt, 0))) - 1))
       |    // count(*) AS BIGINT) AS lm_milli
       |FROM bg b LEFT JOIN c USING (bg)
       |GROUP BY 1""".stripMargin

  lazy val oracles: Map[String, String] = Map(
    "text_langid" -> langIdSql,
    "text_vocab" -> vocabSql,
    // the iterative loop unrolled: BpeMerges generated round blocks, each
    // electing from the PREVIOUS round's rewrite — a wrong merge anywhere
    // shifts every later round's counts
    "bpe_train" ->
      s"""WITH v0 AS MATERIALIZED (
         |  SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS sym, freq
         |  FROM (SELECT w, count(*) AS freq
         |        FROM (SELECT unnest($toksSql) AS w FROM documents)
         |        GROUP BY 1)),
         |${(0 until BpeMerges).map(bpeRoundCtes).mkString(",\n")}
         |SELECT * FROM (
         |${(0 until BpeMerges).map(k =>
              s"SELECT CAST(${k + 1} AS BIGINT) AS round, l AS merge_left, " +
                s"r AS merge_right, c AS pair_count FROM b$k")
              .mkString("\nUNION ALL\n")}
         |) ORDER BY round""".stripMargin,
    // the same unrolled rounds, but read at the FINAL vocabulary state:
    // words rejoin their trained segmentations (1:1 — the vocab is the
    // corpus's own), and the position-ordered segment stream hashes so
    // any segmentation or ordering slip anywhere fails the gate
    "bpe_encode" ->
      s"""WITH $bpeSegCtes
         |SELECT d.doc_id, count(*) AS n_words,
         |  CAST(sum(s.nseg) AS BIGINT) AS n_bpe_tokens,
         |  md5(string_agg(s.seg, ' ' ORDER BY d.pos)) AS seq_sig
         |FROM dw d JOIN wseg s USING (w)
         |GROUP BY 1""".stripMargin,
    // the encode chain nested verbatim (one truth with bpe_encode), the
    // per-source sums as exact BIGINTs, the same floor divisions
    "bpe_eval" ->
      s"""WITH $bpeSegCtes,
         |perdoc AS MATERIALIZED (
         |  SELECT d.doc_id, count(*) AS n_words,
         |    CAST(sum(s.nseg) AS BIGINT) AS n_bpe_tokens,
         |    CAST(sum(length(d.w)) AS BIGINT) AS n_word_chars
         |  FROM dw d JOIN wseg s USING (w)
         |  GROUP BY 1)
         |SELECT doc.source, count(*) AS n_docs,
         |  CAST(sum(p.n_words) AS BIGINT) AS n_words,
         |  CAST(sum(p.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
         |  CAST(sum(p.n_word_chars) AS BIGINT) AS n_word_chars,
         |  (1000 * CAST(sum(p.n_bpe_tokens) AS BIGINT))
         |    // CAST(sum(p.n_words) AS BIGINT) AS fertility_milli,
         |  (1000 * CAST(sum(p.n_word_chars) AS BIGINT))
         |    // CAST(sum(p.n_bpe_tokens) AS BIGINT) AS chars_per_token_milli
         |FROM perdoc p JOIN documents doc ON p.doc_id = doc.doc_id
         |GROUP BY 1""".stripMargin,
    // same hash split, same width-2 comprehension over the shared token
    // definition, same length(bin(1+cnt))−1 integer log2 — the quantized
    // familiarity is engine-identical with no float log anywhere
    "text_lm_score" -> lmScoreSql,
    // same rank-based tercile rule over the same nested score statement:
    // tie-group max-rank from a DESC cumulative count over the
    // (lang × lm_milli) value grain, bucket = (3·(r−1)) // N — every
    // intermediate cast to BIGINT so DuckDB's HUGEINT window sums can't
    // leak into the hashed cells
    "text_ppl_buckets" ->
      s"""WITH lm AS (
         |$lmScoreSql
         |),
         |s AS (
         |  SELECT lm.doc_id, d.lang, lm.lm_milli
         |  FROM lm JOIN documents d ON lm.doc_id = d.doc_id),
         |vg AS (SELECT lang, lm_milli, count(*) AS c FROM s GROUP BY 1, 2),
         |cum AS (
         |  SELECT lang, lm_milli,
         |    CAST(sum(c) OVER (PARTITION BY lang ORDER BY lm_milli DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_ge
         |  FROM vg),
         |n AS (SELECT lang, count(*) AS n_lang FROM s GROUP BY 1),
         |b AS (
         |  SELECT cum.lang, cum.lm_milli,
         |    (3 * (cum_ge - 1)) // n_lang AS bucket_id
         |  FROM cum JOIN n USING (lang))
         |SELECT s.doc_id, s.lang, s.lm_milli, b.bucket_id,
         |  CASE b.bucket_id WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
         |    ELSE 'tail' END AS ppl_bucket
         |FROM s JOIN b USING (lang, lm_milli)""".stripMargin,
    // one scoring pass with the source carried (corpus-trained counts —
    // the WHERE on c is the artifact boundary), split downstream into the
    // corpus side (tercile thresholds via the same value-grain rule) and
    // the incoming side (routed by the frozen cut scores); the CASE
    // mirrors the engine's conservative fall-to-lower-bucket rule and
    // NULL semantics (unseen lang → tail)
    "text_ppl_buckets_incremental" -> {
      val inc = graft.ext.dedup.DedupQueries.IncomingSource
      s"""WITH d AS (
         |  SELECT doc_id, source,
         |    ${graft.functions.Exact.md5LongSql("'lmb|' || CAST(doc_id AS VARCHAR)")}
         |      % 100 < $LmTrainPct AS is_train,
         |    $toksSql AS t
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id, source, is_train,
         |    unnest([array_to_string(t[i:i+1], ' ')
         |            for i in generate_series(1, len(t)-1)]) AS bg
         |  FROM d WHERE len(t) >= 2),
         |c AS (SELECT bg, count(*) AS cnt FROM bg
         |      WHERE is_train AND source <> '$inc' GROUP BY 1),
         |sc AS (
         |  SELECT b.doc_id, max(b.source) AS source,
         |    CAST((1000 * sum(length(bin(1 + coalesce(c.cnt, 0))) - 1))
         |      // count(*) AS BIGINT) AS lm_milli
         |  FROM bg b LEFT JOIN c USING (bg) GROUP BY 1),
         |corpus AS (
         |  SELECT s.doc_id, d2.lang, s.lm_milli
         |  FROM sc s JOIN documents d2 ON s.doc_id = d2.doc_id
         |  WHERE s.source <> '$inc'),
         |vg AS (SELECT lang, lm_milli, count(*) AS c FROM corpus GROUP BY 1, 2),
         |cum AS (
         |  SELECT lang, lm_milli,
         |    CAST(sum(c) OVER (PARTITION BY lang ORDER BY lm_milli DESC
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_ge
         |  FROM vg),
         |n AS (SELECT lang, count(*) AS n_lang FROM corpus GROUP BY 1),
         |bmap AS (
         |  SELECT cum.lang, cum.lm_milli,
         |    (3 * (cum_ge - 1)) // n_lang AS bucket_id
         |  FROM cum JOIN n USING (lang)),
         |th AS (
         |  SELECT lang,
         |    min(CASE WHEN bucket_id = 0 THEN lm_milli END) AS lo_head,
         |    min(CASE WHEN bucket_id = 1 THEN lm_milli END) AS lo_mid
         |  FROM bmap GROUP BY 1),
         |batchd AS (
         |  SELECT s.doc_id, d2.lang, s.lm_milli
         |  FROM sc s JOIN documents d2 ON s.doc_id = d2.doc_id
         |  WHERE s.source = '$inc')
         |SELECT b.doc_id, b.lang, b.lm_milli,
         |  CAST(CASE WHEN b.lm_milli >= t.lo_head THEN 0
         |    WHEN t.lo_mid IS NOT NULL AND b.lm_milli >= t.lo_mid THEN 1
         |    ELSE 2 END AS BIGINT) AS bucket_id,
         |  CASE WHEN b.lm_milli >= t.lo_head THEN 'head'
         |    WHEN t.lo_mid IS NOT NULL AND b.lm_milli >= t.lo_mid THEN 'middle'
         |    ELSE 'tail' END AS ppl_bucket
         |FROM batchd b LEFT JOIN th t USING (lang)""".stripMargin
    },
    // the eval nests the SAME two screen statements it calibrates (the
    // one-truth discipline), with the exact lower-median threshold via
    // the value-grain cumulative rule
    "text_lm_eval" ->
      s"""WITH lm AS (
         |$lmScoreSql
         |),
         |qm AS (
         |$qualityModelSql
         |),
         |j AS (
         |  SELECT lm.doc_id, lm.lm_milli, qm.keep
         |  FROM lm JOIN qm ON lm.doc_id = qm.doc_id),
         |vals AS (SELECT lm_milli, count(*) AS c FROM j GROUP BY 1),
         |med AS (
         |  SELECT min(lm_milli) AS lm_median
         |  FROM (SELECT lm_milli,
         |          sum(c) OVER (ORDER BY lm_milli
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |          (SELECT count(*) FROM j) AS n
         |        FROM vals)
         |  WHERE cum * 2 >= n)
         |SELECT count(*) AS n_docs,
         |  max(med.lm_median) AS lm_median,
         |  CAST(sum(CASE WHEN keep AND lm_milli >= med.lm_median THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_above,
         |  CAST(sum(CASE WHEN keep AND lm_milli < med.lm_median THEN 1 ELSE 0 END) AS BIGINT) AS n_keep_below,
         |  CAST(sum(CASE WHEN NOT keep AND lm_milli >= med.lm_median THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_above,
         |  CAST(sum(CASE WHEN NOT keep AND lm_milli < med.lm_median THEN 1 ELSE 0 END) AS BIGINT) AS n_drop_below,
         |  CAST((1000 * sum(CASE WHEN keep = (lm_milli >= med.lm_median) THEN 1 ELSE 0 END))
         |    // count(*) AS BIGINT) AS agree_milli
         |FROM j, med""".stripMargin,
    // parallel unnests zip positionally in DuckDB, giving each token its
    // ordinal; string_agg(... ORDER BY pos) replays the engine's
    // position-sorted id sequence byte-for-byte under md5
    "text_token_ids" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |v AS (
         |$vocabSql
         |),
         |ex AS (
         |  SELECT doc_id, unnest(t) AS tok,
         |    unnest(range(1, len(t) + 1)) AS pos
         |  FROM toks),
         |j AS (
         |  SELECT e.doc_id, e.pos, coalesce(v.id, $OovId) AS id
         |  FROM ex e LEFT JOIN v ON v.token = e.tok)
         |SELECT doc_id, count(*) AS n_tokens,
         |  CAST(sum(CASE WHEN id = $OovId THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_oov,
         |  (1000 * CAST(sum(CASE WHEN id = $OovId THEN 1 ELSE 0 END) AS BIGINT))
         |    // count(*) AS oov_milli,
         |  md5(string_agg(CAST(id AS VARCHAR), ' ' ORDER BY pos)) AS ids_sig
         |FROM j GROUP BY 1""".stripMargin,
    // the shared multiset trigram definition, filtered to the phrase
    // literals — occurrences counted, not just presence
    "text_phrase_search" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |sh AS (
         |  SELECT doc_id, unnest(${TextNorm.shinglesMultisetSql("t")}) AS s
         |  FROM toks)
         |SELECT s AS phrase, doc_id, count(*) AS n_occurrences
         |FROM sh
         |WHERE s IN (${SearchPhrases.map(p => s"'$p'").mkString(", ")})
         |GROUP BY 1, 2""".stripMargin,
    // the same prediction SQL reused verbatim, so the eval cannot drift
    // from the classifier it audits
    "text_langid_eval" ->
      s"""SELECT lang, predicted_lang, count(*) AS n_docs
         |FROM (
         |$langIdSql
         |) scored GROUP BY 1, 2""".stripMargin,
    "text_quality" -> qualitySql,
    "text_tokens" ->
      s"""WITH per_doc AS (
         |  SELECT lang,
         |    CAST(len($toksSql) AS BIGINT) AS ws_tokens,
         |    CAST(len(regexp_extract_all(coalesce(text,''), '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS bpe_tokens
         |  FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
         |  CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
         |  CAST(CAST(sum(ws_tokens) AS BIGINT) AS DOUBLE) / count(*) AS avg_ws_tokens
         |FROM per_doc GROUP BY 1""".stripMargin,
    "text_fingerprint" ->
      s"""SELECT doc_id, source,
         |  md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fingerprint,
         |  CAST(len(list_distinct($toksSql)) AS BIGINT) AS n_distinct_tokens
         |FROM documents""".stripMargin,
    "text_heavy_hitters" ->
      s"""SELECT tok, count(*) AS occurrences,
         |  count(DISTINCT doc_id) AS doc_freq
         |FROM (SELECT doc_id, unnest($toksSql) AS tok FROM documents)
         |GROUP BY 1
         |ORDER BY occurrences DESC, tok
         |LIMIT $HeavyHittersK""".stripMargin,
    "text_tfidf" ->
      s"""WITH tokens AS (
         |  SELECT doc_id, unnest($toksSql) AS token FROM documents),
         |tf AS (SELECT doc_id, token, count(*) AS tf FROM tokens GROUP BY 1, 2),
         |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents)
         |SELECT doc_id, token, tf, df,
         |  (tf * $TfidfScale * n.n) // df AS score_micro,
         |  row_number() OVER (PARTITION BY doc_id
         |    ORDER BY (tf * $TfidfScale * n.n) // df DESC, token) AS rank
         |FROM tf JOIN df USING (token), n
         |QUALIFY rank <= $TfidfK""".stripMargin,
    // integer-division ORDER mirrors the Spark side exactly: idf floored
    // first, then the one floored score division per (doc, term)
    "text_bm25" -> bm25Sql,
    // BM25 recall + cosine re-rank + integer RRF; the bm25 oracle embeds
    // verbatim as the candidate CTE, so recall and fusion share one truth
    "text_hybrid" ->
      s"""WITH ${graft.ext.dedup.DedupQueries.quantizedSql},
         |bm AS (
         |$bm25Sql),
         |qv AS (SELECT v AS qv, nsq AS qn FROM q WHERE vec_id = $HybridQueryVec),
         |cand AS (
         |  SELECT bm.doc_id, bm.rank AS bm25_rank,
         |    ${graft.ext.sim.SimQueries.cosSql("qv.qv", "e.v", "qv.qn", "e.nsq")} AS cosine
         |  FROM bm JOIN q e ON e.vec_id = bm.doc_id CROSS JOIN qv),
         |cr AS (SELECT doc_id, bm25_rank,
         |    row_number() OVER (ORDER BY cosine DESC, doc_id) AS cos_rank
         |  FROM cand),
         |fused AS (SELECT doc_id, bm25_rank, cos_rank,
         |    1000000 // ($RrfK + bm25_rank) + 1000000 // ($RrfK + cos_rank) AS rrf_micro
         |  FROM cr)
         |SELECT doc_id, bm25_rank, cos_rank, rrf_micro,
         |  row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS rank
         |FROM fused""".stripMargin,
    // range(0, n, stride) excludes n, matching sequence(0, n-1, stride)'s
    // starts-strictly-below-n for every n ≥ 1; list_slice clamps the end
    // bound explicitly (least) where Spark's slice length clamps implicitly
    "text_chunk" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS t FROM documents),
         |st AS (SELECT doc_id, t, unnest(range(0, len(t), $ChunkStride)) AS start
         |       FROM t WHERE len(t) > 0)
         |SELECT doc_id,
         |  start // $ChunkStride AS chunk_idx,
         |  CAST(start AS BIGINT) AS chunk_start,
         |  CAST(len(list_slice(t, start+1, least(start+$ChunkSize, len(t)))) AS BIGINT) AS n_chunk_tokens,
         |  md5(array_to_string(list_slice(t, start+1, least(start+$ChunkSize, len(t))), ' ')) AS chunk_fp
         |FROM st""".stripMargin,
    // note DuckDB's regexp_replace needs the explicit 'g' flag to match
    // Spark's replace-all semantics; \b is the ASCII word boundary in both
    // Java regex and RE2
    "text_redact" ->
      s"""SELECT doc_id, lang,
         |  CAST(len(regexp_extract_all(coalesce(text,''), '\\b(customer|spark|vector)\\b')) AS BIGINT) AS n_redacted,
         |  md5(regexp_replace(coalesce(text,''), '\\b(customer|spark|vector)\\b', '<TERM>', 'g')) AS redacted_fp
         |FROM documents""".stripMargin,
    // substr(w, i, 2) always yields 2 chars (i ≤ length-1); generate_series
    // is inclusive on both ends, matching Spark's sequence(1, len-1)
    "bpe_pairs" ->
      s"""WITH words AS (
         |  SELECT w, count(*) AS freq
         |  FROM (SELECT unnest($toksSql) AS w FROM documents)
         |  GROUP BY 1),
         |pairs AS (
         |  SELECT unnest([substr(w, i, 2) for i in generate_series(1, length(w)-1)]) AS pair,
         |    freq
         |  FROM words WHERE length(w) >= 2)
         |SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count, count(*) AS n_contexts
         |FROM pairs GROUP BY 1
         |ORDER BY pair_count DESC, pair
         |LIMIT $BpeK""".stripMargin,
    // `//` on positive BIGINTs ≡ Spark's DIV — both floor; all terms stay
    // integer so the logit sign (the keep decision) cannot drift
    "text_quality_model" -> qualityModelSql,
    // shingles are already distinct within a document (shinglesSql), so
    // count(*) over the exploded rows IS document frequency
    "text_boilerplate" ->
      s"""WITH toks AS (SELECT doc_id, source, $toksSql AS t FROM documents),
         |sh AS (SELECT doc_id, source, ${TextNorm.shinglesSql("t")} AS shingles FROM toks),
         |ex AS (SELECT doc_id, source, unnest(shingles) AS s FROM sh)
         |SELECT s AS shingle, count(*) AS doc_freq,
         |  count(DISTINCT source) AS n_sources
         |FROM ex GROUP BY 1
         |HAVING count(*) >= $BoilerplateMinDocs
         |ORDER BY doc_freq DESC, shingle
         |LIMIT $BoilerplateK""".stripMargin,
    // df = 1 means the shingle exists in exactly this document; the
    // shared shingle CTE keeps the token/shingle definition identical to
    // every dedup oracle
    "text_novelty" ->
      s"""WITH ${graft.ext.dedup.DedupQueries.shingleCtes},
         |d AS (SELECT s, count(*) AS df FROM ex GROUP BY 1)
         |SELECT ex.doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
         |  (1000 * CAST(sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) AS BIGINT))
         |    // count(*) AS novelty_milli
         |FROM ex JOIN d USING (s) GROUP BY 1""".stripMargin)
}
