package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Shared fixture exposing every snapshot ARTIFACT BUILDER's plan to the
 * discipline sweeps (VERDICT r13 #2): round 13 moved the declared
 * all-pairs cartesians (knn_truth, align_truth, emb pairs) into
 * `SnapshotBuild.all`, whose plans no registered-query sweep inspected —
 * an unhinted cross join or raw-grain window added to an artifact builder
 * would have shipped unseen. [[graft.util.SnapshotCache]] now captures
 * each builder's UN-materialized frame at build time; this fixture builds
 * all artifacts once per test JVM at the spec fixture scale and hands the
 * captured frames to CrossJoinDisciplineSpec / WindowDisciplineSpec /
 * PlanDigestSpec, which police them exactly like registered queries.
 *
 * Callers MUST re-plan via `select("*")` before inspecting: the captured
 * frame's own queryExecution was planned (and executed) at build time
 * under whatever conf was live, while a fresh Dataset over the same
 * logical plan plans under the sweep's conf (e.g. the cross-join sweep's
 * autoBroadcastJoinThreshold = -1).
 */
object BuilderPlans {

  /** The attribution names `SnapshotBuild.all` returns, pinned: adding or
    * removing an artifact fails [[all]] until this set — and the sweeps'
    * allowlists — are updated, so a new builder cannot ship unswept (the
    * closed-world rule the r13 artifact migration was missing). */
  val Artifacts: Set[String] = Set(
    "align_truth", "baskets", "bpe_encoded", "bpe_tokenizer", "cm_counters",
    "curate_screen", "doc_tokens", "dsir_features", "dsir_inc_model",
    "dsir_weights", "emb_inc_index",
    "emb_lsh_pairs", "emb_pairs", "er_base_canon", "er_canon_map",
    "inc_corpus_index", "inc_doc_hashes", "inc_exact_hashes",
    "jaccard_clusters", "jaccard_pairs", "kmeans_assign",
    "kminhash_sketches", "knn_truth", "lm_bigrams", "lm_scores",
    "lsh_bands",
    "minhash_sigs", "ppl_inc_model", "pq_codes", "pq_luts",
    "sem_clusters", "sem_clusters_lsh", "shingle_rows",
    "simhash_sigs", "span_corpus_index", "span_islands", "span_windows",
    "wmedian_grain")

  /** The snapshot tags those builds capture (some builds materialize
    * more than one snapshot — the bpe chain, the paired incremental
    * indexes) — the exact plan surface the sweeps iterate. Restricting to
    * this set keeps the swept universe deterministic under any suite
    * order (other specs' lazy snapshot touches would otherwise add
    * order-dependent extras). */
  val Tags: Set[String] = Set(
    "align_truth", "baskets", "bpe_encoded", "bpe_merges", "bpe_vocab",
    "cm_counters", "curate_screen", "doc_tokens", "dsir_features",
    "dsir_inc_model",
    "dsir_inc_totals", "dsir_weights", "emb", "emb-inc-corpus", "emb_lsh",
    "er_base_canon", "er_canon_map", "inc-doc-hashes", "inc-exact-hashes",
    "inc-posts", "inc-sizes", "jaccard", "jaccard_clusters",
    "kmeans_assign", "kminhash_sketches", "knn_truth", "lm_bigrams",
    "lm_counts", "lm_scores", "lsh_bands", "minhash_sigs",
    "ppl_inc_counts", "ppl_inc_thresholds", "pq_codes", "pq_luts",
    "sem_clusters", "sem_clusters_lsh",
    "shingle_rows", "simhash_sigs", "span-posts", "span_windows", "spans",
    "wmedian_grain")

  @volatile private var cached: Map[String, DataFrame] = null

  /** Build (or re-touch) every artifact once per test JVM at the spec
    * scale and return tag → captured builder frame for exactly [[Tags]]. */
  def all(spark: SparkSession, sf: String): Map[String, DataFrame] = synchronized {
    if (cached == null) {
      val built = graft.util.SnapshotBuild.all(spark, sf).map(_._1).toSet
      require(built == Artifacts,
        s"SnapshotBuild.all artifact set changed — added: ${(built -- Artifacts).toSeq.sorted.mkString(", ")}; " +
          s"removed: ${(Artifacts -- built).toSeq.sorted.mkString(", ")} — " +
          "update BuilderPlans.Artifacts/Tags and re-check the discipline " +
          "sweeps + PLAN_DIGESTS so the new builder's plan is policed")
      val captured = graft.util.SnapshotCache.builderPlans(spark, sf)
      val missing = Tags -- captured.keySet
      require(missing.isEmpty,
        s"expected snapshot tags not captured: ${missing.toSeq.sorted.mkString(", ")} — " +
          "if a builder stopped snapshotting a frame, remove its tag here")
      cached = captured.view.filterKeys(Tags).toMap
    }
    cached
  }
}
