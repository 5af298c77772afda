package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // runtime bloom injection OFF — misinformed on stats-less snapshot
      // LogicalRDDs; rationale in graft.SparkSessions
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")   // same workload shape as Verify on any host
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state methodology: one untimed warm pass over every query
    // (JIT + whole-stage-codegen compilation + parquet footers), then the
    // timed pass in fixed name order. Wide plans cost seconds of one-time
    // codegen compilation that would otherwise be misattributed to whichever
    // query ran first.
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()
    // specOnly sketch queries (approx_count_distinct / approx-percentile /
    // HLL rollup) are real operators with real costs — they skip the
    // DuckDB gate by design, not the clock. Without them the BASELINE.md
    // contract query q_approx_distinct had no bench row since round 6.
    val ordered = (SparkEntry.queries ++ SparkEntry.specOnly).toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // Each timed pass: reset the suite-scoped pair snapshots and time the
    // rebuild as ONE attributable pseudo-entry so the shared
    // scan→shingle→posting pipeline cost is under the clock instead of
    // landing on whichever consumer happens to run first. Consumers then
    // measure post-snapshot work — the production shape, where the pair
    // snapshot is a persisted artifact built once per corpus version.
    // buildSnapshots also returns per-artifact seconds so a regression in
    // one index is attributable without bisecting the aggregate.
    def timedPass(): (Seq[(String, Double)], Seq[(String, Double)]) = {
      graft.ext.dedup.DedupQueries.clearSnapshots()
      val snapT0 = System.nanoTime()
      val (snapSecs, snapDetail) =
        try { val d = graft.ext.dedup.DedupQueries.buildSnapshots(spark, sfDir)
              // the r11 shared artifacts ride the same attributed build:
              // the basket frame (q_basket_pairs / q_basket_rules) and the
              // LM score frame (text_lm_score / text_lm_eval /
              // text_ppl_buckets, which also materializes lm_counts)
              val bT0 = System.nanoTime()
              graft.batch.BasketQueries.basketSnapshot(spark, sfDir)
              val bT1 = System.nanoTime()
              graft.ext.text.TextQueries.lmScoreSnapshot(spark, sfDir)
              val bT2 = System.nanoTime()
              // r11: the trained BPE tokenizer (merge table + final
              // vocabulary, one training loop shared by bpe_train/encode)
              graft.ext.text.TextQueries.bpeArtifacts(spark, sfDir)
              val bT3 = System.nanoTime()
              // r11: the tokenized corpus (doc-grain token counts +
              // stream signatures, read by bpe_encode/bpe_eval/pack_sequences)
              graft.ext.text.TextQueries.bpeEncoded(spark, sfDir)
              val bT4 = System.nanoTime()
              // r11: the DSIR importance-weight frame (dsir_weights /
              // dsir_select / dsir_eval share it)
              graft.ext.text.DsirQueries.weightFrame(spark, sfDir)
              val bT5 = System.nanoTime()
              // r11: the count-min sketch table (text_cm_counters /
              // text_cm_eval share it)
              graft.ext.text.CmSketchQueries.counters(spark, sfDir)
              val bT6 = System.nanoTime()
              // r12: the brute-force ANN truth set (knn_brute / ann_eval /
              // knn_label_eval share it)
              graft.ext.sim.SimQueries.qKnnBrute(spark, sfDir)
              val d2 = d :+ ("baskets" -> (bT1 - bT0) / 1e9) :+
                ("lm_scores" -> (bT2 - bT1) / 1e9) :+
                ("bpe_tokenizer" -> (bT3 - bT2) / 1e9) :+
                ("bpe_encoded" -> (bT4 - bT3) / 1e9) :+
                ("dsir_weights" -> (bT5 - bT4) / 1e9) :+
                ("cm_counters" -> (bT6 - bT5) / 1e9) :+
                ("knn_truth" -> (System.nanoTime() - bT6) / 1e9)
              ((System.nanoTime() - snapT0) / 1e9, d2) }
        catch { case _: Throwable => (-1.0, Seq.empty[(String, Double)]) }
      val entries = ("snapshot_build" -> snapSecs) +: ordered.map { case (name, fn) =>
        val t0 = System.nanoTime()
        // a failed query reports -1.0, not its (meaningless) elapsed time —
        // otherwise a plan-time exception would masquerade as a fast success
        val secs =
          try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case _: Throwable => -1.0 }
        name -> secs
      }
      (entries, snapDetail)
    }
    // TWO timed passes, per-query minimum (the round-2 best-of-two
    // methodology): run-to-run noise on this machine is ±15% with rare
    // multi-× GC spikes on individual queries — one spiked sample must not
    // masquerade as a plan regression. A query failing BOTH passes reports
    // -1.0; a single-pass failure keeps the successful sample but is listed
    // in "flaky" so an intermittent failure is observable across rounds
    // instead of silently absorbed (ADVICE r8).
    val (p1, d1) = timedPass()
    val (p2raw, d2) = timedPass()
    val p2 = p2raw.toMap
    val results = p1.map { case (name, s1) =>
      val s2 = p2.getOrElse(name, -1.0)
      val merged =
        if (s1 >= 0 && s2 >= 0) math.min(s1, s2)
        else math.max(s1, s2) // at most one succeeded; -1.0 only if both failed
      name -> merged
    }
    val flaky = p1.collect {
      case (name, s1) if (s1 < 0) != (p2.getOrElse(name, -1.0) < 0) => "\"" + name + "\""
    }.mkString("[", ",", "]")
    // per-artifact snapshot_build attribution: min over the two cold
    // builds, keyed on the UNION of both passes — keying on pass 1 alone
    // would silently drop all attribution exactly when pass 1's build
    // failed and pass 2's succeeded (the flaky rounds it exists to explain)
    val d1m = d1.toMap
    val d2m = d2.toMap
    // millisecond resolution in the record: noise on this box is ±15%, so
    // sub-ms digits are pure line width — and line width is exactly what
    // front-truncated the driver's capture window in rounds 8/9
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val snapDetail = (d1.map(_._1) ++ d2.map(_._1)).distinct.map { name =>
      val s = (d1m.get(name).toSeq ++ d2m.get(name).toSeq).min
      s"\"" + name + "\":" + fmt(s)
    }.mkString("{", ",", "}")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // total sums ONLY successful queries — a -1.0 failure marker must not
    // shrink the total and let a breaking regression read as a speedup.
    // Failures are listed explicitly so a cross-round total compare is
    // apples-to-apples (same query set) or visibly not.
    val total = results.collect { case (_, s) if s >= 0 => s }.sum
    val failed = results.collect { case (k, s) if s < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // Streaming-throughput record (reference flagship plan, fixed load):
    // its OWN field, not a queries entry — rows/s is not seconds, and the
    // batch total must stay apples-to-apples across rounds. Release the
    // seven persisted snapshot artifacts FIRST: the probe must measure the
    // streaming plan, not the streaming plan competing with ~GBs of
    // checkpointed batch state for executor memory (VERDICT r8: the 2.3×
    // probe regression appeared exactly when the artifact count grew 3→7).
    // A small warm probe next: the batch warm pass compiles none of the
    // streaming plan.
    val stream =
      try { graft.ext.dedup.DedupQueries.clearSnapshots()
            spark.sqlContext.clearCache()
            graft.stream.StreamBench.probe(spark, 60000L, 3)
            graft.stream.StreamBench.probe(spark).json }
      catch { case _: Throwable => "null" }
    val record = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","failed":$failed,"flaky":$flaky,"stream":$stream,"snapshot_detail":$snapDetail,"queries":$qs,"sf":"$sfDir"}"""
    // Full 167-entry record → per-run scratch target/bench_full.json (and
    // the committed BENCH_LOCAL.json below at the artifact's scale).
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("target/bench_full.json"),
        (record + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => () }
    // The committed sf0.1 record additionally lands in repo-root
    // BENCH_LOCAL.json for BASELINE.md bookkeeping — ONLY at the
    // artifact's defined scale: preflight --full runs Bench at sf0.01 as a
    // smoke gate, and an unconditional write let that run clobber the
    // committed sf0.1 record (caught in round 9). Gate on the normalized
    // basename, not endsWith: a trailing slash must not skip the refresh,
    // and an unrelated "…mysf0.1" dir must not pass (ADVICE r9).
    val sfName =
      try java.nio.file.Paths.get(sfDir).getFileName.toString catch { case _: Throwable => "" }
    if (sfName == "sf0.1") {
      try {
        val p = java.nio.file.Paths.get("BENCH_LOCAL.json")
        java.nio.file.Files.write(p, (record + "\n").getBytes("UTF-8"))
      } catch { case _: Throwable => () }
    }
    // stdout (and target/bench_last.json, which tools/bench.sh emits
    // verbatim) gets a BOUNDED-SIZE record, not the full one: the driver's
    // capture window front-truncated the ~5 KB full line for three rounds
    // running (BENCH_r08–r10 "parsed": null) even though the full record
    // was correct — the line's HEAD fell outside the window, so no JSON
    // parsed. A 5 KB single line would front-truncate even through
    // bench.sh's clean stdout. The compact line pins the contract surface
    // (total, failures, stream probe, the 40 round-1 BASELINE.md contract
    // queries) in ~1.5 KB, guaranteed inside any tail window; the full
    // 167-entry record is committed in BENCH_LOCAL.json (and per-run in
    // target/bench_full.json).
    val headline: Set[String] = Set(
      "curate_pipeline", "dedup_embedding", "dedup_exact", "dedup_minhash",
      "dedup_ngram_capped", "dedup_ngram_jaccard", "dedup_simhash",
      "dedup_simhash_pairs", "knn_brute", "knn_ivf", "mm_meta", "pack_shards",
      "q12_late_lines", "q14_promo_share", "q1_pricing", "q3_top_orders",
      "q5_nation_revenue", "q6_forecast", "q9_profit", "q_approx_distinct",
      "q_clean", "q_daily_rank", "q_dedup", "q_enrich", "q_inactive_custs",
      "q_orders_histogram", "q_percentiles", "q_pivot_pricing",
      "q_premium_rollup", "q_rollup_pricing", "q_sessionize",
      "q_top_suppliers", "q_topk_per_nation", "q_user_cohorts",
      "q_window_agg", "sample_split", "text_fingerprint", "text_langid",
      "text_quality", "text_tokens", "snapshot_build")
    val qsCompact = results.collect { case (k, v) if headline(k) =>
      s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},"failed":$failed,"flaky":$flaky,"stream":$stream,"queries":$qsCompact,"full_record":"BENCH_LOCAL.json","sf":"$sfDir"}"""
    // TWO fixed paths for the compact record: tools/bench.sh emits
    // bench_last.json as its one stdout line; bench_compact.json is the
    // driver-facing artifact (VERDICT r11 ask #5 — BENCH_r11 still had
    // parsed:null because the stdout line rides sbt's [info] framing in a
    // bare `sbt runMain` invocation; a fixed file needs no log parsing)
    Seq("target/bench_last.json", "target/bench_compact.json").foreach { p =>
      try {
        java.nio.file.Files.write(java.nio.file.Paths.get(p),
          (compact + "\n").getBytes("UTF-8"))
      } catch { case _: Throwable => () }
    }
    println(compact)
    spark.stop()
  }
}
