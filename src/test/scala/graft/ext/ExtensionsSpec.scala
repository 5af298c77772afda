package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.dedup.DedupQueries
import graft.ext.multimodal.Multimodal
import graft.ext.sim.SimQueries
import graft.ext.text.TextQueries

/** Semantic invariants of the extension operators that the DuckDB oracle
  * can't express: recall quality, capture guarantees, plumbing shape. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("pair snapshot cache: same-key reuse, clearSnapshots releases blocks and rebuilds") {
    DedupQueries.clearSnapshots()
    val a = DedupQueries.jaccardPairSnapshot(spark, sf)
    val nA = a.count()
    // second touch with the same (session, dir, partitions) key reuses
    assert(DedupQueries.jaccardPairSnapshot(spark, sf) eq a)
    val persistedWith = spark.sparkContext.getPersistentRDDs.size
    DedupQueries.clearSnapshots()
    // the checkpointed blocks behind the snapshot are actually unpersisted
    assert(spark.sparkContext.getPersistentRDDs.size < persistedWith,
      "clearSnapshots left the checkpointed RDD persisted")
    // next touch REBUILDS (fresh frame, same content)
    val b = DedupQueries.jaccardPairSnapshot(spark, sf)
    assert(!(b eq a))
    assert(b.count() == nA)
  }

  test("exact dedup partitions the corpus (groups sum to doc count)") {
    val d = DedupQueries.qExact(spark, sf)
    val total = d.agg(sum("n_docs")).head().getLong(0)
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(total == docs)
  }

  test("minhash LSH captures every true near-dup pair (jaccard ≥ 0.95)") {
    val trueDups = DedupQueries.qNgramJaccard(spark, sf)
      .filter($"jaccard" >= 0.95)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(trueDups.nonEmpty, "fixture should contain near-dups")
    val candidates = DedupQueries.qMinhash(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val missed = trueDups -- candidates
    assert(missed.isEmpty, s"LSH missed true near-dups: $missed")
  }

  test("minhash estimate tracks true jaccard within 0.35 on candidate pairs") {
    val est = DedupQueries.qMinhash(spark, sf)
      .select($"doc_a", $"doc_b", $"est_jaccard")
    val exact = DedupQueries.qNgramJaccard(spark, sf)
      .withColumnRenamed("jaccard", "true_jaccard")
    val joined = est.join(exact, Seq("doc_a", "doc_b")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val d = math.abs(r.getAs[Double]("est_jaccard") - r.getAs[Double]("true_jaccard"))
      assert(d <= 0.35, s"estimate off by $d on ${r.mkString(",")}")
    }
  }

  test("dedup_minhash_eval: counts equal driver-side set arithmetic over both pair frames") {
    val row = DedupQueries.qMinhashEval(spark, sf).collect().head
    val cand = DedupQueries.qMinhash(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val truth = DedupQueries.qNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val hits = (cand & truth).size.toLong
    assert(row.getAs[Long]("n_candidates") == cand.size.toLong)
    assert(row.getAs[Long]("n_true_pairs") == truth.size.toLong)
    assert(row.getAs[Long]("n_hits") == hits)
    assert(row.getAs[Long]("recall_milli") == 1000L * hits / math.max(truth.size, 1))
    assert(row.getAs[Long]("precision_milli") == 1000L * hits / math.max(cand.size, 1))
    // this band/row setting is tuned to full recall on the fixture — the
    // number the eval exists to certify
    assert(row.getAs[Long]("recall_milli") == 1000L, "band setting lost a true pair")
  }

  test("dedup_simhash_eval: counts equal driver-side set arithmetic; screens agree with overlap spec") {
    val row = DedupQueries.qSimhashEval(spark, sf).collect().head
    val cand = DedupQueries.qSimhashPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val truth = DedupQueries.qNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val hits = (cand & truth).size.toLong
    assert(row.getAs[Long]("n_candidates") == cand.size.toLong)
    assert(row.getAs[Long]("n_true_pairs") == truth.size.toLong)
    assert(row.getAs[Long]("n_hits") == hits)
    assert(row.getAs[Long]("recall_milli") == 1000L * hits / math.max(truth.size, 1))
    assert(row.getAs[Long]("precision_milli") == 1000L * hits / math.max(cand.size, 1))
    // the two similarity notions overlap strongly on real near-dups even
    // though neither subsumes the other (see the overlap spec below)
    assert(row.getAs[Long]("recall_milli") >= 500L, "simhash lost most jaccard near-dups")
  }

  test("simhash pairs (hamming ≤ 3) overlap heavily with jaccard near-dups") {
    val sim = DedupQueries.qSimhashPairs(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val jac = DedupQueries.qNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(sim.nonEmpty)
    // hamming ≤ 3 and jaccard ≥ 0.8 are different notions of "near" — they
    // agree on strong dups but diverge at the margin; require substantial,
    // not total, overlap
    val overlap = sim.intersect(jac).size.toDouble / sim.size
    assert(overlap >= 0.3, s"only ${overlap * 100}% of simhash pairs are true near-dups")
  }

  test("dedup_spans: matches an independent reimplementation; bounded exchanges") {
    // full independent derivation in Scala collections, keyed by the
    // window STRING (not its md5) — an md5-truncation collision in the
    // engine path would surface here as a real difference
    val W = DedupQueries.SpanWindow
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def toks(s: String): Array[String] =
      Option(s).getOrElse("").toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .split(" +").filter(_.nonEmpty)
    val wins = for {
      (id, text) <- docs.toSeq
      t = toks(text)
      if t.length >= W
      i <- 0 to (t.length - W)
    } yield (t.slice(i, i + W).mkString(" "), id, (i + 1).toLong)
    def runLengths(pas: Seq[Long]): Seq[Long] = pas.sorted
      .foldLeft(List.empty[(Long, Long)]) { case (acc, p) =>
        acc match {
          case (start, cnt) :: rest if start + cnt == p => (start, cnt + 1) :: rest
          case _ => (p, 1L) :: acc
        }
      }.map(_._2)
    val expected = wins.groupBy(_._1).values
      .filter(os => os.size >= 2 && os.size <= DedupQueries.MaxWindowDf)
      .flatMap(os => for { a <- os; b <- os; if a._2 < b._2 }
        yield ((a._2, b._2), a._3 - b._3, a._3))
      .groupBy(m => (m._1, m._2))
      .flatMap { case ((pair, _), ms) =>
        runLengths(ms.map(_._3).toSeq)
          .filter(_ >= DedupQueries.MinSpanWindows).map(pair -> _)
      }
      .groupBy(_._1)
      .map { case (pair, rs) =>
        (pair._1, pair._2, rs.size.toLong, rs.map(_._2).max + W - 1)
      }.toSet
    assert(expected.nonEmpty, "fixture should contain shared spans")
    // the Raw twin: full build pipeline, not the suite snapshot — this
    // test pins the BUILD plan shape (the oracle gate covers the
    // snapshot-backed registered entry end-to-end)
    val spans = DedupQueries.qSharedSpansRaw(spark, sf)
    val got = spans.select($"doc_a", $"doc_b", $"n_spans", $"max_span_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected,
      s"span sets diverge: got ${got.size}, expected ${expected.size}")
    // scale contract: exchanges are window-hash, pair-diagonal (for the
    // island window), and final pair rollup — nothing candidate²-sized
    spans.count()
    val plan = spans.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3, s"expected <= 3 exchanges:\n${plan.take(3000)}")
  }

  test("dedup_spans_scrub: keep-first scrub matches a string-keyed reimplementation") {
    // same independent derivation as the spans test, carried through to
    // token coverage: every qualifying run's token range is removed from
    // the HIGHER doc of its pair; untouched docs must round-trip verbatim
    val W = DedupQueries.SpanWindow
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def toks(s: String): Array[String] =
      Option(s).getOrElse("").toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .split(" +").filter(_.nonEmpty)
    val wins = for {
      (id, text) <- docs.toSeq
      t = toks(text)
      if t.length >= W
      i <- 0 to (t.length - W)
    } yield (t.slice(i, i + W).mkString(" "), id, (i + 1).toLong)
    def runsWithStart(pas: Seq[Long]): Seq[(Long, Long)] = pas.sorted
      .foldLeft(List.empty[(Long, Long)]) { case (acc, p) =>
        acc match {
          case (start, cnt) :: rest if start + cnt == p => (start, cnt + 1) :: rest
          case _ => (p, 1L) :: acc
        }
      }
    val covered: Map[Long, Set[Long]] = wins.groupBy(_._1).values
      .filter(os => os.size >= 2 && os.size <= DedupQueries.MaxWindowDf)
      .flatMap(os => for { a <- os; b <- os; if a._2 < b._2 }
        yield ((a._2, b._2), a._3 - b._3, a._3))
      .groupBy(m => (m._1, m._2))
      .toSeq
      .flatMap { case (((_, db), diag), ms) =>
        runsWithStart(ms.map(_._3).toSeq)
          .filter(_._2 >= DedupQueries.MinSpanWindows)
          .flatMap { case (startA, wdt) =>
            val sb = startA - diag
            (sb until (sb + wdt + W - 1)).map(p => db -> p)
          }
      }
      .groupBy(_._1).map { case (d, ps) => d -> ps.map(_._2).toSet }
    val expected = docs.map { case (id, text) =>
      val t = toks(text)
      val cov = covered.getOrElse(id, Set.empty[Long])
      val keptToks = t.zipWithIndex.collect { case (tok, i) if !cov(i + 1L) => tok }
      (id, t.length.toLong, cov.size.toLong, keptToks.mkString(" "))
    }.toSet
    assert(expected.exists(_._3 > 0), "fixture should scrub something")
    val got = DedupQueries.qSpanScrubRaw(spark, sf)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == expected,
      s"scrub diverges: got ${got.size} rows, expected ${expected.size}")
    // the snapshot-backed registered entry must agree with the raw build
    // (same islands, just materialized)
    val snap = DedupQueries.qSpanScrub(spark, sf)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(snap == got, "snapshot-backed scrub diverges from raw build")
    // scale contract: window-hash build, pair-diagonal window, coverage
    // rollup, and the doc_id join — nothing beyond
    val plan = DedupQueries.qSpanScrubRaw(spark, sf)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 6, s"expected <= 6 exchanges:\n${plan.take(3000)}")
  }

  test("dedup_spans_incremental: batch screen matches a string-keyed reimplementation; batch broadcasts") {
    val W = DedupQueries.SpanWindow
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
    def toks(s: String): Array[String] =
      Option(s).getOrElse("").toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .split(" +").filter(_.nonEmpty)
    def wins(side: Boolean) = for {
      (id, src, text) <- docs.toSeq
      if (src == DedupQueries.IncomingSource) == side
      t = toks(text)
      if t.length >= W
      i <- 0 to (t.length - W)
    } yield (t.slice(i, i + W).mkString(" "), id, (i + 1).toLong)
    val corpus = wins(side = false).groupBy(_._1)
      .filter(_._2.size <= DedupQueries.MaxWindowDf)
    def runLengths(pas: Seq[Long]): Seq[Long] = pas.sorted
      .foldLeft(List.empty[(Long, Long)]) { case (acc, p) =>
        acc match {
          case (start, cnt) :: rest if start + cnt == p => (start, cnt + 1) :: rest
          case _ => (p, 1L) :: acc
        }
      }.map(_._2)
    val spans = wins(side = true)
      .flatMap { case (w, newId, pa) =>
        corpus.getOrElse(w, Nil).map { case (_, oldId, po) => ((newId, oldId), pa - po, pa) }
      }
      .groupBy(m => (m._1, m._2))
      .toSeq
      .flatMap { case ((pair, _), ms) =>
        runLengths(ms.map(_._3).toSeq)
          .filter(_ >= DedupQueries.MinSpanWindows).map(pair -> _)
      }
    val expected = spans.groupBy(_._1._1).map { case (newId, rs) =>
      (newId, rs.size.toLong, rs.map(_._1._2).distinct.size.toLong,
        rs.map(_._2).max + W - 1)
    }.toSet
    assert(expected.nonEmpty, "fixture should contain incoming-vs-corpus spans")
    val screen = DedupQueries.qSpanIncremental(spark, sf)
    val got = screen.as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected,
      s"incremental span screen diverges: got ${got.size}, expected ${expected.size}")
    // the scale contract: the batch side broadcasts into the corpus index
    val plan = screen.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"batch windows must broadcast, not shuffle the corpus:\n${plan.take(2000)}")
  }

  test("dedup_clusters: valid connected components of the jaccard pair graph") {
    val pairs = DedupQueries.qNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val labels = DedupQueries.qDedupClusters(spark, sf)
      .as[(Long, Long)].collect().toMap
    // covers exactly the docs that appear in some pair
    assert(labels.keySet == pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // both ends of every edge share a label (so transitivity holds by
    // induction over paths), and every label is its component's min member
    pairs.foreach { case (a, b) =>
      assert(labels(a) == labels(b), s"edge ($a,$b) split across clusters")
    }
    labels.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.keys.min == cid, s"cluster $cid is not its min member")
      assert(labels(cid) == cid, "cluster representative must label itself")
    }
    // distinct labels < labeled docs (the corpus does contain dup clusters)
    assert(labels.values.toSet.size < labels.size)
  }

  test("incremental semantic screen equals cross-boundary filter of the bucketed pair graph") {
    // the batch-vs-corpus screen must see exactly the pairs the full
    // bucketed dedup sees across the ingest boundary — same bands, same
    // cosine — with per-incoming-vector verdicts aggregated from them
    val all = DedupQueries.qEmbeddingDupsLsh(spark, sf)
      .select($"vec_a", $"vec_b", $"cosine").as[(Long, Long, Double)].collect()
    val s = DedupQueries.IncomingVecStride
    val expected = all
      .flatMap { case (a, b, c) => Seq((a, b, c), (b, a, c)) }
      .filter { case (n, o, _) => n % s == 0 && o % s != 0 }
      .groupBy(_._1)
      .map { case (n, xs) => n -> ((xs.size.toLong, xs.map(_._3).max)) }
    val screen = DedupQueries.qEmbeddingIncremental(spark, sf)
    val got = screen.as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected,
      s"screen verdicts diverge from the pair graph: got ${got.size}, expected ${expected.size}")
    // the scale contract: the batch side broadcasts into the corpus index
    val plan = screen.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"batch side must broadcast, not shuffle the corpus:\n${plan.take(2000)}")
  }

  test("componentsStars: diameter-1000 chain converges in log rounds, labels match propagation") {
    // A 1001-node path graph is the adversarial case the star-contraction
    // variant exists for: plain min-label propagation pays ~diameter
    // rounds (pointer jumping brings it to ~log via path doubling, but
    // only along already-found paths); large-star/small-star halves path
    // depth structurally every round, so ~log2(1000) ≈ 10 rounds.
    val chain = spark.range(1000)
      .select($"id".as("pa"), ($"id" + 1).as("pb"))
    val (stars, rounds) = DedupQueries.componentsStarsWithRounds(chain, "pa", "pb")
    assert(rounds <= 12, s"star contraction took $rounds rounds on a 1000-chain")
    val starLabels = stars.as[(Long, Long)].collect().toMap
    assert(starLabels.size == 1001 && starLabels.values.forall(_ == 0L),
      "chain must collapse to a single component labeled by its min node")
    // identical fixpoint to the propagation path on a real pair graph
    val pairs = DedupQueries.jaccardPairSnapshot(spark, sf)
    val prop = DedupQueries.components(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val star = DedupQueries.componentsStars(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    assert(star == prop, "star-contraction labels diverge from propagation labels")
  }

  test("components loops free superseded checkpoints (no per-round storage growth)") {
    // Each propagation round checkpoints two label frames; each star round
    // checkpoints one edge set. Without routing the frees through
    // releaseSnapshot (Dataset.unpersist is a CacheManager no-op for
    // localCheckpoint blocks) a deep chain leaks ~2 blocks per round and
    // only the ContextCleaner ever reclaims them. Only the RETURNED
    // frame's checkpoint may remain after each call.
    // Diff RDD *ids*, not global counts: another suite unpersisting its own
    // blocks mid-call would make a count-based assert pass or fail for the
    // wrong reason. Only ids CREATED by the call under test are charged to it.
    val chain = spark.range(300).select($"id".as("pa"), ($"id" + 1).as("pb"))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    DedupQueries.components(chain, "pa", "pb").count()
    val propNew = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
    assert(propNew.size <= 1,
      s"components leaked ${propNew.size - 1} checkpoint(s) beyond its result: $propNew")
    val beforeStars = spark.sparkContext.getPersistentRDDs.keySet
    DedupQueries.componentsStars(chain, "pa", "pb").count()
    val starsNew = spark.sparkContext.getPersistentRDDs.keySet.diff(beforeStars)
    assert(starsNew.size <= 1,
      s"componentsStars leaked ${starsNew.size - 1} checkpoint(s) beyond its result: $starsNew")
  }

  test("mm_dedup: digest groups partition the media corpus; digest is over the bytes") {
    val d = Multimodal.qMmDedup(spark, sf).cache()
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(d.agg(sum("n_copies")).head().getLong(0) == docs)
    // the digest column really is the payload digest: recompute from the
    // typed corpus for a sample and compare
    val fromCorpus = Multimodal.corpus(spark, sf).toDF()
      .select(md5(col("content")).as("checksum")).distinct().count()
    assert(d.count() == fromCorpus)
    assert(d.filter($"n_modalities" < 1 || $"n_copies" < 1).count() == 0)
    d.unpersist()
  }

  test("dedup_semantic: one kept representative per cluster, pairs never split") {
    val rows = DedupQueries.qSemDedup(spark, sf)
      .select($"vec_id", $"cluster_id", $"kept").as[(Long, Long, Boolean)].collect()
    val total = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.length == total, "one row per vector, labeled or not")
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      // representative = min member, and it is the ONLY kept one
      assert(members.map(_._1).min == cid, s"cluster $cid not labeled by its min")
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == cid)
    }
    // both ends of every near-dup pair land in the same cluster
    val label = rows.map(r => r._1 -> r._2).toMap
    DedupQueries.qEmbeddingDups(spark, sf)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
      .foreach { case (a, b) =>
        assert(label(a) == label(b), s"pair ($a,$b) split across clusters")
      }
    // the fixture does contain semantic dups: survivors < corpus
    assert(rows.count(_._3) < total)
  }

  test("dedup_semantic_bucketed: LSH candidates under-approximate all-pairs, never invent") {
    // The bucketed pair graph must be a SUBSET of the all-pairs graph with
    // identical cosines on shared pairs (same quantization, same kernel) —
    // LSH may miss a pair (recall < 1) but can never fabricate one, and a
    // retained pair's score must not change.
    val all = DedupQueries.qEmbeddingDups(spark, sf)
      .select($"vec_a", $"vec_b", $"cosine").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val lsh = DedupQueries.qEmbeddingDupsLsh(spark, sf)
      .select($"vec_a", $"vec_b", $"cosine").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    lsh.foreach { case (pair, cos) =>
      assert(all.contains(pair), s"LSH invented pair $pair absent from all-pairs")
      assert(all(pair) == cos, s"pair $pair cosine drifted between generators")
    }
    // random embeddings are LSH's worst case; still expect usable recall
    // (guard the denominator first: an empty all-pairs graph would make
    // recall NaN and fail with a misleading "recall collapsed" message)
    assert(all.nonEmpty, "all-pairs graph is empty on this corpus — fixture broken?")
    val recall = lsh.size.toDouble / all.size
    assert(recall >= 0.5, s"LSH recall $recall collapsed — band config broken?")
    // bucketed clustering has the same invariants as the all-pairs entry:
    // min-member representative, exactly one kept per cluster, no split pair
    val rows = DedupQueries.qSemDedupBucketed(spark, sf)
      .select($"vec_id", $"cluster_id", $"kept").as[(Long, Long, Boolean)].collect()
    assert(rows.length == graft.sources.Tables.embeddings(spark, sf).count())
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.map(_._1).min == cid && members.count(_._3) == 1)
    }
    val label = rows.map(r => r._1 -> r._2).toMap
    lsh.keys.foreach { case (a, b) =>
      assert(label(a) == label(b), s"bucketed pair ($a,$b) split across clusters")
    }
  }

  test("text_chunk: strided windows tile every doc exactly") {
    val chunks = TextQueries.qChunk(spark, sf)
      .select($"doc_id", $"chunk_start", $"n_chunk_tokens")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val nToks = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(graft.ext.text.TextNorm.toks($"text")).cast("long"))
      .as[(Long, Long)].collect().toMap
    nToks.filter(_._2 > 0).foreach { case (doc, n) =>
      val cs = chunks(doc).sortBy(_._2)
      // starts are exactly the stride grid below n
      assert(cs.map(_._2).toSeq ==
        (0L until n by TextQueries.ChunkStride.toLong).toSeq)
      // every chunk is full-size except possibly at the tail, which ends
      // exactly at the last token
      cs.init.foreach(c => assert(c._3 == math.min(TextQueries.ChunkSize.toLong, n - c._2)))
      assert(cs.last._2 + cs.last._3 == n, s"doc $doc tail chunk misaligned")
    }
    assert(!chunks.contains(-1L) && chunks.nonEmpty)
  }

  test("knn_brute returns exactly K ranked neighbors per query, cosine descending") {
    val k = SimQueries.qKnnBrute(spark, sf)
    val perQuery = k.groupBy("query_id").count().select("count").as[Long].collect()
    assert(perQuery.forall(_ == SimQueries.K))
    val bad = k.as("x").join(k.as("y"),
      $"x.query_id" === $"y.query_id" && $"x.rank" < $"y.rank" && $"x.cosine" < $"y.cosine")
    assert(bad.isEmpty, "cosine must be non-increasing in rank")
  }

  test("knn_label_eval: confusion matrix equals driver-side majority vote; shares sum per row") {
    val labels = graft.sources.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"label".cast("long")).as[(Long, Long)].collect().toMap
    val knn = SimQueries.qKnnBrute(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
    val expected = knn.groupBy(_._1).toSeq.map { case (q, ns) =>
      val votes = ns.map(n => labels(n._2)).groupBy(identity)
        .map { case (l, v) => (l, v.length) }
      val pred = votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      (labels(q), pred)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = SimQueries.qKnnLabelEval(spark, sf)
      .select($"true_label", $"pred_label", $"n_queries")
      .as[(Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got == expected, s"got $got expected $expected")
    // per-true-label shares are ⌊1000·n/total⌋ of that row's truth mass
    val shares = SimQueries.qKnnLabelEval(spark, sf)
      .groupBy($"true_label").agg(sum($"n_queries").as("n"), sum($"share_milli").as("s"))
      .as[(Long, Long, Long)].collect()
    shares.foreach { case (_, _, s) => assert(s >= 900 && s <= 1000) }
  }

  test("knn_label_eval plan: label attaches broadcast, no runtime bloom dead-weight") {
    // the knn_truth snapshot is a stats-less LogicalRDD, so without the
    // explicit broadcast hints InjectRuntimeFilter sizes the probe at its
    // worst-case default and injects a fixed 8M-bit bloom that can never
    // prune (every neighbor_id exists in the label dictionary) but rides
    // every downstream task binary (~1-2 MiB each — the r11 bench-log
    // "large task binary" warnings). Pin the intended plan.
    val plan = SimQueries.qKnnLabelEval(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("might_contain"),
      "runtime bloom filter injected into the label-eval plan — a label " +
        "attach lost its broadcast hint")
    assert(plan.contains("BroadcastHashJoin"),
      "label dictionary attach is no longer a broadcast join")
  }

  test("ann_eval: per-method counts equal driver-side set arithmetic against exact top-K") {
    val rows = SimQueries.qAnnEval(spark, sf).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.keySet == Set("ivf", "lsh", "ivfpq"))
    val exact = SimQueries.qKnnBrute(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def check(method: String, approxDf: org.apache.spark.sql.DataFrame): Unit = {
      val got = rows(method)
      val approx = approxDf.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val hits = (approx & exact).size.toLong
      assert(got.getAs[Long]("n_retrieved") == approx.size.toLong, s"$method retrieved")
      assert(got.getAs[Long]("n_exact") == exact.size.toLong, s"$method exact")
      assert(got.getAs[Long]("n_hits") == hits, s"$method hits")
      assert(got.getAs[Long]("recall_milli") == 1000L * hits / math.max(exact.size, 1))
      assert(got.getAs[Long]("precision_milli") == 1000L * hits / math.max(approx.size, 1))
    }
    check("ivf", SimQueries.qKnnIvf(spark, sf))
    check("lsh", SimQueries.qKnnLsh(spark, sf))
    check("ivfpq", graft.ext.sim.PqQueries.qKnnIvfPq(spark, sf))
    // the report must be able to distinguish the tiers: on the random
    // fixture the two settings don't coincide exactly
    assert(rows("ivf").getAs[Long]("recall_milli") > 0L)
  }

  test("text_hybrid: integer RRF fuses the bm25 and candidate-cosine rank lists") {
    import graft.ext.text.TextQueries
    val rows = TextQueries.qHybridSearch(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val n = rows.length
    assert(n > 0 && n <= TextQueries.Bm25K)
    // candidates ARE the bm25 top-n, so both rank columns are 1..n
    assert(rows.map(_._2).sorted.toSeq == (1L to n), "bm25 ranks not a permutation")
    assert(rows.map(_._3).sorted.toSeq == (1L to n), "cosine ranks not a permutation")
    // the fusion arithmetic, recomputed: floor(1e6/(k+r)) per arm
    val k = TextQueries.RrfK
    rows.foreach { case (id, br, cr, rrf, _) =>
      assert(rrf == 1000000L / (k + br) + 1000000L / (k + cr), s"doc $id rrf mismatch")
    }
    // final order: rrf desc, doc_id asc
    val expectOrder = rows.sortBy(r => (-r._4, r._1)).map(_._1).toSeq
    assert(rows.sortBy(_._5).map(_._1).toSeq == expectOrder, "fusion order wrong")
    // the re-rank must actually use the cosine arm: unless the two rank
    // lists coincide, some doc moves relative to pure bm25 order
    if (rows.exists(r => r._2 != r._3))
      assert(rows.sortBy(_._5).map(_._1).toSeq != rows.sortBy(_._2).map(_._1).toSeq ||
             rows.forall(r => r._2 == r._5),
        "fusion identical to bm25 despite divergent cosine ranks")
  }

  test("knn_filtered: exactly K same-label neighbors per query == label-restricted brute force") {
    val f = SimQueries.qKnnFiltered(spark, sf)
    // every query still gets its full K — the pushed filter cannot starve
    // the result set the way post-filtering a global top-K does
    val perQuery = f.groupBy("query_id").count().select("count").as[Long].collect()
    assert(perQuery.nonEmpty && perQuery.forall(_ == SimQueries.K))
    // equivalence: filtered result == brute force recomputed within the
    // query's label block (driver-side, straight from the fixture)
    val labels = graft.sources.Tables.embeddings(spark, sf)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    val got = f.select("query_id", "label", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    got.foreach { case (q, l, n) =>
      assert(labels(q) == l && labels(n) == l,
        s"neighbor $n of query $q crosses the label filter")
    }
    // ranks within each query must be exactly 1..K with cosine descending
    val bad = f.as("x").join(f.as("y"),
      $"x.query_id" === $"y.query_id" && $"x.rank" < $"y.rank" && $"x.cosine" < $"y.cosine")
    assert(bad.isEmpty, "cosine must be non-increasing in rank")
  }

  test("knn_ivf beats the random-partition recall floor while probing 2/10 cells") {
    val brute = SimQueries.qKnnBrute(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = SimQueries.qKnnIvf(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    // the fixture's `label` cells are NOT cosine-clustered (near-random
    // embeddings), so the structural expectation is recall ≈ nprobe/cells
    // = 0.2; with real k-means cells recall approaches 1. Assert we at
    // least beat the floor — i.e. probing by centroid similarity helps.
    assert(recall >= SimQueries.NProbe.toDouble / 10.0,
      s"recall@${SimQueries.K} = $recall under the random-partition floor")
    // and every IVF result must rank candidates exactly like brute force
    // within its probed cells (rank sequence 1..K per query)
    val ranks = SimQueries.qKnnIvf(spark, sf)
      .groupBy("query_id").agg(collect_list("rank")).as[(Long, Seq[Long])].collect()
    ranks.foreach { case (q, rs) =>
      assert(rs.sorted == (1L to rs.max).toList, s"query $q ranks $rs")
    }
  }

  test("knn_lsh: banded sign-hash collisions recover most true neighbors") {
    val truth = SimQueries.qKnnBrute(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = SimQueries.qKnnLsh(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty)
    val recall = truth.intersect(lsh).size.toDouble / truth.size
    // 5 bands × 3 bits over a RANDOM (structureless) corpus — LSH's worst
    // case; ~0.72 measured, must stay well above the ~0.49 candidate floor
    assert(recall >= 0.55, s"LSH recall $recall below floor")
    // per-query output is ranked 1..k with no gaps
    val ranks = SimQueries.qKnnLsh(spark, sf)
      .groupBy("query_id").agg(max("rank").as("mx"), count(lit(1)).as("n"))
      .filter(col("mx") =!= col("n")).count()
    assert(ranks == 0, "rank must be dense per query")
  }

  test("multimodal: feature extraction preserves ids, bytes and is deterministic") {
    val corpus = Multimodal.corpus(spark, sf)
    val feats = Multimodal.extractFeatures(corpus).collect()
    assert(feats.length == corpus.count())
    feats.foreach { f =>
      assert(f.byte_hist.length == 8)
      assert(f.byte_hist.sum == f.n_bytes, "histogram must cover every byte")
      assert(f.checksum.length == 32)
    }
    val again = Multimodal.extractFeatures(corpus).collect()
    assert(feats.map(_.checksum).sorted.sameElements(again.map(_.checksum).sorted))
  }

  test("multimodal: resize bounds payloads; frame-sample explodes 1→k") {
    val corpus = Multimodal.corpus(spark, sf)
    val resized = Multimodal.resize(corpus, 100).collect()
    assert(resized.forall(_.content.length <= 100))
    val frames = Multimodal.frameSample(spark, corpus, 2)
    assert(frames.count() >= corpus.count())
    assert(frames.columns.toSeq == Seq("id", "frame_idx", "frame_bytes"))
  }

  test("mm_frames: every-nth 64-byte blocks, signatures match a driver slice") {
    val rows = Multimodal.qFrames(spark, sf).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("frame_idx")) ->
        (r.getAs[String]("frame_sig"), r.getAs[Long]("n_bytes"))).toMap
    val payloads = Multimodal.corpus(spark, sf).collect()
      .map(m => m.id -> m.content).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = payloads.toSeq.flatMap { case (id, bytes) =>
      bytes.grouped(Multimodal.BatchSize).zipWithIndex
        .filter(_._2 % Multimodal.FrameEveryNth == 0)
        .map { case (block, idx) =>
          md.reset()
          (id, idx.toLong) ->
            (md.digest(block).map("%02x".format(_)).mkString, block.length.toLong)
        }
    }.toMap
    assert(rows == expected, s"${rows.size} frames vs ${expected.size} expected")
    // the sampling really skips: for multi-block docs, odd indices absent
    assert(rows.keys.forall(_._2 % Multimodal.FrameEveryNth == 0))
  }

  test("mm_frames_dedup: pairs equal a driver posting replay; repeats and hot sigs excluded") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val sigsByItem = Multimodal.corpus(spark, sf).collect().map { m =>
      val sigs = m.content.grouped(Multimodal.BatchSize).zipWithIndex
        .filter(_._2 % Multimodal.FrameEveryNth == 0)
        .map { case (b, _) => md.reset(); md.digest(b).map("%02x".format(_)).mkString }
        .toSet // DISTINCT sigs per item — intra-item repeats score once
      m.id -> sigs
    }.toMap
    val df = sigsByItem.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val keep = (sig: String) => df(sig) <= Multimodal.MaxFrameSigDf
    val ids = sigsByItem.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids if a < b
      shared = (sigsByItem(a).filter(keep) & sigsByItem(b).filter(keep)).size
      if shared >= Multimodal.MinSharedFrames
    } yield (a, b, shared.toLong)).toSet
    val got = Multimodal.qFramesDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("langid predicts a language for every doc; quality score in [0,1]") {
    val lang = TextQueries.qLangId(spark, sf)
    assert(lang.filter($"predicted_lang".isNull).isEmpty)
    val q = TextQueries.qQuality(spark, sf)
    assert(q.filter($"quality_score" < 0.0 || $"quality_score" > 1.0).isEmpty)
  }

  test("heavy hitters: exactly K rows, monotone counts, doc_freq <= occurrences") {
    val hh = TextQueries.qHeavyHitters(spark, sf).collect()
    assert(hh.length == TextQueries.HeavyHittersK)
    val occs = hh.map(_.getAs[Long]("occurrences"))
    assert(occs.zip(occs.tail).forall { case (a, b) => a >= b }, "not sorted desc")
    hh.foreach(r =>
      assert(r.getAs[Long]("doc_freq") <= r.getAs[Long]("occurrences")))
  }

  test("redaction: fingerprint changes iff terms were redacted, counts are real") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), md5(coalesce(col("text"), lit(""))).as("orig_fp"))
    val joined = TextQueries.qRedact(spark, sf).join(docs, "doc_id").collect()
    assert(joined.exists(_.getAs[Long]("n_redacted") > 0), "blocklist never fired")
    joined.foreach { r =>
      val changed = r.getAs[String]("redacted_fp") != r.getAs[String]("orig_fp")
      assert(changed == (r.getAs[Long]("n_redacted") > 0),
        s"doc ${r.getAs[Long]("doc_id")}: changed=$changed n=${r.getAs[Long]("n_redacted")}")
    }
  }

  test("incremental dedup (probe-side plan) equals cross-boundary filter of the full pair set") {
    // independent derivation: take the corpus-wide jaccard pairs and keep
    // those with exactly one endpoint in the incoming source — per-doc
    // match counts and best scores must agree with the probe-side plan
    val sf01 = "/root/testdata/sf0.01"
    val incSrc = graft.sources.Tables.documents(spark, sf01)
      .filter(col("source") === DedupQueries.IncomingSource)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val viaPairs = DedupQueries.qNgramJaccard(spark, sf01).collect()
      .flatMap { r =>
        val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
        (incSrc.contains(a), incSrc.contains(b)) match {
          case (true, false) => Some(a -> j)
          case (false, true) => Some(b -> j)
          case _ => None
        }
      }
      .groupBy(_._1).map { case (d, js) => (d, js.length.toLong, js.map(_._2).max) }
      .toSet
    val viaProbe = DedupQueries.qIncrementalDedup(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaProbe == viaPairs, s"probe=$viaProbe pairs=$viaPairs")
    assert(viaProbe.nonEmpty, "equivalence is vacuous on an empty result")
  }

  test("kmeans_train: complete cell rows, counts partition the corpus, Lloyd beats the seeds") {
    val rows = SimQueries.qKmeansTrain(spark, sf).collect()
    val byCluster = rows.groupBy(_.getAs[Long]("cluster"))
    assert(byCluster.size > 1 && byCluster.size <= SimQueries.KmeansK)
    byCluster.values.foreach { rs =>
      assert(rs.map(_.getAs[Long]("i")).sorted.toSeq == (1L to SimQueries.Dim.toLong),
        "every surviving cell must carry all dimension components")
      assert(rs.map(_.getAs[Long]("n_members")).distinct.length == 1,
        "member count must be constant across a cell's component rows")
    }
    val corpus = DedupQueries.quantized(spark, sf)
      .select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    assert(byCluster.values.map(_.head.getAs[Long]("n_members")).sum == corpus.length,
      "cell member counts must partition the corpus")
    // Lloyd monotonicity, verified independently: total squared distance to
    // the nearest TRAINED centroid must beat the same cost under the seed
    // centroids (the K lowest vec_ids) the iteration started from
    def cost(cents: Array[Array[Long]]): Long = corpus.map { case (_, v) =>
      cents.map(c => c.zip(v).map { case (ci, vi) => val d = ci - vi; d * d }.sum).min
    }.sum
    val trained = byCluster.values.map(rs =>
      rs.sortBy(_.getAs[Long]("i")).map(_.getAs[Long]("c")).toArray).toArray
    val seeds = corpus.sortBy(_._1).take(SimQueries.KmeansK).map(_._2)
    assert(cost(trained) < cost(seeds),
      s"training did not reduce inertia: ${cost(trained)} vs ${cost(seeds)}")
  }

  test("knn_ivf_trained: trained cells beat the fixture-label cells on recall") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val brute = pairs(SimQueries.qKnnBrute(spark, sf))
    val trained = SimQueries.qKnnIvfTrained(spark, sf)
    val perQuery = trained.groupBy("query_id").count().select("count").as[Long].collect()
    assert(perQuery.forall(_ <= SimQueries.K), "no query may exceed K neighbors")
    val bad = trained.as("x").join(trained.as("y"),
      $"x.query_id" === $"y.query_id" && $"x.rank" < $"y.rank" && $"x.cosine" < $"y.cosine")
    assert(bad.isEmpty, "cosine must be non-increasing in rank")
    // k-means cells reflect actual geometry, so they must beat both the
    // label partition (which ignores geometry) and the 2/8 random-probe
    // floor by a wide margin. Measured on this fixture: trained 0.50 vs
    // label 0.29 (floors 0.25 / 0.20) — deterministic, so pinned tightly.
    val labelRecall = (brute & pairs(SimQueries.qKnnIvf(spark, sf))).size.toDouble / brute.size
    val trainedRecall = (brute & pairs(trained)).size.toDouble / brute.size
    assert(trainedRecall > labelRecall,
      s"trained cells should beat label cells: $trainedRecall vs $labelRecall")
    assert(trainedRecall > 0.45, s"trained recall regressed: $trainedRecall")
  }

  test("dedup_survivors: quality argmax per cluster, one survivor each, sizes match") {
    val clusters = DedupQueries.qDedupClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val quality = TextQueries.quality(
        graft.sources.Tables.documents(spark, sf))
      .select(col("doc_id"), col("quality_score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = clusters.groupBy(_._2).map { case (cid, members) =>
      val elect = members.map(_._1)
        .minBy(d => (-quality(d), d)) // max score, ties by min doc_id
      (cid, elect, members.length.toLong, quality(elect))
    }.toSeq.sortBy(_._1)
    val got = DedupQueries.qSurvivors(spark, sf).orderBy("cluster_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == expected)
    // every cluster in a PAIR graph has >= 2 members, and the survivor
    // must be a member of its own cluster
    assert(got.forall(_._3 >= 2L))
    val membership = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
    assert(got.forall { case (cid, s, _, _) => membership(cid)(s) })
  }

  test("dedup_minhash_sweep: S-curve monotonicity; production config row equals the eval") {
    val rows = DedupQueries.qMinhashSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == DedupQueries.SweepBands.map(_.toLong).sorted)
    // every config shares the one truth
    assert(rows.map(_._4).distinct.length == 1)
    // the control law: more bands (shorter bands) can only ADD collisions —
    // a pair colliding on a band of r rows collides on some sub-band of
    // any refinement... not literally (bands don't nest across configs),
    // but on this corpus the monotone trend is the measured fact the
    // operator exists to show; pin it
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq, s"candidates not monotone: $rows")
    assert(rows.map(_._5).toSeq == rows.map(_._5).sorted.toSeq, s"hits not monotone: $rows")
    // the (Bands, RowsPerBand) row IS dedup_minhash_eval's summary
    val prod = rows.find(_._1 == DedupQueries.Bands.toLong).get
    val eval = DedupQueries.qMinhashEval(spark, sf).collect().head
    assert((prod._3, prod._4, prod._5, prod._6, prod._7) ==
      ((eval.getLong(0), eval.getLong(1), eval.getLong(2), eval.getLong(3),
        eval.getLong(4))))
  }
}
