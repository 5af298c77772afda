package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.text.TextQueries
import graft.sources.Tables

/** The tokenizer-training census against a driver-side brute force, and
  * the integer quality model's decision invariants. */
class TextModelSpec extends SparkSpec {

  /** The suite's tokenizer, re-implemented independently in plain Scala. */
  private def toksRef(text: String): Seq[String] =
    Option(text).getOrElse("").toLowerCase
      .replaceAll("[^a-z0-9 ]", " ").split(" +").filter(_.nonEmpty).toSeq

  test("bpe_pairs equals a driver-side brute-force census") {
    val docs = Tables.documents(spark, sf).select("text").collect().map(_.getString(0))
    val freq = scala.collection.mutable.Map.empty[String, Long]
    docs.flatMap(toksRef).foreach(w => freq(w) = freq.getOrElse(w, 0L) + 1L)
    val pc = scala.collection.mutable.Map.empty[String, (Long, Long)]
    freq.foreach { case (w, f) =>
      if (w.length >= 2) w.sliding(2).foreach { p =>
        val (c, n) = pc.getOrElse(p, (0L, 0L)); pc(p) = (c + f, n + 1)
      }
    }
    val expected = pc.toSeq
      .map { case (p, (c, n)) => (p, c, n) }
      .sortBy { case (p, c, _) => (-c, p) }
      .take(TextQueries.BpeK)
    val got = TextQueries.qBpePairs(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("text_quality_model: keep ≡ logit>0; features bounded; both classes at sf0.01") {
    val out = TextQueries.qQualityModel(spark, "/root/testdata/sf0.01")
    assert(out.filter(col("keep") =!= (col("logit_micro") > 0)).count() == 0)
    assert(out.filter(col("alpha_micro") < 0 || col("alpha_micro") > 1000000L ||
      col("stop_micro") < 0 || col("stop_micro") > 1000000L).count() == 0)
    val classes = out.groupBy("keep").count().count()
    assert(classes == 2, "the model threshold must split the corpus")
    // the logit is exactly the advertised linear form
    val recomputed = out.filter(
      col("logit_micro") =!= (lit(TextQueries.QmBias) +
        lit(TextQueries.QmWAlpha) * col("alpha_micro") +
        lit(TextQueries.QmWStop) * col("stop_micro") +
        lit(TextQueries.QmWLen) * col("len_ok")))
    assert(recomputed.count() == 0)
  }

  test("text_vocab + text_token_ids: id table and per-doc id sequences equal a driver tokenizer") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // driver-side vocabulary: top-K by (count desc, token), dense ids
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, t) => toksRef(t).foreach(w =>
      counts(w) = counts.getOrElse(w, 0L) + 1L) }
    val ranked = counts.toSeq.sortBy { case (w, n) => (-n, w) }
      .take(TextQueries.VocabK)
    val vocabExp = ranked.zipWithIndex
      .map { case ((w, n), i) => (w, i.toLong, n) }.toSet
    val vocabGot = TextQueries.qVocab(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(vocabGot == vocabExp && vocabGot.size == TextQueries.VocabK)
    assert(vocabGot.map(_._2) == (0L until TextQueries.VocabK).toSet, "dense ids")

    val idOf = ranked.zipWithIndex.map { case ((w, _), i) => w -> i.toLong }.toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = docs.toSeq.flatMap { case (id, t) =>
      val ids = toksRef(t).map(w => idOf.getOrElse(w, TextQueries.OovId))
      if (ids.isEmpty) None else {
        md.reset()
        val sig = md.digest(ids.mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val oov = ids.count(_ == TextQueries.OovId).toLong
        Some((id, ids.length.toLong, oov, 1000L * oov / ids.length, sig))
      }
    }.toSet
    val got = TextQueries.qTokenIds(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet
    assert(got == expected && got.nonEmpty)
  }

  test("text_phrase_search: per-doc occurrence counts equal a driver scan; repeats counted") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = (for {
      (id, text) <- docs.toSeq
      toks = toksRef(text)
      phrase <- TextQueries.SearchPhrases
      n = (if (toks.length >= 3) toks.sliding(3).count(_.mkString(" ") == phrase)
           else if (toks.mkString(" ") == phrase) 1 else 0).toLong
      if n > 0
    } yield (phrase, id, n)).toSet
    val got = TextQueries.qPhraseSearch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // adjacency matters: every hit doc contains all three words, but not
    // every doc containing the words is a hit (bag-of-words would differ)
    val words = TextQueries.SearchPhrases.head.split(" ").toSeq
    val bagHits = docs.count { case (_, t) =>
      val s = toksRef(t).toSet; words.forall(s.contains) }
    val phraseHits = got.count(_._1 == TextQueries.SearchPhrases.head)
    assert(phraseHits <= bagHits,
      s"phrase hits $phraseHits cannot exceed bag-of-words hits $bagHits")
  }

  test("text_lm_score: driver replay of the quantized familiarity; train scores above unseen-heavy") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // driver replay: same hash split via the engine's own md5 (one batch
    // call), same bigram multiset, same floor(log2(1+cnt))
    val splitMap = Tables.documents(spark, sf)
      .select(col("doc_id"),
        (pmod(graft.functions.Exact.md5Long(concat(lit("lmb|"), col("doc_id"))),
          lit(100L)) < TextQueries.LmTrainPct).as("tr"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val bigrams = docs.map { case (id, t) =>
      id -> toksRef(t).sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    }.toMap
    val counts = bigrams.toSeq.filter(kv => splitMap(kv._1))
      .flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    def log2floor(n: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(n)
    val expected = bigrams.filter(_._2.nonEmpty).map { case (id, bgs) =>
      val famSum = bgs.map(b => log2floor(1L + counts.getOrElse(b, 0L))).sum
      (id, splitMap(id), bgs.length.toLong, famSum,
        1000L * famSum / bgs.length)
    }.toSet
    val got = TextQueries.qLmScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected && got.nonEmpty)
    // the filter discriminates: scores vary across the corpus
    assert(got.map(_._5).toSeq.distinct.length > 1)
  }

  test("text_lm_eval: confusion counts close over the joined docs; median is exact lower-median") {
    val card = TextQueries.queries("text_lm_eval")(spark, sf).collect().head
    val (n, med, ka, kb, da, db, agree) = (card.getLong(0), card.getLong(1),
      card.getLong(2), card.getLong(3), card.getLong(4), card.getLong(5),
      card.getLong(6))
    assert(ka + kb + da + db == n && n > 0)
    assert(agree == 1000L * (ka + db) / n)
    // driver check of the threshold: exact lower median of the joined scores
    val scores = TextQueries.queries("text_lm_score")(spark, sf)
      .select(col("doc_id"), col("lm_milli")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val modelDocs = TextQueries.qQualityModel(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val joined = scores.filter(kv => modelDocs.contains(kv._1)).values.toSeq.sorted
    assert(joined.length.toLong == n)
    assert(med == joined((joined.length - 1) / 2),
      s"median $med vs driver ${joined((joined.length - 1) / 2)}")
    // the >= threshold split matches the counts
    assert((ka + da) == joined.count(_ >= med).toLong)
  }

  test("bpe_train: merge table AND final vocabulary equal a driver-side greedy BPE") {
    // independent reference: greedy left-to-right merge over char tuples
    val words = Tables.documents(spark, sf)
      .select(col("text")).collect().map(r => r.getString(0))
      .flatMap(toksRef).groupBy(identity).view.mapValues(_.size.toLong).toMap
    var vocab: Map[Vector[String], Long] =
      words.map { case (w, f) => w.toVector.map(_.toString) -> f }
    var table = Vector.empty[(Long, String, String, Long)]
    for (round <- 1 to TextQueries.BpeMerges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => pc(p) = pc.getOrElse(p, 0L) + f)
      }
      val ((bl, br), c) = pc.toSeq.minBy { case ((l, r), n) => (-n, l, r) }
      table :+= ((round.toLong, bl, br, c))
      vocab = vocab.toSeq.map { case (syms, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == bl && syms(i + 1) == br) {
            out += bl + br; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), f)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    val got = TextQueries.queries("bpe_train")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toVector
    assert(got == table, s"merge table:\n got=$got\n exp=$table")
    // the END STATE matches too: every word's final segmentation agrees
    val gotVocab = TextQueries.bpeFinalVocab(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expVocab = vocab.map { case (syms, f) => syms.mkString(" ") -> f }
    assert(gotVocab == expVocab)
    // merges genuinely applied: later rounds can elect pairs containing
    // merged symbols, and counts are non-increasing is NOT guaranteed —
    // but the elected pair must exist with positive weighted count
    got.foreach { case (_, _, _, c) => assert(c > 0L) }
  }

  test("bpe_encode: per-doc counts and stream signature equal a driver replay") {
    // one-truth chain: bpeFinalVocab is pinned ≡ an independent driver
    // BPE by the bpe_train test above; the encode replay reads THAT map
    val segMap = TextQueries.bpeFinalVocab(spark, sf).collect()
      .map(r => r.getString(0).replace(" ", "") -> r.getString(0)).toMap
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toksRef(r.getString(1)))
      .filter(_._2.nonEmpty)
      .map { case (id, ts) =>
        val segs = ts.map(segMap)
        id -> ((ts.size.toLong,
          segs.map(_.split(" ").length.toLong).sum,
          md5hex(segs.mkString(" "))))
      }.toMap
    assert(expect.nonEmpty)
    val got = TextQueries.queries("bpe_encode")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expect)
    // the merges genuinely compress: strictly fewer BPE tokens than
    // characters corpus-wide (at least one of the 4 trained merges fires)
    val totalSegs = got.values.map(_._2).sum
    val totalChars = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => toksRef(r.getString(0))).map(_.length.toLong).sum
    assert(totalSegs > 0 && totalSegs < totalChars,
      s"no compression: $totalSegs segs vs $totalChars chars")
  }

  test("bpe_eval: per-source fertility/compression card equals a driver replay") {
    // same one-truth chain as the encode test: the replay reads the
    // independently-pinned bpeFinalVocab segmentations
    val segMap = TextQueries.bpeFinalVocab(spark, sf).collect()
      .map(r => r.getString(0).replace(" ", "") -> r.getString(0)).toMap
    val rows = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), toksRef(r.getString(1))))
      .filter(_._2.nonEmpty)
    val expect = rows.groupBy(_._1).map { case (src, ds) =>
      val words = ds.map(_._2.size.toLong).sum
      val toks = ds.flatMap(_._2).map(w => segMap(w).split(" ").length.toLong).sum
      val chars = ds.flatMap(_._2).map(_.length.toLong).sum
      src -> ((ds.size.toLong, words, toks, chars,
        1000L * toks / words, 1000L * chars / toks))
    }
    val got = TextQueries.queries("bpe_eval")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == expect)
    // floors: a word is ≥ 1 token, a token is ≥ 1 character
    got.values.foreach { case (_, _, _, _, fert, cpt) =>
      assert(fert >= 1000L && cpt >= 1000L,
        s"fertility $fert / chars-per-token $cpt below floor")
    }
  }

  test("text_ppl_buckets: scored-doc grain, legal ids, ordered non-overlapping terciles, ties intact") {
    val dir = "/root/testdata/sf0.01"
    val out = TextQueries.qPplBuckets(spark, dir).cache()
    assert(out.count() == TextQueries.qLmScore(spark, dir).count(),
      "grain = scored docs (≥ 2 tokens)")
    assert(out.filter(!col("bucket_id").isin(0L, 1L, 2L)).count() == 0)
    assert(out.filter(
      (col("bucket_id") === 0L && col("ppl_bucket") =!= "head") ||
        (col("bucket_id") === 1L && col("ppl_bucket") =!= "middle") ||
        (col("bucket_id") === 2L && col("ppl_bucket") =!= "tail")).count() == 0)
    // a tie group (lang, lm_milli) never straddles a bucket boundary
    assert(out.groupBy("lang", "lm_milli")
      .agg(countDistinct("bucket_id").as("k")).filter(col("k") > 1).count() == 0)
    // within a lang, buckets are score-ordered and disjoint: every head
    // score strictly above every middle score, middle above tail; and
    // with tie flex each bucket still lands within a tie-width of N/3
    val stats = out.groupBy("lang", "bucket_id")
      .agg(min("lm_milli").as("lo"), max("lm_milli").as("hi"),
        count(lit(1)).as("n")).collect()
    stats.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val m = rows.map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      for (b <- 0L to 1L if m.contains(b) && m.contains(b + 1))
        assert(m(b)._1 > m(b + 1)._2, s"$lang: bucket $b overlaps ${b + 1}")
      val n = rows.map(_.getLong(4)).sum
      m.values.foreach { case (_, _, bn) =>
        assert(bn <= n, s"$lang bucket bigger than lang") }
      assert(m.values.map(_._3).sum == n)
    }
    out.unpersist()
  }

  test("text_ppl_buckets_incremental: batch-only grain, threshold routing honored, score-monotone") {
    val dir = "/root/testdata/sf0.01"
    val inc = graft.ext.dedup.DedupQueries.IncomingSource
    val out = TextQueries.queries("text_ppl_buckets_incremental")(spark, dir).cache()
    // grain: exactly the incoming docs with >= 2 tokens (the scoring grain)
    val incScored = Tables.documents(spark, dir)
      .filter(col("source") === inc)
      .filter(size(graft.ext.text.TextNorm.toks(col("text"))) >= 2).count()
    assert(out.count() == incScored && incScored > 0)
    // routing honors the frozen thresholds exactly
    val th = TextQueries.pplArtifacts(spark, dir)._2.collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    out.collect().foreach { r =>
      val (lang, s, b) = (r.getString(1), r.getLong(2), r.getLong(3))
      val expect = th.get(lang) match {
        case Some((Some(h), _)) if s >= h   => 0L
        case Some((_, Some(m2))) if s >= m2 => 1L
        case _                              => 2L
      }
      assert(b == expect, s"doc ${r.getLong(0)} ($lang, $s): bucket $b != $expect")
    }
    // within a lang, a better score never lands in a worse bucket
    import spark.implicits._
    out.select("lang", "lm_milli", "bucket_id").as[(String, Long, Long)]
      .collect().groupBy(_._1).values.foreach { g =>
        g.sortBy(-_._2).foldLeft(0L) { (prev, t) =>
          assert(t._3 >= prev, s"bucket regressed at $t"); math.max(prev, t._3) }
      }
    out.unpersist()
  }
}
