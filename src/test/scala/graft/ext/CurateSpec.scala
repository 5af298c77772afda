package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.pipeline.{CurateQueries, CurateRunner}
import graft.functions.Salt
import graft.sources.Tables

/** Composition-level invariants of the curation pipeline + salting. */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  test("curated corpus is a strict filter of the input with no dup survivors") {
    val curated = CurateQueries.qCurate(spark, sf).cache()
    val all = Tables.documents(spark, sf).count()
    val n = curated.count()
    assert(n > 0 && n <= all)
    // no surviving near-dup pair: both endpoints can't be in the output
    val pairs = graft.ext.dedup.DedupQueries.qNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val ids = curated.select("doc_id").as[Long].collect().toSet
    pairs.foreach { case (a, b) =>
      assert(!(ids(a) && ids(b)), s"near-dup pair ($a,$b) both survived")
    }
    curated.unpersist()
  }

  test("clustered curation ⊆ greedy curation; exactly one survivor per dup cluster") {
    val greedy = CurateQueries.qCurate(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val clustered = CurateQueries.qCurateClustered(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(clustered.subsetOf(greedy),
      s"cluster rule can only delete MORE: extra ${clustered -- greedy}")
    // per component: exactly the min survives the near-dup cut (unless the
    // quality/exact stages already removed it)
    val comps = graft.ext.dedup.DedupQueries.qDedupClusters(spark, sf)
      .as[(Long, Long)].collect()
    comps.foreach { case (doc, cid) =>
      if (doc != cid) assert(!clustered.contains(doc),
        s"non-min member $doc of cluster $cid must not survive")
    }
  }

  test("sample split covers every doc exactly once, ~90/5/5") {
    val split = CurateQueries.qSampleSplit(spark, sf)
    val total = split.agg(sum("n_docs")).head().getLong(0)
    assert(total == Tables.documents(spark, sf).count())
    val bySplit = split.groupBy("split").agg(sum("n_docs").as("n"))
      .as[(String, Long)].collect().toMap
    val train = bySplit.getOrElse("train", 0L).toDouble / total
    assert(train > 0.8 && train < 0.97, s"train share $train")
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
  }

  test("shard packing conserves tokens and respects the shard budget") {
    val shards = CurateQueries.qPackShards(spark, sf).cache()
    val totalPacked = shards.agg(sum("shard_tokens")).head().getLong(0)
    val totalTokens = Tables.documents(spark, sf)
      .select(size(graft.ext.text.TextNorm.toks(col("text"))).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    assert(totalPacked == totalTokens, "packing must conserve tokens")
    // every shard except possibly the last per lang starts within budget:
    // a shard's first doc starts at offset shard*budget, so shards are
    // contiguous 0..max with no gaps
    val perLang = shards.groupBy("lang")
      .agg(countDistinct("shard").as("n"), max("shard").as("mx"))
      .as[(String, Long, Long)].collect()
    perLang.foreach { case (lang, n, mx) =>
      assert(n == mx + 1, s"$lang shards not contiguous: $n distinct, max $mx")
    }
    shards.unpersist()
  }

  test("pack_manifest: dense slots, contiguous offsets, and exact agreement with pack_shards") {
    val man = CurateQueries.qPackManifest(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val shards = CurateQueries.qPackShards(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // per (lang, shard): slot count and token mass equal the summary
    val byShard = man.groupBy(m => (m._1, m._2))
    assert(byShard.keySet == shards.keySet)
    byShard.foreach { case (k, rows) =>
      assert((rows.length.toLong, rows.map(_._5).sum) == shards(k), s"$k")
      // positions are 1..n dense
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq, s"$k slots")
    }
    // per lang: offsets are the exact running token sum in doc_id order
    man.groupBy(_._1).foreach { case (lang, rows) =>
      val ordered = rows.sortBy(_._4)
      var cum = 0L
      ordered.foreach { r =>
        assert(r._6 == cum, s"$lang doc ${r._4}: offset ${r._6} != $cum")
        cum += r._5
      }
    }
  }

  test("pack_sequences: two-phase offsets equal a driver cumsum over the hash order") {
    def md5l(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 15), 16)
    val enc = graft.ext.text.TextQueries.bpeEncoded(spark, sf)
      .select("doc_id", "n_bpe_tokens").as[(Long, Long)].collect()
    val ordered = enc.sortBy { case (id, _) => (md5l(s"pack|$id"), id) }
    var cum = 0L
    val expectOff = ordered.map { case (id, n) =>
      val o = cum; cum += n; id -> ((n, o))
    }.toMap
    val b = CurateQueries.PackSeqLen
    val got = CurateQueries.qPackSequences(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == expectOff.keySet)
    got.foreach { case (id, (n, off, first, last, nseqs)) =>
      val (en, eo) = expectOff(id)
      assert(n == en && off == eo, s"doc $id: ($n,$off) != ($en,$eo)")
      assert(first == off / b && last == (off + n - 1) / b
        && nseqs == last - first + 1, s"doc $id chunk math")
    }
    // conservation: the layout ends exactly at the corpus token total
    assert(cum == enc.map(_._2).sum)
  }

  test("CurateRunner materializes the curated corpus partitioned by (split, lang)") {
    val out = java.nio.file.Files.createTempDirectory("graft_curated").toString
    val n = CurateRunner.run(spark, sf, out)
    assert(n == CurateQueries.qCurateClustered(spark, sf).count(),
      "written corpus must be exactly the clustered-curation survivors")
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("split=")) && dirs.contains("split=train"))
    // partition columns are recovered on read, payload survives the round-trip
    val back = spark.read.parquet(out)
    assert(back.columns.toSet.contains("split") && back.columns.toSet.contains("lang"))
    assert(back.filter(col("text").isNull).count() == 0)
    // the decontamination flag: present and non-null on every train row,
    // null elsewhere, and consistent with the scrub query for survivors
    assert(back.filter(col("split") === "train" && col("decontam_removed").isNull).count() == 0)
    assert(back.filter(col("split") =!= "train" && col("decontam_removed").isNotNull).count() == 0)
    val flagged = CurateQueries.qDecontamScrub(spark, sf)
      .filter(col("n_removed") > 0).select("doc_id").as[Long].collect().toSet
    val backFlagged = back.filter(col("decontam_removed") > 0)
      .select("doc_id").as[Long].collect().toSet
    val survivorIds = back.select("doc_id").as[Long].collect().toSet
    assert(backFlagged == flagged.intersect(survivorIds),
      "written leakage flags must match the scrub query restricted to survivors")
  }

  test("corpus_report: groups partition the corpus; means and cut fractions bounded") {
    val r = CurateQueries.qCorpusReport(spark, sf).collect()
    val docs = Tables.documents(spark, sf).count()
    assert(r.map(_.getAs[Long]("n_docs")).sum == docs)
    r.foreach { row =>
      val m = row.getAs[Double]("mean_quality")
      assert(m >= 0.0 && m <= 1.0, s"mean_quality out of range: $m")
      assert(row.getAs[Long]("n_below_min") <= row.getAs[Long]("n_docs"))
      assert(row.getAs[Long]("total_tokens") > 0)
    }
  }

  test("salted aggregation is exactly equivalent to direct aggregation") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("k"),
        graft.functions.Exact.cents(col("l_extendedprice")).as("v"))
    val direct = li.groupBy("k").agg(sum("v").as("total"))
      .as[(String, Long)].collect().toMap
    val salted = Salt.saltedSum(li, col("k"), col("v"), "total", salts = 8)
      .as[(String, Long)].collect().toMap
    assert(direct == salted)
    val directCnt = li.groupBy("k").count().as[(String, Long)].collect().toMap
    val saltedCnt = Salt.saltedCount(li, col("k"), "n", salts = 8)
      .as[(String, Long)].collect().toMap
    assert(directCnt == saltedCnt)
    val both = Salt.saltedSumCount(li, col("k"), col("v"), "total", "n", salts = 8)
      .as[(String, Long, Long)].collect()
    assert(both.map(r => r._1 -> r._2).toMap == direct)
    assert(both.map(r => r._1 -> r._3).toMap == directCnt)
  }

  test("contamination: bounded ratios, consistent flags, hits never exceed totals") {
    val c = CurateQueries.qContamination(spark, sf).collect()
    assert(c.nonEmpty)
    c.foreach { r =>
      val n = r.getAs[Long]("n_shingles"); val h = r.getAs[Long]("n_hit")
      val ratio = r.getAs[Double]("contamination")
      assert(h >= 0 && h <= n)
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Boolean]("flagged") == (ratio >= CurateQueries.ContaminationMax))
    }
  }

  test("contamination: a train-split near-dup of a test doc IS detected") {
    // the corpus has exact/near dups by construction; at least one test doc
    // should overlap heavily with the train side at sf0.01 (where the
    // driver's oracle gate runs). At sf0.001 just require the query runs.
    val big = CurateQueries.qContamination(spark, "/root/testdata/sf0.01")
    assert(big.filter(col("flagged")).count() > 0,
      "no flagged contamination at sf0.01 -- threshold or splits broken")
  }

  test("q_decontam_scrub: train docs lose exactly the spans they share with test docs") {
    import graft.ext.dedup.DedupQueries
    val W = DedupQueries.SpanWindow
    // the split rule is oracle-pinned by sample_split; reusing it here
    // only fixes WHICH docs are train/test, not the scrub logic under test
    val buckets = Tables.documents(spark, sf)
      .select($"doc_id",
        pmod(graft.functions.Exact.md5Long(concat(lit("split|"), $"doc_id")), lit(100))
          .as("b"))
      .as[(Long, Long)].collect().toMap
    val trainP = CurateQueries.TrainPct
    val valP = CurateQueries.ValPct
    def isTrain(id: Long) = buckets(id) < trainP
    def isTest(id: Long) = buckets(id) >= valP
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def toks(s: String): Array[String] =
      Option(s).getOrElse("").toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .split(" +").filter(_.nonEmpty)
    // windows over the val-filtered universe, STRING-keyed
    val wins = for {
      (id, text) <- docs.toSeq
      if isTrain(id) || isTest(id)
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
      .flatMap(os => for { a <- os; b <- os; if isTrain(a._2) && isTest(b._2) }
        yield ((a._2, b._2), a._3 - b._3, a._3))
      .groupBy(m => (m._1, m._2))
      .toSeq
      .flatMap { case (((da, _), _), ms) =>
        runsWithStart(ms.map(_._3).toSeq)
          .filter(_._2 >= DedupQueries.MinSpanWindows)
          .flatMap { case (sa, wdt) => (sa until (sa + wdt + W - 1)).map(p => da -> p) }
      }
      .groupBy(_._1).map { case (d, ps) => d -> ps.map(_._2).toSet }
    val expected = docs.collect { case (id, text) if isTrain(id) =>
      val t = toks(text)
      val cov = covered.getOrElse(id, Set.empty[Long])
      val keptToks = t.zipWithIndex.collect { case (tok, i) if !cov(i + 1L) => tok }
      (id, t.length.toLong, cov.size.toLong, keptToks.mkString(" "))
    }.toSet
    assert(expected.exists(_._3 > 0), "fixture should contain train/test leakage")
    val got = CurateQueries.qDecontamScrub(spark, sf)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == expected,
      s"decontam diverges: got ${got.size} rows, expected ${expected.size}")
    // the output IS the train split — every train doc once, nothing else
    assert(got.map(_._1) == docs.collect { case (id, _) if isTrain(id) => id }.toSet)
  }

  test("mix_epochs: all-integer plan conserves budget within floor loss; small langs repeat more") {
    val out = CurateQueries.qMixEpochs(spark, sf).collect()
    assert(out.length > 1)
    val total = out.map(_.getAs[Long]("lang_tokens")).sum
    val budget = total * CurateQueries.EpochBudgetX
    val planned = out.map(_.getAs[Long]("planned_tokens")).sum
    // each lang's floor DIV loses < 1 token of the budget
    assert(planned <= budget && planned > budget - out.length)
    // the integer pipeline, recomputed driver-side
    val sumWq = out.map(_.getAs[Long]("wq")).sum
    out.foreach { r =>
      val lt = r.getAs[Long]("lang_tokens")
      assert(r.getAs[Long]("wq") == math.floor(math.sqrt(lt.toDouble) * 1e6 + 0.5).toLong)
      val p = r.getAs[Long]("wq") * budget / sumWq
      assert(r.getAs[Long]("planned_tokens") == p)
      assert(r.getAs[Long]("epochs_milli") == 1000L * p / lt)
      assert(r.getAs[Long]("n_full_epochs") == p / lt)
      assert(r.getAs[Long]("remainder_tokens") == p % lt)
    }
    // √-weighting repeats low-resource languages more
    val byTok = out.sortBy(_.getAs[Long]("lang_tokens"))
    assert(byTok.head.getAs[Long]("epochs_milli") >= byTok.last.getAs[Long]("epochs_milli"))
    // with a 2× budget and compressed skew, the smallest language trains
    // for more than one epoch
    assert(byTok.head.getAs[Long]("epochs_milli") > 1000L)
  }

  test("q_global_rank: exact total order, phases balanced, no single-partition window") {
    val out = CurateQueries.qGlobalRank(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()
    assert(out.count() == n)
    val rows = out.collect()
    // ranks are the permutation 1..n
    assert(rows.map(_.getAs[Long]("global_rank")).sorted.toSeq == (1L to n))
    // ordering matches a driver-side sort of the oracle-pinned scores
    val driverOrder = rows
      .sortBy(r => (-r.getAs[Double]("quality_score"), r.getAs[Long]("doc_id")))
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(rows.sortBy(_.getAs[Long]("global_rank")).map(_.getAs[Long]("doc_id")).toSeq
      == driverOrder)
    // phase = floor(NPhases * (rank-1) / n): monotone in rank, sizes within 1
    val phases = rows.map(r =>
      r.getAs[Long]("global_rank") -> r.getAs[Long]("phase")).sortBy(_._1).map(_._2)
    assert(phases.head == 0L && phases.last == (CurateQueries.NPhases - 1).toLong)
    assert(phases.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    val sizes = phases.groupBy(identity).values.map(_.length).toSeq
    assert(sizes.max - sizes.min <= 1, s"phase sizes $sizes")
    // scale guard: the rank comes from a RANGE exchange + offset pass —
    // the plan must not contain a partition-less Window over the corpus
    val sortPlan = graft.ext.text.TextQueries.qQuality(spark, sf)
      .select(col("doc_id"), col("quality_score"))
      .orderBy(col("quality_score").desc, col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(sortPlan.toLowerCase.contains("rangepartitioning"), sortPlan)
    assert(!out.queryExecution.executedPlan.toString.contains("Window"),
      "global rank must not be a window")
    out.unpersist()
  }

  test("q_len_quantiles: rank-exact per-language quantiles match a driver sort") {
    val docs = Tables.documents(spark, sf)
      .select($"lang", $"text").as[(String, String)].collect()
    def nToks(s: String): Long =
      Option(s).getOrElse("").toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .split(" +").count(_.nonEmpty).toLong
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val ns = ds.map(d => nToks(d._2)).sorted
      val cnt = ns.length.toLong
      def at(num: Long, den: Long) = ns(((num * cnt + den - 1) / den - 1).toInt)
      (lang, cnt, at(1, 2), at(9, 10), at(99, 100))
    }.toSet
    val got = CurateQueries.qLenQuantiles(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got == expected, s"quantiles diverge: $got vs $expected")
    got.foreach { case (lang, _, p50, p90, p99) =>
      assert(p50 <= p90 && p90 <= p99, s"$lang quantiles not monotone")
    }
  }

  test("q_len_quantiles_approx tracks the exact quantiles within sketch tolerance") {
    // the q_mad_outliers_approx discipline: the sketch twin's gate is a
    // tolerance bound against the exact oracled form — 5% relative with
    // a small absolute floor (token lengths are small integers where one
    // rank step can be a whole token)
    val exact = CurateQueries.qLenQuantiles(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val approx = CurateQueries.qLenQuantilesApprox(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    approx.foreach { case (lang, (_, n, a50, a90, a99)) =>
      val (_, en, e50, e90, e99) = exact(lang)
      assert(n == en, s"$lang: n_docs must be exact")
      def close(a: Long, e: Long, what: String): Unit =
        assert(math.abs(a - e) <= math.max(0.05 * e, 3.0),
          s"$lang $what: approx $a vs exact $e")
      close(a50, e50, "p50"); close(a90, e90, "p90"); close(a99, e99, "p99")
    }
  }

  test("stratified sample: realized rates track targets, and resampling is stable") {
    val s1 = CurateQueries.qStratifiedSample(spark, "/root/testdata/sf0.01")
    val rows = s1.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val target = r.getAs[Double]("target_rate")
      val realized = r.getAs[Double]("realized_rate")
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_total"))
      // md5 buckets are uniform; at a few hundred docs per stratum allow a
      // wide-but-meaningful tolerance band
      assert(math.abs(realized - target) < 0.15,
        s"lang=${r.getAs[String]("lang")} target=$target realized=$realized")
    }
    // deterministic: a second run returns the identical result SET (row
    // order of a groupBy output is not a Spark contract — compare sorted)
    val s2 = CurateQueries.qStratifiedSample(spark, "/root/testdata/sf0.01")
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().toSeq.sortBy(_.getAs[String]("lang")).toString
    assert(sorted(s1) == sorted(s2))
  }

  test("mix rebalance: moves the token mix toward uniform, keeps under-budget langs whole") {
    val rows = CurateQueries.qMixRebalance(spark, "/root/testdata/sf0.01").collect()
    assert(rows.length > 1, "need a multi-language corpus for a mix to exist")
    val n = rows.length
    val shares = rows.map(_.getAs[Double]("token_share"))
    val realized = rows.map(_.getAs[Double]("realized_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    assert(math.abs(realized.sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val rate = r.getAs[Double]("target_rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("sampled_tokens") <= r.getAs[Long]("lang_tokens"))
      // under-budget languages are never thinned
      if (rate == 1.0)
        assert(r.getAs[Long]("n_sampled") == r.getAs[Long]("n_docs"))
    }
    // the corpus IS skewed (en-heavy): at least one language must be thinned
    assert(rows.exists(_.getAs[Double]("target_rate") < 1.0),
      "no language over budget -- fixture skew assumption broken")
    // rebalanced mix is closer to uniform than the raw mix (strictly, since
    // thinning happened): compare max deviation from the uniform share 1/n
    def maxDev(xs: Array[Double]) = xs.map(x => math.abs(x - 1.0 / n)).max
    assert(maxDev(realized) < maxDev(shares),
      s"rebalance did not move toward uniform: ${maxDev(realized)} vs ${maxDev(shares)}")
  }

  test("mix temperature: flattens skew but preserves the size ranking (unlike uniform)") {
    val rows = CurateQueries.qMixTemperature(spark, "/root/testdata/sf0.01").collect()
      .sortBy(-_.getAs[Long]("lang_tokens"))
    assert(rows.length > 1)
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val rate = r.getAs[Double]("target_rate")
      assert(rate > 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
    }
    // the sampled corpus respects the budget: can't exceed the raw total,
    // and lands in the neighborhood of MixBudgetFrac of it
    val totalRaw = rows.map(_.getAs[Long]("lang_tokens")).sum
    val totalSampled = rows.map(_.getAs[Long]("sampled_tokens")).sum
    assert(totalSampled <= totalRaw)
    assert(totalSampled > (totalRaw * CurateQueries.MixBudgetFrac * 0.7).toLong,
      s"sampled far below budget: $totalSampled of $totalRaw")
    // α = 0.5 weights are monotone in size, so the deterministic per-lang
    // token BUDGETS (rate · tokens) must keep the raw ordering — the
    // REALIZED shares can swap near-equal languages (whole docs are
    // sampled, so realization noise is a few docs' tokens), which is why
    // the assert targets the budget, not the sample ...
    val budgets = rows.map(r =>
      r.getAs[Double]("target_rate") * r.getAs[Long]("lang_tokens"))
    assert(budgets.sameElements(budgets.sortBy(-(_: Double))),
      "temperature budgets inverted the language ranking")
    // ... while compressing the realized ratio between top and bottom
    val realized = rows.map(_.getAs[Double]("realized_share"))
    val shares = rows.map(_.getAs[Double]("token_share"))
    assert(realized.head / realized.last < shares.head / shares.last,
      "temperature did not compress the mix skew")
  }

  test("q_weighted_sample: singletons always survive; kept set matches a driver md5 replay") {
    val weights = CurateQueries.qDupWeights(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = CurateQueries.qWeightedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // independent replay of the bucket rule: md5 hex → first 15 nibbles →
    // long → mod 1000, the engine-shared Exact.md5Long definition
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      md.reset()
      val hex = md.digest(s"wsamp|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1000L
    }
    val expected = weights.collect {
      case (id, (c, n, w)) if bucket(id) < w => (id, c, n, w)
    }.toSet
    assert(got == expected && got.nonEmpty)
    // soft dedup never loses unique content: every weight-1000 singleton
    // is in the sample unconditionally
    val singletons = weights.collect { case (id, (_, 1L, _)) => id }.toSet
    assert(singletons.nonEmpty &&
      singletons.forall(id => got.exists(_._1 == id)))
    // and duplication is genuinely thinned: kept docs from multi-doc
    // clusters number well under their membership
    val multiMembers = weights.count(_._2._2 > 1L)
    val multiKept = got.count(_._3 > 1L)
    assert(multiMembers == 0 || multiKept < multiMembers)
  }

  test("train_triplets: one triple per pair; negative is the min-hash eligible bucket member") {
    val pairSet = graft.ext.dedup.DedupQueries.qNgramJaccard(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val docs = Tables.documents(spark, sf).select("doc_id").as[Long].collect().toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      md.reset()
      java.lang.Long.parseLong(
        md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15), 16)
    }
    val b = math.max(1L, docs.length / CurateQueries.NegOccupancy)
    val expected = pairSet.flatMap { case (a, p) =>
      val nb = h(s"negp|$a") % b
      val elig = docs.filter(d => h(s"negb|$d") % b == nb && d != a && d != p &&
        !pairSet.contains((math.min(a, d), math.max(a, d))))
      if (elig.isEmpty) None
      else Some((a, p, elig.minBy(d => (h(s"negh|$d"), d))))
    }
    val got = CurateQueries.qTrainTriplets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairSet.nonEmpty && got == expected)
    // on this corpus every anchor finds a negative, and no negative is a
    // known near-dup of its anchor (re-checked on the engine output)
    assert(got.size == pairSet.size)
    got.foreach { case (a, _, n) =>
      assert(n != a &&
        !pairSet.contains((math.min(a, n), math.max(a, n))), s"($a,$n)") }
  }

  test("q_source_cap: full grain, dense ranks, kept = the top-cap of the deterministic order") {
    // sf0.01: 25 docs/source > the 15-doc cap, so the cap genuinely cuts
    val dir = "/root/testdata/sf0.01"
    val out = CurateQueries.qSourceCap(spark, dir).cache()
    assert(out.count() == Tables.documents(spark, dir).count(), "full doc grain")
    val bySrc = out.groupBy("source").agg(
      count(lit(1)).as("n"), sum(col("kept").cast("long")).as("k"),
      max("src_rank").as("maxr")).collect()
    assert(bySrc.nonEmpty)
    bySrc.foreach { r =>
      val (n, k, maxr) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(k == math.min(CurateQueries.CapPerSource, n), s"${r.getString(0)}: k=$k n=$n")
      assert(maxr == n, "row_number must be dense 1..n per source")
    }
    // kept is EXACTLY the first cap rows of the (logit desc, doc_id) order
    val rows = out.select("source", "logit_micro", "doc_id", "kept")
      .as[(String, Long, Long, Boolean)].collect()
    rows.groupBy(_._1).foreach { case (src, g) =>
      val expect = g.sortBy(t => (-t._2, t._3))
        .take(CurateQueries.CapPerSource.toInt).map(_._3).toSet
      val gotKept = g.filter(_._4).map(_._3).toSet
      assert(gotKept == expect, s"$src kept-set mismatch")
    }
    out.unpersist()
  }

  /** Synthetic corpus+batch exercising all six curate_incremental
    * verdicts (the real tables only produce kept/near_dup_corpus at test
    * SF) — built once, shared by the screen test and the sequential-
    * lifecycle test. */
  private lazy val incFixtureDir: String = {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val textA = words("alpha", 25)
    val textB = words("bravo", 25)
    val textC = words("charlie", 25)
    val textD = words("delta", 25)
    val textE = words("echo", 25)
    val junk = "000 111 222"
    val inc = graft.ext.dedup.DedupQueries.IncomingSource
    val dir = java.nio.file.Files.createTempDirectory("curate_inc").toString
    Seq(
      (1L, textA, "en", "src0"),            // corpus
      (2L, textB, "en", "src0"),
      (3L, junk, "en", "src0"),
      (101L, textA, "en", inc),             // exact copy of corpus A
      (102L, textC, "en", inc),             // batch-dup pair: keeper
      (103L, textC, "en", inc),             // batch-dup pair: loser
      (104L, textB + " bravoX", "en", inc), // near-dup of corpus B (j=23/24)
      (105L, textD, "en", inc),             // within-batch near-dup: keeper
      (106L, textD + " deltaX", "en", inc), // within-batch near-dup: loser
      (107L, junk + " 333", "en", inc),     // low quality
      (108L, junk, "en", inc),              // low quality AND exact corpus dup
      (109L, textE, "en", inc))             // clean
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("curate_incremental: every verdict branch fires on a crafted batch, precedence holds") {
    val dir = incFixtureDir
    val inc = graft.ext.dedup.DedupQueries.IncomingSource
    val out = CurateQueries.qCurateIncremental(spark, dir)
      .select("doc_id", "verdict", "keep")
      .as[(Long, String, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val expect = Map(
      101L -> ("exact_dup_corpus", false),
      102L -> ("kept", true),
      103L -> ("exact_dup_batch", false),
      104L -> ("near_dup_corpus", false),
      105L -> ("kept", true),
      106L -> ("near_dup_batch", false),
      107L -> ("low_quality", false),
      108L -> ("low_quality", false),      // precedence over exact_dup_corpus
      109L -> ("kept", true))
    assert(out.keySet == expect.keySet, s"batch grain: ${out.keySet}")
    expect.foreach { case (id, e) =>
      assert(out(id) == e, s"doc $id: got ${out(id)}, want $e")
    }
    // on the REAL tables: grain = full incoming slice, keep ⟺ kept
    val real = CurateQueries.qCurateIncremental(spark, sf).cache()
    val incoming = Tables.documents(spark, sf)
      .filter(col("source") === inc).count()
    assert(real.count() == incoming && incoming > 0)
    assert(real.filter(col("keep") =!= (col("verdict") === "kept")).count() == 0)
    real.unpersist()
  }

  test("index append ≡ rebuild from scratch over corpus ∪ survivors (real tables)") {
    import graft.ext.dedup.DedupQueries
    val inc = DedupQueries.IncomingSource
    val (posts, sizes) = DedupQueries.corpusIndex(spark, sf)
    val hashes = DedupQueries.corpusHashIndex(spark, sf)
    val batch = Tables.documents(spark, sf).filter(col("source") === inc)
    val kept = CurateQueries.qCurateIncremental(spark, sf)
      .filter(col("keep")).select("doc_id")
    val survivors = batch.join(kept, Seq("doc_id"), "left_semi")
    val (ap, asz, ah) = DedupQueries.indexAppend(survivors, posts, sizes, hashes)
    val (rp, rsz, rh) = DedupQueries.indexOf(
      Tables.documents(spark, sf).filter(col("source") =!= inc).union(survivors))
    def postSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("h"), array_join(transform(sort_array(col("docs")),
        x => x.cast("string")), ",").as("d")).as[(Long, String)].collect().toSet
    assert(postSet(ap) == postSet(rp), "posting lists diverge from rebuild")
    assert(asz.as[(Long, Long)].collect().toSet == rsz.as[(Long, Long)].collect().toSet,
      "size table diverges from rebuild")
    assert(ah.as[String].collect().toSet == rh.as[String].collect().toSet,
      "hash set diverges from rebuild")
    assert(postSet(ap) != postSet(posts), "append must actually add survivors")
  }

  test("sequential lifecycle: screen b1 → append survivors → screen b2 ≡ one-shot keep set") {
    import graft.ext.dedup.DedupQueries
    val dir = incFixtureDir
    val inc = DedupQueries.IncomingSource
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("source") =!= inc)
    val batchAll = docs.filter(col("source") === inc)
    // cross-batch dups: 103 (exact copy of 102 ∈ b1) and 106 (near-dup of
    // 105 ∈ b1) arrive in the SECOND batch
    val b1Ids = Set(101L, 102L, 105L, 107L)
    val b1 = batchAll.filter(col("doc_id").isin(b1Ids.toSeq: _*))
    val b2 = batchAll.filter(!col("doc_id").isin(b1Ids.toSeq: _*))
    val (p0, s0, h0) = DedupQueries.indexOf(corpus)
    val r1 = CurateQueries.curateScreen(b1, p0, s0, h0).cache()
    val surv1 = b1.join(r1.filter(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi")
    val (p1, s1, h1) = DedupQueries.indexAppend(surv1, p0, s0, h0)
    val r2 = CurateQueries.curateScreen(b2, p1, s1, h1).cache()
    val seqVerdicts = (r1.union(r2)).select("doc_id", "verdict", "keep")
      .as[(Long, String, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    // keep set identical to the one-shot screen
    val oneShot = CurateQueries.qCurateIncremental(spark, dir)
      .select("doc_id", "verdict", "keep")
      .as[(Long, String, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(seqVerdicts.keySet == oneShot.keySet)
    assert(seqVerdicts.filter(_._2._2).keySet == oneShot.filter(_._2._2).keySet,
      "sequential lifecycle must keep exactly the one-shot survivor set")
    // cross-batch dups reroute batch-verdicts to corpus-verdicts — the
    // labels a deployment actually records once earlier survivors are
    // part of the index
    assert(oneShot(103L)._1 == "exact_dup_batch" &&
      seqVerdicts(103L)._1 == "exact_dup_corpus")
    assert(oneShot(106L)._1 == "near_dup_batch" &&
      seqVerdicts(106L)._1 == "near_dup_corpus")
    // all other verdicts are unchanged
    (seqVerdicts.keySet -- Set(103L, 106L)).foreach { id =>
      assert(seqVerdicts(id) == oneShot(id), s"doc $id verdict drifted")
    }
    r1.unpersist(); r2.unpersist()
  }

  test("index forget ≡ rebuild from scratch over corpus minus the request list (real tables)") {
    import graft.ext.dedup.DedupQueries
    val inc = DedupQueries.IncomingSource
    val corpus = Tables.documents(spark, sf).filter(col("source") =!= inc)
    // deterministic request list, the qIndexForget selection
    val ids = corpus
      .filter(pmod(graft.functions.Exact.md5Long(
        concat(lit("forget|"), col("doc_id"))), lit(100L)) < CurateQueries.ForgetPct)
      .select("doc_id").as[Long].collect().toSeq
    assert(ids.nonEmpty, "fixture must put at least one doc on the list")
    val (posts, sizes) = DedupQueries.corpusIndex(spark, sf)
    val docHashes = DedupQueries.corpusDocHashes(spark, sf)
    val (fp, fsz, fdh) = DedupQueries.indexForget(ids, posts, sizes, docHashes)
    val (rp, rsz, rh) = DedupQueries.indexOf(
      corpus.filter(!col("doc_id").isin(ids: _*)))
    def postSet(df: org.apache.spark.sql.DataFrame) =
      df.select(col("h"), array_join(transform(sort_array(col("docs")),
        x => x.cast("string")), ",").as("d")).as[(Long, String)].collect().toSet
    assert(postSet(fp) == postSet(rp), "posting lists diverge from rebuild")
    assert(fsz.as[(Long, Long)].collect().toSet
      == rsz.as[(Long, Long)].collect().toSet, "size table diverges from rebuild")
    assert(fdh.select("content_hash").distinct().as[String].collect().toSet
      == rh.as[String].collect().toSet, "hash set diverges from rebuild")
    assert(postSet(fp) != postSet(posts), "forget must actually remove members")
    // deletion completeness: no forgotten id survives in any posting list
    val lingering = fp.select(explode(col("docs")).as("doc_id"))
      .filter(col("doc_id").isin(ids: _*)).count()
    assert(lingering == 0L, s"$lingering forgotten ids linger in the index")
  }

  test("forget flips a batch doc's verdict: near-dup of a forgotten doc is now kept") {
    import graft.ext.dedup.DedupQueries
    val dir = incFixtureDir
    val inc = DedupQueries.IncomingSource
    val docs = Tables.documents(spark, dir)
    val corpus = docs.filter(col("source") =!= inc)
    val batch = docs.filter(col("doc_id").isin(101L, 104L))
    val (p0, s0, h0) = DedupQueries.indexOf(corpus)
    val before = CurateQueries.curateScreen(batch, p0, s0, h0)
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(before(101L) == "exact_dup_corpus" && before(104L) == "near_dup_corpus")
    // forget docs 1 (exact source of 101) and 2 (near source of 104);
    // the doc-grain hash table is what deletion needs (shared hashes)
    val docHashes = corpus.select(col("doc_id"),
      md5(graft.ext.text.TextNorm.norm(col("text"))).as("content_hash"))
    val (p1, s1, dh1) = DedupQueries.indexForget(Seq(1L, 2L), p0, s0, docHashes)
    val after = CurateQueries.curateScreen(batch, p1, s1,
        dh1.select("content_hash").distinct())
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(after(101L) == "kept" && after(104L) == "kept",
      s"forgetting the dup sources must clear both verdicts: $after")
  }

  test("pack_length_batches: batches tile the corpus; sorted beats hashed on padding") {
    val b = CurateQueries.qPackLengthBatches(spark, sf).collect()
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(b.map(_.getLong(1)).sum == nDocs, "batches must tile every doc")
    b.foreach { r =>
      assert(r.getLong(1) <= CurateQueries.BatchDocs)
      assert(r.getLong(4) >= 0L, "padding cannot be negative")
      assert(r.getLong(4) == r.getLong(1) * r.getLong(2) - r.getLong(3))
    }
    val card = CurateQueries.qPackBatchEval(spark, sf)
      .select($"strategy", $"pad_milli").as[(String, Long)].collect().toMap
    assert(card("length_sorted") < card("hashed"),
      s"sorting must beat random batching: $card")
  }
}
