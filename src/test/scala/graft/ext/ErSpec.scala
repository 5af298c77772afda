package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.er.ErQueries
import graft.ext.pipeline.CurateQueries
import graft.ext.dedup.DedupQueries
import graft.sources.Tables

/** Entity-resolution family (er_fuzzy / er_canonical) and the
  * duplication-aware sampling weights (mix_dupweight) built on the
  * cluster kernel. */
class ErSpec extends SparkSpec {

  /** Driver-side reference edit distance — classic DP, independent of both
    * engines' implementations. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Driver-side reference of the compound blocking predicate's LOGICAL
    * form (the band term is redundant under the distance cut). */
  private def coBlocked(a: String, b: String): Boolean =
    a.take(ErQueries.ErKeyChars) == b.take(ErQueries.ErKeyChars) ||
      a.takeRight(ErQueries.ErKeyChars) == b.takeRight(ErQueries.ErKeyChars)

  /** Driver-side reference of the PHYSICAL compound keys (including the
    * dual length-band emission) — what the candidate mass depends on. */
  private def physKeys(n: String): Set[String] = {
    val (w, k, c) = (ErQueries.ErBandWidth, ErQueries.ErMaxDist, ErQueries.ErKeyChars)
    val bands = Set(n.length / w, (n.length + k) / w)
    bands.flatMap(b => Set(s"p|${n.take(c)}|$b", s"s|${n.takeRight(c)}|$b"))
  }

  private def vocab: Array[String] = Tables.part(spark, sf).select("p_name").distinct()
    .collect().map(_.getString(0)).sorted

  /** Driver-side union-find: canonical map = component lexicographic min
    * over the reference match graph. */
  private def refCanonical(names: Array[String]): Map[String, String] = {
    val parent = scala.collection.mutable.Map(names.map(n => n -> n): _*)
    def find(x: String): String =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (a <- names; b <- names if a < b && coBlocked(a, b) && lev(a, b) <= ErQueries.ErMaxDist) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val lo = if (ra < rb) ra else rb; parent(ra) = lo; parent(rb) = lo }
    }
    names.map(n => n -> find(n)).toMap
  }

  test("er_fuzzy: blocked pairs, engine distances equal reference DP, equi-join plan") {
    val out = ErQueries.qErFuzzy(spark, sf)
    val plan = out.queryExecution.executedPlan.toString
    // the blocking key makes candidate generation an EQUI join — a
    // nested-loop/cartesian here would be the all-pairs anti-pattern
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)

    val rows = out.collect()
    assert(rows.nonEmpty, "fixture vocabulary has fuzzy matches")
    rows.foreach { r =>
      val (a, b) = (r.getAs[String]("name_a"), r.getAs[String]("name_b"))
      assert(a < b, s"canonical ordering violated: $a / $b")
      assert(coBlocked(a, b), s"pair escaped its blocks: $a / $b")
      assert(r.getAs[Long]("dist") == lev(a, b).toLong,
        s"engine distance != reference DP for ($a, $b)")
      assert(r.getAs[Long]("dist") <= ErQueries.ErMaxDist)
    }
    // completeness within blocks: every distinct-name pair under the
    // distance cut (reference DP, driver-side over the small vocabulary)
    // must be reported, each exactly once (the multi-key union dedupes)
    val v = vocab
    val expected = (for {
      a <- v; b <- v
      if a < b && coBlocked(a, b) && lev(a, b) <= ErQueries.ErMaxDist
    } yield (a, b)).toSet
    val got = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expected, s"missing=${expected -- got} extra=${got -- expected}")
    assert(rows.length == got.size, "a multi-block pair was emitted more than once")
    // the compound key's reason to exist: at least one reported match
    // differs in its first character (unrecallable under the retired
    // first-char key)
    assert(rows.exists(r => r.getString(0)(0) != r.getString(1)(0)),
      "fixture should exercise cross-first-char recall")
  }

  test("er_canonical: matches driver-side union-find closure, idempotent, total") {
    val out = ErQueries.qErCanonical(spark, sf).cache()
    val v = vocab
    assert(out.count() == v.length, "one row per distinct surface form")

    val m = out.collect().map(r =>
      r.getAs[String]("p_name") -> r.getAs[String]("canonical_name")).toMap
    // component min: canonical is never lexicographically above the member
    m.foreach { case (n, c) => assert(c <= n, s"$n -> $c") }
    // idempotent: the canonical of a canonical is itself
    m.values.foreach(c => assert(m(c) == c, s"non-fixpoint canonical $c"))
    // exact agreement with an independent driver-side union-find over the
    // reference match graph — transitive closure included (a↔b, b↔c merge
    // even when lev(a, c) > the cut)
    val ref = refCanonical(v)
    assert(m == ref,
      s"diff=${m.toSet.diff(ref.toSet).take(5)} / ${ref.toSet.diff(m.toSet).take(5)}")
    // the closure genuinely merges: some component spans > 2 members
    val sizes = ref.values.groupBy(identity).map(_._2.size)
    assert(sizes.exists(_ > 2), "fixture should force a transitive merge")
    out.unpersist()
  }

  test("er_resolve: canonical rollup conserves rows and cents, variants count the merge") {
    val out = ErQueries.qErResolve(spark, sf).cache()
    val parts = Tables.part(spark, sf)
      .select(col("p_name"), graft.functions.Exact.cents(col("p_retailprice")).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // conservation: the rollup re-partitions the fact table, losing nothing
    val agg = out.agg(sum("n_parts"), sum("n_variants"), sum("retail_cents")).head()
    assert(agg.getLong(0) == parts.length, "every part row lands in exactly one canonical group")
    assert(agg.getLong(1) == parts.map(_._1).distinct.length, "every surface form counted once")
    assert(agg.getLong(2) == parts.map(_._2).sum, "cents conserved across the merge")
    // every output key is a canonical fixpoint, and merged groups really merged
    val canon = ErQueries.qErCanonical(spark, sf).collect()
      .map(r => r.getAs[String]("p_name") -> r.getAs[String]("canonical_name")).toMap
    out.collect().foreach { r =>
      val c = r.getAs[String]("canonical_name")
      assert(canon(c) == c, s"group key $c is not canonical")
      val expectVariants = canon.count { case (_, cc) => cc == c }
      assert(r.getAs[Long]("n_variants") == expectVariants.toLong, s"variant count wrong for $c")
    }
    assert(out.filter(col("n_variants") > 1).count() > 0, "fixture merges at least one group")
    out.unpersist()
  }

  test("er_incremental: every incoming name resolves; best match minimal; misses are new entities") {
    val out = ErQueries.qErIncremental(spark, sf).cache()
    // reproduce the engine's hash split driver-side (same md5Long seed)
    val names = Tables.part(spark, sf).select("p_name").distinct()
      .withColumn("bucket", pmod(graft.functions.Exact.md5Long(
        concat(lit("erb|"), col("p_name"))), lit(100)))
    val base = names.filter(col("bucket") < ErQueries.ErBasePct)
      .select("p_name").collect().map(_.getString(0)).sorted
    val inc = names.filter(col("bucket") >= ErQueries.ErBasePct)
      .select("p_name").collect().map(_.getString(0)).toSet
    assert(base.nonEmpty && inc.nonEmpty, "hash split must produce both sides")
    val rows = out.collect()
    assert(rows.map(_.getAs[String]("p_name")).toSet == inc, "one row per incoming name")
    rows.foreach { r =>
      val n = r.getAs[String]("p_name")
      val cands = base.filter(b => coBlocked(n, b) && lev(n, b) <= ErQueries.ErMaxDist)
      Option(r.getAs[String]("matched_name")) match {
        case Some(m) =>
          assert(cands.nonEmpty && r.getAs[Long]("dist") == lev(n, m).toLong)
          // best = (min dist, then lexicographic) over the blocked candidates
          val want = cands.minBy(b => (lev(n, b), b))
          assert(m == want, s"$n matched $m, expected $want")
        case None =>
          assert(cands.isEmpty, s"$n left unmatched despite candidates $cands")
          assert(r.getAs[String]("canonical_name") == n, "a miss is its own new entity")
      }
    }
    assert(rows.exists(_.getAs[String]("matched_name") != null),
      "fixture incoming batch matches at least one base name")
    out.unpersist()
  }

  test("er_blocking_eval: counts equal driver-side arithmetic over truth, blocked and candidate pairs") {
    val row = ErQueries.qErBlockingEval(spark, sf).collect().head
    val v = vocab
    val truth = (for {
      a <- v; b <- v
      if a < b && lev(a, b) <= ErQueries.ErMaxDist
    } yield (a, b)).toSet
    val blocked = truth.filter { case (a, b) => coBlocked(a, b) }
    assert(row.getAs[Long]("n_true_pairs") == truth.size.toLong)
    assert(row.getAs[Long]("n_blocked_pairs") == blocked.size.toLong)
    // blocked ⊆ truth by construction, so hits = blocked and precision is
    // exactly 1000‰ — the informative number is recall
    assert(row.getAs[Long]("n_hits") == blocked.size.toLong)
    assert(row.getAs[Long]("precision_milli") == 1000L)
    assert(row.getAs[Long]("recall_milli") ==
      1000L * blocked.size / math.max(truth.size, 1))
    // candidate mass = distinct pairs sharing a PHYSICAL key (band
    // emission included), totalled and per key family
    val keyedV = v.map(n => n -> physKeys(n)).toMap
    def mass(fam: String): Set[(String, String)] = (for {
      a <- v; b <- v
      if a < b && keyedV(a).exists(k => k.startsWith(fam) && keyedV(b).contains(k))
    } yield (a, b)).toSet
    val (candP, candS) = (mass("p|"), mass("s|"))
    assert(row.getAs[Long]("n_cand_pairs") == (candP ++ candS).size.toLong)
    assert(row.getAs[Long]("n_cand_prefix") == candP.size.toLong)
    assert(row.getAs[Long]("n_cand_suffix") == candS.size.toLong)
    // comparators: the retired first-char key's mass and the unblocked
    // quadratic — the cost axis of the recall/cost trade
    val firstCharMass = v.groupBy(_.head).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    assert(row.getAs[Long]("n_cand_firstchar") == firstCharMass)
    assert(row.getAs[Long]("n_all_pairs") == v.length.toLong * (v.length - 1) / 2)
    // the kernel's contract on this corpus: full recall (the retired key
    // measured 166‰), bought with candidate mass far under all-pairs
    assert(row.getAs[Long]("recall_milli") == 1000L)
    assert(row.getAs[Long]("n_cand_pairs") < row.getAs[Long]("n_all_pairs") / 2)
  }

  test("er_fuzzy_capped: cap inactive on the corpus (capped ≡ uncapped), binding on a hot block") {
    // corpus cross-check: every block is far under ErMaxBlock, so the
    // capped kernel must reproduce er_fuzzy exactly
    val capped = ErQueries.qErFuzzyCapped(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val plain = ErQueries.qErFuzzy(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(capped == plain, "cap must be a no-op on this corpus")

    // hot-block fixture: 400 names 'zz<3 digits>' share prefix2 'zz' and
    // one length band — a block of 400 > ErMaxBlock that the cap must
    // drop whole; the last-2-DIGIT suffix blocks hold 4 names each and
    // keep recalling the pairs that share them
    import spark.implicits._
    val hot = (0 until 400).map(i => (f"zz$i%03d", 1L)).toDF("p_name", "n_parts")

    // driver-side reference with the PHYSICAL keys: block census → drop
    // oversized → candidates → distance gate
    val names = hot.collect().map(_.getString(0))
    val blocks = scala.collection.mutable.Map.empty[String, List[String]]
    names.foreach(n => physKeys(n).foreach(k => blocks(k) = n :: blocks.getOrElse(k, Nil)))
    val expected = (for {
      (_, mem) <- blocks.toSeq if mem.size <= ErQueries.ErMaxBlock
      a <- mem; b <- mem if a < b && lev(a, b) <= ErQueries.ErMaxDist
    } yield (a, b)).toSet
    val uncappedRef = (for {
      a <- names; b <- names
      if a < b && coBlocked(a, b) && lev(a, b) <= ErQueries.ErMaxDist
    } yield (a, b)).toSet

    val got = ErQueries.fuzzyCappedFrom(hot).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == expected, s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // the cap binds (prefix-block matches are gone) but the redundant
    // suffix family still recalls its share — dropped-whole, not dead
    assert(got.nonEmpty, "suffix blocks must survive the cap")
    assert(got.size < uncappedRef.size, "the oversized prefix block must be dropped")
    // the linear mass bound: candidates from surviving blocks only,
    // each ≤ cap members → Σ|b|² ≤ cap · Σ|b| ≤ cap · 4·vocab
    val survivors = blocks.values.filter(_.size <= ErQueries.ErMaxBlock)
    val candMass = survivors.map(m => m.size.toLong * (m.size - 1) / 2).sum
    assert(candMass <= ErQueries.ErMaxBlock.toLong * 4 * names.length,
      "capped candidate mass must stay under the linear bound")
  }

  test("mix_dupweight: total over corpus, cluster-consistent, mass of a cluster ~ one doc") {
    val out = CurateQueries.qDupWeights(spark, sf).cache()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.count() == nDocs, "one weight per document")

    // docs outside any near-dup cluster keep full weight
    val single = out.filter(col("n_dups") === 1)
    assert(single.filter(col("weight_milli") =!= 1000).count() == 0)
    // clustered docs agree with the cluster kernel's membership
    val clustered = DedupQueries.qDedupClusters(spark, sf)
      .groupBy("cluster_id").agg(count(lit(1)).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clustered.nonEmpty, "fixture has near-dup clusters")
    out.filter(col("n_dups") > 1).collect().foreach { r =>
      assert(clustered(r.getAs[Long]("cluster_id")) == r.getAs[Long]("n_dups"))
      assert(r.getAs[Long]("weight_milli") == 1000L / r.getAs[Long]("n_dups"))
    }
    // soft-dedup contract: every cluster's total sampling mass collapses
    // to at most one doc's worth (floor never exceeds the exact ratio)
    val mass = out.groupBy("cluster_id").agg(sum("weight_milli").as("w"))
    assert(mass.filter(col("w") > 1000).count() == 0)
    out.unpersist()
  }
}
