package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.sim.AlignQueries

/** Bitext mining: anchor grain/ordering invariants, the under-approximation
  * relation between the LSH tier and the all-pairs anchor, and the eval
  * card against driver-side set arithmetic. */
class AlignSpec extends SparkSpec {

  import spark.implicits._

  test("anchor: one row per non-target doc, targets in-language, margins >= 0") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val nonEn = docs.filter(_._2 != AlignQueries.TargetLang).map(_._1).toSet
    val en = docs.filter(_._2 == AlignQueries.TargetLang).map(_._1).toSet
    val a = AlignQueries.qAlignBitext(spark, sf).collect()
    assert(a.map(_.getLong(0)).toSet == nonEn)
    assert(a.length == nonEn.size)
    a.foreach { r =>
      assert(en.contains(r.getLong(2)), s"target ${r.getLong(2)} not in-language")
      if (!r.isNullAt(4))
        assert(r.getDouble(4) >= 0.0, "best-minus-second margin went negative")
    }
  }

  test("LSH tier never beats the anchor's best cosine (pure under-approximation)") {
    val a = AlignQueries.qAlignBitext(spark, sf)
      .select($"src_id", $"cos_best".as("cb_a"))
    val l = AlignQueries.qAlignBitextLsh(spark, sf)
      .select($"src_id", $"cos_best".as("cb_l"))
    val bad = a.join(l, "src_id").filter($"cb_l" > $"cb_a")
    assert(bad.isEmpty, "candidate-restricted best exceeded the all-pairs best")
  }

  test("emb_power_iter: alignment with the Gram matrix improves across rounds") {
    import graft.ext.sim.SimQueries
    val t = SimQueries.qEmbPowerIter(spark, sf)
      .orderBy($"i").collect()
    assert(t.length == SimQueries.Dim)
    val vecs = graft.sources.Tables.load(spark, sf, "embeddings")
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.floor(x.toDouble * 1e6 + 0.5)).toArray)
    def rayleigh(v: Array[Double]): Double = {
      val num = vecs.map(x => { val d = x.zip(v).map(p => p._1 * p._2).sum; d * d }).sum
      num / v.map(x => x * x).sum
    }
    val v1 = t.map(_.getLong(1).toDouble)
    val v3 = t.map(_.getLong(3).toDouble)
    assert(rayleigh(v3) >= rayleigh(v1) * 0.999,
      s"power iteration went backwards: ${rayleigh(v1)} -> ${rayleigh(v3)}")
    // the direction is normalized to the vscale bound each round
    assert(t.map(r => math.abs(r.getLong(3))).max == SimQueries.PowerVScale)
  }

  test("corpus_diff: classes partition the id space; replay matches") {
    import graft.ext.pipeline.CurateQueries
    val d = CurateQueries.qCorpusDiff(spark, sf)
      .select($"status", $"n_docs").as[(String, Long)].collect().toMap
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect()
    val inc = docs.filter(_._2 == graft.ext.dedup.DedupQueries.IncomingSource)
    val base = docs.filter(_._2 != graft.ext.dedup.DedupQueries.IncomingSource)
    val removed = base.count(_._1 % CurateQueries.DiffDeletePeriod == 0)
    val changed = base.count(t => t._1 % CurateQueries.DiffDeletePeriod != 0 &&
      t._1 % CurateQueries.DiffEditPeriod == 0)
    assert(d.getOrElse("added", 0L) == inc.length)
    assert(d.getOrElse("removed", 0L) == removed)
    assert(d.getOrElse("changed", 0L) == changed)
    assert(d.values.sum == base.length + inc.length)
  }

  test("dedup_kminhash: every exact-dup pair surfaces at est=1000; bounds hold") {
    import graft.ext.dedup.KMinHashQueries
    val got = KMinHashQueries.qKminhash(spark, sf)
      .select($"doc_a", $"doc_b", $"est_milli").as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, e) =>
      assert(a < b); assert(e >= KMinHashQueries.KeepMilli && e <= 1000)
    }
    // exact text duplicates share every shingle ⇒ identical sketches ⇒
    // est exactly 1000 — none may be missed
    val dupGroups = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", md5(coalesce($"text", lit(""))).as("h"))
      .as[(Long, String)].collect().groupBy(_._2).values
      .filter(_.length >= 2).map(_.map(_._1).sorted)
    val pairs = got.map(t => (t._1, t._2)).toSet
    val perfect = got.filter(_._3 == 1000L).map(t => (t._1, t._2)).toSet
    for (g <- dupGroups; i <- g.indices; j <- i + 1 until g.length) {
      assert(perfect.contains((g(i), g(j))),
        s"exact-dup pair (${g(i)}, ${g(j)}) missing or est<1000; have ${pairs.size} pairs")
    }
  }

  test("dedup_kminhash df cap: hot-member-only overlap is dropped, normal dups survive") {
    import graft.ext.dedup.{DedupQueries, KMinHashQueries}
    // the generated corpus has no sketch member above MaxWindowDf, so the
    // capped code path is green-by-vacuity there — this fixture makes the
    // cap BIND. Hot members h1-h3 appear in 60 docs (> cap 50); docs 10
    // and 11 overlap ONLY through them with raw est = 3/5 = 600‰ ≥ keep
    // (driver-side arithmetic below), so WITHOUT the cap the pair would
    // surface; WITH it, the hot posting lists are dropped and the pair
    // must not. Docs 1 and 2 share three df=2 members — a normal exact
    // dup that must still surface at est = 1000.
    val cap = DedupQueries.MaxWindowDf
    assert(cap == 50)
    val h = Seq(11L, 12L, 13L)
    val hotDocs = (10L until 70L).map { i =>
      val filler = 1000L + i
      (i, (h :+ filler).sorted.toArray)
    }
    val dupDocs = Seq((1L, Array(501L, 502L, 503L)), (2L, Array(501L, 502L, 503L)))
    // raw (uncapped) estimate of the hot pair (10, 11): union re-cut
    // {11,12,13,1010,1011} → n_common 3, n_s 5 → 600‰ ≥ KeepMilli — the
    // estimator alone would NOT have dropped it
    assert(1000L * 3 / 5 >= KMinHashQueries.KeepMilli)
    val sk = (dupDocs ++ hotDocs).toDF("doc_id", "sk")
    val got = KMinHashQueries.kminhashFrom(sk)
      .select($"doc_a", $"doc_b", $"est_milli").as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 1000L)),
      s"expected exactly the normal dup pair; got ${got.mkString(", ")}")
  }

  test("align_eval counts equal driver-side set arithmetic over both frames") {
    val a = AlignQueries.qAlignBitext(spark, sf)
      .select($"src_id", $"tgt_id", $"accepted")
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val l = AlignQueries.qAlignBitextLsh(spark, sf)
      .select($"src_id", $"tgt_id", $"accepted")
      .as[(Long, Long, Boolean)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    val e = AlignQueries.qAlignEval(spark, sf).head()
    assert(e.getLong(0) == a.size)
    assert(e.getLong(1) == a.keys.count(l.contains))
    assert(e.getLong(2) == a.count { case (s, (t, _)) => l.get(s).exists(_._1 == t) })
    assert(e.getLong(3) == a.values.count(_._2))
    assert(e.getLong(4) == a.count { case (s, (_, acc)) =>
      acc && l.get(s).exists(_._2) })
  }
}
