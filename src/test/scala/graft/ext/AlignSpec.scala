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
