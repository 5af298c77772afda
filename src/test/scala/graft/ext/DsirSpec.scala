package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.text.{DsirQueries, TextNorm}

/** DSIR importance selection: grain, selection determinism, and the
  * property that gives the method its name — the selected corpus's
  * composition moves toward the target distribution. */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  test("weight frame grain = docs with at least one bigram") {
    val expected = graft.sources.Tables.documents(spark, sf)
      .filter(size(TextNorm.toks(col("text"))) >= 2).count()
    val w = DsirQueries.qDsirWeights(spark, sf)
    assert(w.count() == expected)
    assert(w.select($"doc_id").distinct().count() == expected)
  }

  test("selection is the top-K of the weight frame, ranks contiguous") {
    val sel = DsirQueries.qDsirSelect(spark, sf).collect()
    val k = math.min(DsirQueries.DsirK,
      DsirQueries.qDsirWeights(spark, sf).count().toInt)
    assert(sel.length == k)
    assert(sel.map(_.getLong(0)).sorted.toSeq == (1L to k).toSeq)
    // every selected weight ≥ every unselected weight
    val minSel = sel.map(r => r.getLong(4)).min
    val maxUnsel = DsirQueries.qDsirWeights(spark, sf)
      .join(DsirQueries.qDsirSelect(spark, sf).select($"doc_id"),
        Seq("doc_id"), "left_anti")
      .agg(max($"w_units")).head()
    if (!maxUnsel.isNullAt(0))
      assert(minSel >= maxUnsel.getLong(0))
  }

  test("selected composition moves toward the target language") {
    val evalRows = DsirQueries.qDsirEval(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val en = evalRows.find(_._1 == DsirQueries.TargetLang).get
    // target share strictly rises; it need not hit 1000 (quantized
    // weights tie), but must dominate its raw share
    assert(en._5 > en._3, s"en raw=${en._3} sel=${en._5}")
    assert(evalRows.map(_._4).sum == math.min(DsirQueries.DsirK,
      DsirQueries.qDsirWeights(spark, sf).count()))
  }
}
