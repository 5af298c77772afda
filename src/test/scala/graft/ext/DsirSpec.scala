package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.text.{CmSketchQueries, DsirQueries, TextNorm}

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

  test("incremental screen runs UNCHANGED on a document stream (batch ≡ stream)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val sf01 = "/root/testdata/sf0.01"
    val (model, totals) = DsirQueries.incModel(spark, sf01)
    val expected = DsirQueries.qDsirIncremental(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getBoolean(4))).toSet
    assert(expected.nonEmpty)
    val incoming = graft.sources.Tables.documents(spark, sf01)
      .filter(col("source") === graft.ext.dedup.DedupQueries.IncomingSource)
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect().toSeq
    val (half1, half2) = incoming.splitAt(incoming.length / 2)
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Boolean)]()
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.stream.StreamPipeline.start(
      ms.toDF().toDF("doc_id", "lang", "text"),
      graft.stream.StreamPipeline.ForeachBatch((batch, _) =>
        DsirQueries.screenAgainstModel(batch, model, totals).collect()
          .foreach(r => out.add((r.getLong(0), r.getLong(3), r.getBoolean(4))))))
    ms.addData(half1: _*); q.processAllAvailable()
    ms.addData(half2: _*); q.processAllAvailable()
    q.stop()
    val streamed = out.toArray(Array.empty[(Long, Long, Boolean)]).toSet
    assert(streamed == expected,
      s"stream=${streamed.size} rows, batch=${expected.size} rows")
  }

  test("CM sketch: estimates dominate exact counts; merge is exact") {
    val eval = CmSketchQueries.qCmEval(spark, sf).collect()
    assert(eval.length == CmSketchQueries.EvalTopK)
    eval.foreach { r =>
      assert(r.getLong(3) >= 0L,
        s"CM must never undercount: ${r.getString(0)} ${r.getLong(1)}->${r.getLong(2)}")
    }
    val m = CmSketchQueries.qCmMerge(spark, sf).head()
    assert(m.getLong(1) == 0L, s"per-source merge mismatched ${m.getLong(1)} cells")
    assert(m.getLong(2) == m.getLong(3), "merged L1 mass must equal global")
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
