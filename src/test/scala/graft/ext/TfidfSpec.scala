package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.text.TextQueries
import graft.sources.Tables

/** Invariants of the rational tf-idf keyword extractor. */
class TfidfSpec extends SparkSpec {

  test("text_tfidf: per-doc top-K, exact score identity, rank ordering") {
    val out = TextQueries.qTfidf(spark, sf).cache()
    val n = Tables.documents(spark, sf).count()

    // ≤ K rows per doc, ranks contiguous from 1
    val byDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("k"), max("rank").as("mr"), min("rank").as("lo"))
    assert(byDoc.filter(col("k") > TextQueries.TfidfK || col("k") =!= col("mr") ||
      col("lo") =!= 1).count() == 0)

    // score is exactly the floored rational — no hidden float path
    val badScore = out.filter(
      col("score_micro") =!= expr(s"(tf * ${TextQueries.TfidfScale} * $n) DIV df"))
    assert(badScore.count() == 0)

    // within a doc, rank order follows (score desc, token asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("rank")
    val disorder = out
      .withColumn("next_score", lead(col("score_micro"), 1).over(w))
      .withColumn("next_token", lead(col("token"), 1).over(w))
      .filter(col("next_score").isNotNull &&
        (col("next_score") > col("score_micro") ||
          (col("next_score") === col("score_micro") && col("next_token") < col("token"))))
    assert(disorder.count() == 0)

    // rare tokens outscore ubiquitous ones at equal tf: every selected
    // keyword's df is below the corpus size (a token in EVERY doc scores
    // tf·SCALE exactly and should lose to any rarer token)
    assert(out.filter(col("df") === n && col("rank") === 1).count() <
      out.filter(col("rank") === 1).count())
    out.unpersist()
  }

  test("text_bm25: exactly K ranked hits, every hit contains a query term") {
    import spark.implicits._
    val out = TextQueries.qBm25(spark, sf).cache()
    val rows = out.orderBy("rank").collect()
    assert(rows.length == TextQueries.Bm25K)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to TextQueries.Bm25K).toSeq)
    // ordering: score desc, doc_id asc on ties — and scores are positive
    rows.sliding(2).foreach { case Array(a, b) =>
      val (sa, sb) = (a.getAs[Long]("bm25_milli"), b.getAs[Long]("bm25_milli"))
      assert(sa > sb || (sa == sb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
    }
    assert(rows.forall(_.getAs[Long]("bm25_milli") > 0))
    assert(rows.forall { r =>
      val nt = r.getAs[Long]("n_terms"); nt >= 1 && nt <= TextQueries.Bm25Terms.size
    })
    // every hit really contains at least one query term
    val hitIds = rows.map(_.getAs[Long]("doc_id")).toSet
    val withTerm = Tables.documents(spark, sf)
      .select($"doc_id", graft.ext.text.TextNorm.toks($"text").as("t"))
      .filter(TextQueries.Bm25Terms.map(t => array_contains($"t", t)).reduce(_ || _))
      .select("doc_id").as[Long].collect().toSet
    assert(hitIds.subsetOf(withTerm))
    out.unpersist()
  }
}
