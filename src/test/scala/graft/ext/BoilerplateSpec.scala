package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.text.TextQueries
import graft.sources.Tables

/** Boilerplate census and per-doc novelty against a driver-side brute
  * force over the same tokenizer/shingle definitions. */
class BoilerplateSpec extends SparkSpec {

  /** The suite's tokenizer, re-implemented independently in plain Scala. */
  private def toksRef(text: String): Seq[String] =
    Option(text).getOrElse("").toLowerCase
      .replaceAll("[^a-z0-9 ]", " ").split(" +").filter(_.nonEmpty).toSeq

  /** Distinct 3-shingles per doc, matching TextNorm.shingles semantics
    * (short docs contribute their whole text as one shingle). */
  private def shinglesRef(text: String): Set[String] = {
    val t = toksRef(text)
    if (t.length >= 3) t.sliding(3).map(_.mkString(" ")).toSet
    else Set(t.mkString(" "))
  }

  test("text_boilerplate equals a driver-side shingle-frequency census") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byShingle = scala.collection.mutable.Map.empty[String, (Long, Set[String])]
    docs.foreach { case (_, src, text) =>
      shinglesRef(text).foreach { s =>
        val (n, srcs) = byShingle.getOrElse(s, (0L, Set.empty[String]))
        byShingle(s) = (n + 1, srcs + src)
      }
    }
    val expected = byShingle.toSeq
      .collect { case (s, (n, srcs)) if n >= TextQueries.BoilerplateMinDocs =>
        (s, n, srcs.size.toLong) }
      .sortBy { case (s, n, _) => (-n, s) }
      .take(TextQueries.BoilerplateK)
    val got = TextQueries.qBoilerplate(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("text_boilerplate plan: top-K via TakeOrdered, no join, no cartesian") {
    val plan = TextQueries.qBoilerplate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K must prune at each partial, not sort globally:\n${plan.take(1500)}")
    assert(!plan.contains("Join"), "census is one aggregate — a join means the shape regressed")
    assert(!plan.contains("CartesianProduct"), plan.take(1500))
  }

  test("text_novelty plan: no shingle-keyed fan-out join (both join inputs per-doc aggregates)") {
    // the numerator rides min(doc_id) on the df aggregate; joining shingle
    // rows against their own frequency would replicate corpus-hot shingles
    // df times — the shape this spec pins out
    val plan = TextQueries.qNovelty(spark, sf)
      .queryExecution.executedPlan.toString
    val joins = "Join".r.findAllIn(plan).size
    assert(joins >= 1, s"expected the per-doc left join:\n${plan.take(1500)}")
    assert(plan.contains("LeftOuter"), plan.take(1500))
    // exactly one join, and it's doc-keyed: both sides are HashAggregates
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(plan).size == 1,
      s"expected exactly one (doc-keyed) join:\n${plan.take(1500)}")
  }

  test("text_novelty: brute-force parity, bounds, and dup-docs-score-zero") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val df = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (_, t) =>
      shinglesRef(t).foreach(s => df(s) = df.getOrElse(s, 0L) + 1L) }
    val expected = docs.map { case (id, t) =>
      val sh = shinglesRef(t)
      val uniq = sh.count(s => df(s) == 1L).toLong
      (id, sh.size.toLong, uniq, 1000L * uniq / sh.size)
    }.sortBy(_._1).toSeq
    val out = TextQueries.qNovelty(spark, sf)
    val got = out.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // exact textual duplicates share every shingle → df ≥ 2 → novelty 0
    val dupIds = docs.groupBy(_._2).values.filter(_.size >= 2).flatMap(_.map(_._1)).toSet
    if (dupIds.nonEmpty) {
      val nz = out.filter(col("doc_id").isin(dupIds.toSeq: _*))
        .filter(col("novelty_milli") =!= 0L).count()
      assert(nz == 0, "an exact-dup doc must have zero corpus-unique shingles")
    }
  }
}
