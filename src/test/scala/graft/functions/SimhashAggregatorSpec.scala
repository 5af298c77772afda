package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The typed-Aggregator SimHash must agree exactly with the static-column
  * formulation in DedupQueries (both feed the same DuckDB oracle). */
class SimhashAggregatorSpec extends SparkSpec {
  import spark.implicits._

  test("UDAF simhash ≡ static-column simhash on the documents corpus") {
    val viaColumns = graft.ext.dedup.DedupQueries.qSimhash(spark, sf)
    val simhashUdaf = udaf(SimhashAggregator)
    val tokCounts = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(graft.ext.text.TextNorm.toks(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("h", Exact.md5Long48(col("tok")))
    val viaUdaf = tokCounts.groupBy(col("doc_id"))
      .agg(simhashUdaf(col("h"), col("cnt")).as("simhash"))
    val diff = viaColumns.as("a").join(viaUdaf.as("b"), Seq("doc_id"))
      .filter(col("a.simhash") =!= col("b.simhash"))
    assert(diff.isEmpty, diff.collect().take(3).mkString(","))
  }

  test("aggregator merge is order-independent (partial-agg contract)") {
    val rows = Seq((5L, 2L), (7L, 1L), (1L << 40 | 3L, 4L), (0L, 10L))
    val full = rows.foldLeft(SimhashAggregator.zero)(SimhashAggregator.reduce)
    val (l, r) = rows.splitAt(2)
    val merged = SimhashAggregator.merge(
      l.foldLeft(SimhashAggregator.zero)(SimhashAggregator.reduce),
      r.foldLeft(SimhashAggregator.zero)(SimhashAggregator.reduce))
    assert(SimhashAggregator.finish(full) == SimhashAggregator.finish(merged))
  }
}
