package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.text.TextNorm

/** The codegen fast-path shingle pipeline must stay equivalent to the
  * declarative HOF reference formulation (and both to the DuckDB oracle's
  * list comprehension). */
class TextNormSpec extends SparkSpec {
  import spark.implicits._

  test("shingleRows (slice+arrays_zip) ≡ TextNorm.shingles (HOF) on the corpus") {
    val fast = graft.ext.dedup.DedupQueries.shingleRows(spark, sf)
      .select("doc_id", "s").as[(Long, String)].collect().toSet
    // non-deduped rows must be the same SET (duplicates allowed) — the
    // duplicate-insensitive consumers (minhash) rely on this
    val multi = graft.ext.dedup.DedupQueries.shingleRows(spark, sf, dedup = false)
      .select("doc_id", "s").as[(Long, String)].collect().toSet
    assert(multi == fast)
    val ref = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), explode(TextNorm.shingles(TextNorm.toks(col("text")))).as("s"))
      .as[(Long, String)].collect().toSet
    assert(fast == ref,
      s"fast-only: ${(fast -- ref).take(3)}; ref-only: ${(ref -- fast).take(3)}")
  }

  test("tokenization handles edge inputs identically to its contract") {
    val df = Seq("", "   ", "a", "Hello, World! 123", "a  b\tc\nd", "ONE two THREE four")
      .toDF("text")
    val toks = df.select(TextNorm.toks(col("text")).as("t")).as[Seq[String]].collect()
    assert(toks(0).isEmpty && toks(1).isEmpty)
    assert(toks(2) == Seq("a"))
    assert(toks(3) == Seq("hello", "world", "123"))
    assert(toks(4) == Seq("a", "b", "c", "d"))     // tabs/newlines normalized
    assert(toks(5) == Seq("one", "two", "three", "four"))
  }
}
