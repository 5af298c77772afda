package graft.ext.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Shared text normalization / tokenization / shingling, with the DuckDB SQL
 * twin of each expression — every dedup and text operator derives from these
 * so the whole suite agrees on one token definition.
 *
 * All pure narrow expressions: codegen'd, shuffle-free, scale-linear.
 */
object TextNorm {

  /** lower → non-alphanumeric→space → squeeze → trim. */
  def norm(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(coalesce(c, lit(""))), "[^a-z0-9 ]", " "), " +", " "))

  /** Non-empty normalized word tokens. Splits on the `' +'` regex directly
    * instead of reusing [[norm]] — skipping the squeeze pass saves one full
    * regexp_replace over every document (measured ~40% of normalization
    * cost); the token list is identical. */
  def toks(c: Column): Column =
    filter(
      split(regexp_replace(lower(coalesce(c, lit(""))), "[^a-z0-9 ]", " "), " +"),
      x => x =!= "")

  /** Distinct 3-word shingles; documents shorter than 3 tokens contribute
    * their whole text as a single shingle so every doc has ≥1.
    *
    * REFERENCE SEMANTICS ONLY — higher-order `transform` lambdas run
    * interpreted (~6 ms/doc); every hot path uses the codegen-equivalent
    * [[graft.ext.dedup.DedupQueries.shingleRows]] instead (equivalence
    * pinned by a spec). */
  def shingles(t: Column): Column =
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(0), size(t) - 3),
        i => concat_ws(" ",
          element_at(t, i + 1), element_at(t, i + 2), element_at(t, i + 3)))))
      .otherwise(array(array_join(t, " ")))

  // ----------------------------------------------------------- SQL twins

  val normSql: String =
    "trim(regexp_replace(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  val toksSql: String =
    "list_filter(string_split_regex(regexp_replace(lower(coalesce(text,'')), '[^a-z0-9 ]', ' ', 'g'), ' +'), x -> x <> '')"

  /** The trigram comprehension both DuckDB shingle variants share — ONE
    * definition, so a tokenizer/width change cannot desynchronize them. */
  private def trigramsSql(t: String): String =
    s"[array_to_string($t[i:i+2], ' ') for i in generate_series(1, len($t)-2)]"

  /** DuckDB shingles over a token-list column named `t`. */
  def shinglesSql(t: String): String =
    s"""CASE WHEN len($t) >= 3
       | THEN list_distinct(${trigramsSql(t)})
       | ELSE [array_to_string($t, ' ')] END""".stripMargin.replace("\n", "")

  /** Multiset (non-distinct) twin of [[shinglesSql]] — for operators that
    * COUNT repeated shingles (text_repetition's denominator). */
  def shinglesMultisetSql(t: String): String =
    s"""CASE WHEN len($t) >= 3
       | THEN ${trigramsSql(t)}
       | ELSE [array_to_string($t, ' ')] END""".stripMargin.replace("\n", "")
}
