package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.SparkShims

/** Column-API surface for the native vector expressions. */
object VectorFunctions {

  /** Exact integer dot product via the codegen'd [[ArrayDotLong]] — the
    * hot kernel of every vector-similarity operator. */
  def arrayDotLong(a: Column, b: Column): Column =
    SparkShims.column(ArrayDotLong(SparkShims.expression(a), SparkShims.expression(b)))

  /** Bounded bottom-k distinct (key, value) pairs per group via the native
    * [[BottomKPairs]] aggregate — O(k) state through partial aggregation,
    * vs the window idiom's full per-group sort. */
  def bottomKPairs(key: Column, value: Column, k: Int): Column =
    SparkShims.column(
      BottomKPairs(SparkShims.expression(key), SparkShims.expression(value),
        org.apache.spark.sql.catalyst.expressions.Literal(k))
        .toAggregateExpression())
}
