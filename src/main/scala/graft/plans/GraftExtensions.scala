package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.ArrayDotLong

/**
 * SparkSessionExtensions entry point: registers the engine's native
 * expressions into the SQL function registry, so `spark.sql("SELECT
 * array_dot_long(a, b) …")` works exactly like the Column API
 * ([[graft.functions.VectorFunctions.arrayDotLong]]).
 *
 * Activate with:
 * {{{
 *   SparkSession.builder().withExtensions(new GraftExtensions)
 *   // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
 * }}}
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.arrayDotLongFn)
    ext.injectFunction(GraftExtensions.bottomKPairsFn)
  }
}

object GraftExtensions {

  private[plans] val arrayDotLongFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot_long"),
    new ExpressionInfo(classOf[ArrayDotLong].getName, "array_dot_long"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "array_dot_long(a, b) takes exactly 2 arguments")
      ArrayDotLong(children.head, children(1))
    })

  private[plans] val bottomKPairsFn
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bottom_k_pairs"),
    new ExpressionInfo(classOf[graft.functions.BottomKPairs].getName, "bottom_k_pairs"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        "bottom_k_pairs(key, value, k) takes exactly 3 arguments")
      // return the raw AggregateFunction — ResolveFunctions wraps it in
      // an AggregateExpression (the convention every built-in follows)
      graft.functions.BottomKPairs(children.head, children(1), children(2))
    })

  /** Register into an ALREADY-RUNNING session (the extensions class only
    * applies at build time). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "array_dot_long", arrayDotLongFn._3, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottom_k_pairs", bottomKPairsFn._3, "scala_udf")
  }
}
