package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge to Spark's `private[sql]` Column ↔ Expression converters
 * (org.apache.spark.sql.classic.ExpressionUtils, Spark 4.x). Extension
 * libraries that ship custom Catalyst expressions conventionally place this
 * one-file shim inside the `org.apache.spark.sql` namespace; everything
 * else in this repo stays under `graft`.
 */
object SparkShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
