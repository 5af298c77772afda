package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.SparkShims

/** Column-API surface for the native vector expressions. */
object VectorFunctions {

  /** Exact integer dot product via the codegen'd [[ArrayDotLong]] — the
    * hot kernel of every vector-similarity operator. */
  def arrayDotLong(a: Column, b: Column): Column =
    SparkShims.column(ArrayDotLong(SparkShims.expression(a), SparkShims.expression(b)))
}
