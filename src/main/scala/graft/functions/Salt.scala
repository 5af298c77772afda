package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation helpers: two-phase (salted) aggregation.
 *
 * A `groupBy(key).agg(sum)` over a key whose hottest value holds a large
 * fraction of all rows puts that whole fraction on one reducer. Salting
 * splits each key into `salts` sub-keys for a partial aggregate, then
 * re-aggregates the (tiny) partials — the hot key's rows spread over
 * `salts` reducers and the second shuffle carries one row per (key, salt).
 *
 * For algebraic aggregates (sum/count/min/max) the result is EXACTLY the
 * direct aggregation (longs associate), which the spec asserts. AQE's
 * skew-join handling covers joins; this covers aggregation skew, which AQE
 * does not rebalance.
 */
object Salt {

  /** Row-id salt: spreads a hot key's rows regardless of content. Hashing
    * the value would collapse a hot key with a constant value (e.g. 0.0
    * from upstream na.fill) back into one bucket — the exact hotspot this
    * helper exists to eliminate. Sums/counts are invariant to the split. */
  private def saltCol(salts: Int): Column =
    pmod(monotonically_increasing_id(), lit(salts.toLong))

  /** Salted equivalent of `df.groupBy(key).agg(sum(value).as(alias))`. */
  def saltedSum(df: DataFrame, key: Column, value: Column, alias: String,
                salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(salts))
      .groupBy(key, col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(key)
      .agg(sum(col("__partial")).as(alias))

  /** Salted count per key. */
  def saltedCount(df: DataFrame, key: Column, alias: String,
                  salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(salts))
      .groupBy(key, col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(key)
      .agg(sum(col("__partial")).as(alias))

  /** Salted sum AND count per key in ONE two-phase pass — what a real
    * skewed rollup wants (separate salted calls would each re-scan the
    * fact table). */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
                     sumAlias: String, countAlias: String,
                     salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(salts))
      .groupBy(key, col("__salt"))
      .agg(sum(value).as("__ps"), count(lit(1)).as("__pc"))
      .groupBy(key)
      .agg(sum(col("__ps")).as(sumAlias), sum(col("__pc")).as(countAlias))
}
