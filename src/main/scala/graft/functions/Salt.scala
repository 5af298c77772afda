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

  /** Deterministic salt from row content (any column works — it only
    * spreads rows; the final aggregate is salt-invariant). */
  private def saltCol(on: Column, salts: Int): Column =
    pmod(hash(on), lit(salts))

  /** Salted equivalent of `df.groupBy(key).agg(sum(value).as(alias))`. */
  def saltedSum(df: DataFrame, key: Column, value: Column, alias: String,
                salts: Int = 16): DataFrame =
    df.withColumn("__salt", saltCol(value, salts))
      .groupBy(key, col("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(key)
      .agg(sum(col("__partial")).as(alias))

  /** Salted count per key. The salt comes from the row id, not the key
    * (hashing the key would put every row of a hot key in ONE salt bucket,
    * defeating the spread); counts are invariant to how rows split. */
  def saltedCount(df: DataFrame, key: Column, alias: String,
                  salts: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
      .groupBy(key, col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(key)
      .agg(sum(col("__partial")).as(alias))
}
