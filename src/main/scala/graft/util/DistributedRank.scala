package graft.util

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * The two-phase distributed total-order ranking kernel — the scale-safe
 * replacement for `row_number().over(Window.orderBy(...))`, which funnels
 * the WHOLE frame through ONE WindowExec task (the single worst
 * anti-pattern for a data-scaling input; WindowExec logs a warning for
 * exactly this plan).
 *
 * Phase 1: `orderBy` range-partitions on sampled split points and sorts
 * within partitions — every partition holds a contiguous key range and no
 * row ever moves to a single partition. Phase 2: `zipWithIndex` runs one
 * lightweight job over partition SIZES and adds per-partition prefix
 * offsets. Exact global position for one range exchange plus a counts
 * pass. The RDD hop is the documented per-partition-imperative exception
 * (SURVEY §7.4): the offset add is not expressible relationally without
 * the global window this kernel exists to avoid.
 *
 * Consumers: CurateQueries.qGlobalRank / qPackLengthBatches (inline
 * originals of this pattern, spec-pinned), FrameQueries.qPareto /
 * qNtileCusts (via this object). Partitioned ranks ride the same kernel:
 * sort by (partitionKey, orderKeys...), then subtract the per-partition
 * minimum index (a bounded-key aggregate broadcast back) — see
 * [[graft.batch.FrameQueries.qNtileCusts]].
 */
object DistributedRank {

  /** The input frame with a 1-based global position column appended,
    * positioned by `order` (which must be a TOTAL order for deterministic
    * output).
    *
    * PLAN-TIME EXECUTION SIDE EFFECT (ADVICE r12): `zipWithIndex`
    * computes its per-partition offsets EAGERLY, so merely CONSTRUCTING a
    * DataFrame through this method runs the full range-sort job — a
    * plan-only consumer (Explain, the discipline sweeps, any
    * queryExecution inspection of q_pareto / q_ntile_custs) executes a
    * corpus-scale sort as a side effect, and the result stage runs again
    * at consumption. This is inherent to the offsets pass (any exact
    * contiguous numbering needs the counts); the trade is accepted
    * because consumers of this kernel are terminal analytics queries, not
    * frequently-re-planned fragments. If plan-only inspection ever
    * matters, the alternative is the bucket-window two-phase form
    * (CurateQueries.qPackSequences), which is fully lazy but keys on a
    * value range rather than an arbitrary total order. */
  def withGlobalIndex(df: DataFrame, order: Seq[Column], idxName: String): DataFrame = {
    val sorted = df.orderBy(order: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(idxName, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(rdd, schema)
  }

  /** SQL ntile(buckets) reconstructed from a 1-based gap-free rank column
    * and the partition row count (both LONG column NAMES in scope): with
    * q = n DIV b and rem = n % b, the first rem buckets take q+1 rows and
    * the rest q — byte-identical to Spark's and DuckDB's NTILE. The ELSE
    * branch (divide by q) is unreachable when q = 0: rank ≤ n = rem·(q+1)
    * then, and CASE evaluates lazily. All-integer arithmetic. */
  def ntileSql(rank: String, n: String, buckets: Int): String = {
    val b = buckets.toLong
    s"""CASE WHEN $rank <= ($n % $b) * ($n DIV $b + 1)
       |  THEN ($rank - 1) DIV ($n DIV $b + 1) + 1
       |  ELSE ($n % $b) + ($rank - 1 - ($n % $b) * ($n DIV $b + 1)) DIV ($n DIV $b) + 1
       |END""".stripMargin
  }
}
