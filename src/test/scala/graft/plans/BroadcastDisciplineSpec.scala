package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, LogicalPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation

import graft.SparkSpec

/**
 * Suite-wide enforcement of the broadcast-boundedness discipline (the
 * ADVICE r12 medium class, mechanized): an explicit `broadcast()` hint
 * IGNORES autoBroadcastJoinThreshold, so a hinted side that scans a
 * FACT-grain table with no contraction on its direct input path is a
 * collect-the-corpus-to-the-driver hazard at exactly the scales the
 * fixture can never exercise — knn_label_eval's label-dictionary
 * broadcast (one row per corpus vector) was this bug. Dimension tables
 * (nation/region/customer/supplier/part) are exempt: broadcasting dims
 * is the intended TPC-H-family plan, and each dim broadcast is argued at
 * its site. Snapshot LogicalRDDs are not flagged (their grain is the
 * build's concern, pinned where they are built).
 *
 * `PlanWalk.contracted` is the same direct-path walk the window sweep
 * uses: an Aggregate/Limit on the path makes the frame key-grain; a join
 * is bounded only when BOTH sides are.
 */
class BroadcastDisciplineSpec extends SparkSpec {

  /** Tables whose row count scales with the corpus — a forced broadcast
    * of their raw grain can never be right. */
  private val FactTables =
    Set("documents", "embeddings", "events", "lineitem", "orders")

  /** query name → why its flagged broadcast is bounded anyway. Stale
    * entries fail, like the other discipline allowlists. */
  private val BoundedBroadcastOk: Map[String, String] = Map(
    "text_hybrid" ->
      ("the hinted side is the reference vector: an equality filter on " +
        "the unique vec_id key — exactly 1 row at any corpus size"),
    "dedup_spans_incremental" ->
      ("the hinted side is the incoming BATCH's window rows — the " +
        "incremental contract (scale11 probe) bounds the broadcast by " +
        "the micro-batch while the corpus-sized index stays put; a " +
        "day-scale batch deployment drops the hint and lets AQE pick"),
    "dedup_embedding_incremental" ->
      ("same incremental contract: the hinted side is the batch's LSH " +
        "band arm, the corpus index is the probe side"))
  // curate_incremental's batch-bounded broadcasts moved into the
  // curate_screen SNAPSHOT BUILDER (r16 — the screen verdict is a shared
  // artifact); the registered query is now an RDD scan of the
  // materialization, so it no longer flags here. The builder's broadcast
  // grain stays pinned by the incremental contract (scale11 probe) and
  // the builder-plan digest.

  private def scansFactGrain(p: LogicalPlan): Boolean =
    p.collectLeaves().exists {
      case r: LogicalRelation =>
        val paths = scala.util.Try(
          r.relation.asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.rootPaths.map(_.toString)).getOrElse(Seq.empty)
        paths.exists(path => FactTables.exists(t => path.contains(s"$t.parquet")))
      case _ => false
    }

  test("no forced broadcast of an uncontracted fact-grain frame in any registered query") {
    def hinted(h: Option[HintInfo]): Boolean = h.exists(_.strategy.contains(BROADCAST))
    val offenders = scala.collection.mutable.Map.empty[String, Int]
    (graft.SparkEntry.queries ++ graft.SparkEntry.specOnly).foreach {
      case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val bad = plan.collect { case j: Join =>
          Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).count {
            case (h, side) =>
              hinted(h) && !PlanWalk.broadcastBounded(side) && scansFactGrain(side)
          }
        }.sum
        if (bad > 0) offenders(name) = bad
    }
    val unexplained = offenders.keySet -- BoundedBroadcastOk.keySet
    assert(unexplained.isEmpty,
      s"forced broadcast of an uncontracted fact-grain frame in: ${unexplained.toSeq.sorted.mkString(", ")} — " +
        "drop the hint (let stats decide) or contract the frame first; " +
        "document a genuinely bounded case in BoundedBroadcastOk")
    val stale = BoundedBroadcastOk.keySet -- offenders.keySet
    assert(stale.isEmpty,
      s"stale BoundedBroadcastOk entries: ${stale.toSeq.sorted.mkString(", ")}")
  }

  test("the walk flags the knn_label_eval-shaped hint and admits a contracted one") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val fact = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"))
    val probe = Seq((1L, "a")).toDF("user_id", "k")
    // raw fact grain behind a forced broadcast — the hazard
    val bad = probe.join(broadcast(fact), "user_id")
      .queryExecution.optimizedPlan
    val badCount = bad.collect { case j: Join =>
      Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).count {
        case (h, side) => h.exists(_.strategy.contains(BROADCAST)) &&
          !PlanWalk.broadcastBounded(side) && scansFactGrain(side)
      }
    }.sum
    assert(badCount == 1, s"raw fact broadcast must be flagged: $bad")
    // the same table contracted to a bounded key space — admissible
    val dim = fact.groupBy("event_type").agg(count(lit(1)).as("n"))
    val ok = Seq(("a", 1L)).toDF("event_type", "v")
      .join(broadcast(dim), "event_type")
      .queryExecution.optimizedPlan
    val okCount = ok.collect { case j: Join =>
      Seq(j.hint.leftHint -> j.left, j.hint.rightHint -> j.right).count {
        case (h, side) => h.exists(_.strategy.contains(BROADCAST)) &&
          !PlanWalk.broadcastBounded(side) && scansFactGrain(side)
      }
    }.sum
    assert(okCount == 0, s"contracted broadcast must be admitted: $ok")
  }
}
