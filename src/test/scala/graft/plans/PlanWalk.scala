package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._

/**
 * Direct-input-path boundedness walks shared by the plan-discipline
 * sweeps. The walk follows a Window's DIRECT input chain: operators that
 * cannot grow their input (Project, Filter, Sort, repartitions, other
 * Windows, …) are transparent; row-MULTIPLYING operators (Generate,
 * Expand) break the walk (a Limit/Aggregate below an explode bounds
 * nothing — ADVICE r12); a Join is bounded only when BOTH sides are (a
 * product of constants is a constant, for any join type). This is
 * deliberately stricter than a subtree `collectFirst`, which would admit
 * a window over `rawFact.join(tinyAgg)` because the aggregate appears
 * SOMEWHERE beneath it.
 */
object PlanWalk {

  private def boundedBy(stop: LogicalPlan => Boolean)(p: LogicalPlan): Boolean =
    if (stop(p)) true
    else p match {
      case _: Generate | _: Expand => false
      case j: Join => boundedBy(stop)(j.left) && boundedBy(stop)(j.right)
      case u: UnaryNode => boundedBy(stop)(u.child)
      case _ => false
    }

  /** ≤ K rows at any data scale: a Limit on the direct input path. */
  val limitBounded: LogicalPlan => Boolean =
    boundedBy {
      case _: GlobalLimit | _: LocalLimit => true
      case _ => false
    }

  /** The frame's grain is a KEY space, not raw data: an Aggregate (or
    * Limit / dedup) on the direct input path. Whether that key space is
    * itself bounded is the caller's (allowlist's) argument to make. */
  val contracted: LogicalPlan => Boolean =
    boundedBy {
      case _: Aggregate | _: GlobalLimit | _: LocalLimit | _: Deduplicate => true
      case _ => false
    }

  /** Column names that mark a grouping key as DATA-SCALING (one group per
    * document / vector / user / order / hash): an Aggregate keyed on one
    * of these contracts the grain but NOT the cardinality — its output is
    * still corpus-sized, so it must never sit behind a forced broadcast. */
  val UnboundedIdNames: Set[String] = Set(
    "doc_id", "vec_id", "doc_a", "doc_b", "vec_a", "vec_b",
    "old_doc_id", "new_doc_id", "new_vec_id", "corpus_vec_id",
    "user_id", "event_id", "o_orderkey", "l_orderkey",
    "o_custkey", "c_custkey", "query_id", "neighbor_id",
    "h", "bh", "content_hash")

  /** Bounded enough to FORCE-broadcast: a Limit on the path, or an
    * Aggregate none of whose grouping keys is a data-scaling id. An
    * id-keyed Aggregate does not stop the walk — a Limit beneath it
    * still bounds the group count. */
  val broadcastBounded: LogicalPlan => Boolean =
    boundedBy {
      case _: GlobalLimit | _: LocalLimit => true
      case a: Aggregate if !a.groupingExpressions
        .flatMap(_.references.map(_.name)).exists(UnboundedIdNames) => true
      case _ => false
    }
}
